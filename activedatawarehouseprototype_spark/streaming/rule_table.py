"""Rules as a WAREHOUSE TABLE — queries are data, stored like data.

The reference keeps rules in Flink broadcast state fed by a Kafka
topic; the warehouse-native mapping (SURVEY §2.7 C1: "MERGE/DELETE on
the rules table") stores the standing-query set as a columnar table
with MERGE upsert semantics, so rules are inspectable/joinable with
plain SQL ("which active rules were spawned by query 7?") and survive
restarts with table-level tooling instead of a bespoke file format.

Built on operators/warehouse.py (parquet + atomic swap here; Delta or
Iceberg MERGE INTO at deployment, same call shape). The table is
control-plane-sized — one row per standing query.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from activedatawarehouseprototype_spark.operators.warehouse import (
    delete_where,
    merge_upsert,
)
from activedatawarehouseprototype_spark.rules.model import Rule
from activedatawarehouseprototype_spark.streaming.registry import RuleRegistry
from activedatawarehouseprototype_spark.session import local_rows_df

RULE_TABLE_SCHEMA = (
    "query_id bigint, active_id bigint, active_time bigint, "
    "query_state string, rule_json string"
)


def save_rules_table(spark: SparkSession, registry: RuleRegistry, path: str) -> None:
    """Sync the registry into the rules table: MERGE-upsert current
    rules by query_id, then DELETE rows whose query no longer exists
    (expired / DELETE verb). Idempotent snapshot-sync."""
    rules = list(registry.rules.values())
    if rules:
        updates = local_rows_df(spark, 
            [
                (
                    r.query_id,
                    r.active_id,
                    r.active_time,
                    r.query_state.value,
                    r.to_json(),
                )
                for r in rules
            ],
            RULE_TABLE_SCHEMA,
        )
        merge_upsert(spark, path, updates, ["query_id"])
        ids = ", ".join(str(r.query_id) for r in rules)
        delete_where(spark, path, f"query_id NOT IN ({ids})")
    elif os.path.exists(path):
        delete_where(spark, path, "TRUE")


def load_rules_table(spark: SparkSession, path: str) -> RuleRegistry:
    """Rebuild a registry from the rules table (restart recovery)."""
    from activedatawarehouseprototype_spark.operators.warehouse import (
        recover_swap,
    )

    reg = RuleRegistry()
    # a crash mid-swap during save_rules_table leaves the committed
    # table only in `.old`; without recovery this restart path would
    # return an EMPTY registry and the next save would persist the
    # empty set — every standing query silently deleted
    recover_swap(path)
    if not os.path.exists(path):
        return reg
    for row in spark.read.parquet(path).collect():
        rule = Rule.from_json(row.rule_json)
        reg.rules[rule.query_id] = rule
    return reg
