"""Table loaders for the driver-generated parquet fixtures.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier
part orders lineitem events documents embeddings — one parquet each
under ``{sf_dir}/{name}.parquet``.

Scale note: ``spark.read.parquet`` is the production path too — the
scan benefits from predicate pushdown / column pruning / row-group
skipping automatically, so every downstream operator should express
filters and projections declaratively rather than materializing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})


def _ensure_session_conf(spark: SparkSession) -> None:
    """Make any session (including the driver's) read our fixtures
    deterministically: UTC window math, and TIMESTAMP(NANOS) parquet
    columns readable (events.ts is timestamp[ns])."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    _ensure_session_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanosAsLong reads timestamp[ns] as epoch-nanos; floor to micros
        # (integer DIV — exact), matching DuckDB's ns→µs truncation.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
