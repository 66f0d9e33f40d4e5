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

import os

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
    deterministically: UTC window math, TIMESTAMP(NANOS) parquet
    columns readable (earlier fixture generations wrote events.ts as
    timestamp[ns]), and tz-naive parquet timestamps read as LTZ
    (timestamp[us] fixtures would otherwise surface as TIMESTAMP_NTZ
    under Spark 4's inferTimestampNTZ default, breaking epoch math
    like unix_millis). With the session pinned to UTC, naive==LTZ
    values are identical, and DuckDB reads the same columns as naive
    UTC — so both engines agree."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def _nanos_ts_columns(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns] (which Spark reads as
    bigint under nanosAsLong). Inspected via pyarrow footer metadata."""
    try:
        import glob

        import pyarrow.parquet as pq

        target = path
        if not path.endswith(".parquet") or os.path.isdir(path):
            files = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not files:
                return []
            target = files[0]
        schema = pq.read_schema(target)
        return [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except ImportError:
        return []  # no pyarrow in this environment: nothing to repair
    except Exception as e:  # corrupt/unreadable footer: say so — a
        # silent [] here disables the timestamp[ns] repair and the
        # failure then surfaces as confusing epoch math far downstream
        import sys

        print(
            f"catalog: footer inspection of {path!r} failed ({e!r}); "
            f"timestamp[ns] repair skipped",
            file=sys.stderr,
        )
        return []


def load_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Nanos-timestamp-safe parquet loader for ANY path: timestamp[ns]
    columns (illegal for stock Spark) are read as epoch-nanos and
    floored to micros with integer DIV — exact, and identical to
    DuckDB's ns→µs truncation."""
    _ensure_session_conf(spark)
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for c in _nanos_ts_columns(path):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return load_parquet(spark, f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
