"""Telemetry sources: the reference's Shanghai-taxi wire format (P1/S2)
and a deterministic synthetic generator (S4/S5), Spark-first.

Wire format (``source/CarDataFromFiles.java:41``, parsed in
``source/CarDataParser.java:22-55``): 16 pipe-delimited fields —
col 0 carId, col 9 event time ``yyyy-MM-dd HH:mm:ss`` (+8h zone
offset applied at parse), cols 10-13 lon/lat/speed/angle. Dirty rows
whose event date is 2010-01-01 / 2016-08-01 / 2016-08-02 are dropped
(``CarDataFromFiles.java:47-49``).

Batch and streaming use the same parser: ``spark.read.text`` /
``spark.readStream.text`` then ``parse_car_lines``. The reference's
13k-rows/s throttle (``:63-68``) maps to ``maxFilesPerTrigger`` /
``rate`` sources — pacing is the trigger's job in Spark, not the
parser's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DIRTY_DATES = ("2010-01-01", "2016-08-01", "2016-08-02")

CAR_SCHEMA = (
    "carId int, eventTime timestamp, processTime timestamp, "
    "lon float, lat float, speed float, angle float"
)


def parse_car_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Pipe-delimited line → SHCarRide-shaped row (P1). Pure column
    expressions; malformed rows (wrong arity / unparseable numbers)
    yield nulls and are dropped, like the flatMap-with-catch in
    ``source/ShCarDataDeserializer.java:22-27``."""
    c = F.split(F.col(value_col), r"\|")

    # try_element_at + try_to_number/try_to_timestamp, NOT plain
    # cast/element_at: under Spark 4's ANSI default (which the tuned
    # session deliberately leaves on) a plain CAST of one dirty field
    # throws and aborts the whole batch instead of nulling the row —
    # and this is the reference's known-dirty taxi feed
    def fld(i: int):
        return F.try_element_at(c, F.lit(i))

    def num(i: int, t: str):
        return F.expr(
            f"try_cast(try_element_at(split({value_col}, '\\\\|'), {i}) AS {t})"
        )

    parsed = lines.select(
        num(1, "int").alias("carId"),
        # +8h offset parity with CarDataParser.java:34-41 (naive local
        # time stamped in UTC+8, normalized to UTC).
        (
            F.try_to_timestamp(fld(10), F.lit("yyyy-MM-dd HH:mm:ss"))
            - F.expr("INTERVAL 8 HOURS")
        ).alias("eventTime"),
        F.current_timestamp().alias("processTime"),
        num(11, "float").alias("lon"),
        num(12, "float").alias("lat"),
        num(13, "float").alias("speed"),
        num(14, "float").alias("angle"),
        F.size(c).alias("_n"),
    )
    cleaned = (
        parsed.filter(F.col("_n") >= 14)
        .filter(F.col("carId").isNotNull() & F.col("eventTime").isNotNull())
        # F3 dirty-date filter (CarDataFromFiles.java:47-49) — applied
        # on the pre-offset date like the reference (string prefix).
        .filter(
            ~F.date_format(
                F.col("eventTime") + F.expr("INTERVAL 8 HOURS"), "yyyy-MM-dd"
            ).isin(*DIRTY_DATES)
        )
        .drop("_n")
    )
    return cleaned


def read_car_files(spark: SparkSession, path: str) -> DataFrame:
    """S2 batch analogue."""
    return parse_car_lines(spark.read.text(path))


def stream_car_files(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    """S2 streaming analogue; throttling via maxFilesPerTrigger."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_car_lines(reader.load(path))


def out_of_order_events(
    spark: SparkSession,
    n: int,
    n_keys: int = 10,
    base_ms: int = 1_700_000_000_000,
    step_ms: int = 1_000,
    max_delay_ms: int = 30_000,
) -> DataFrame:
    """S5: deterministic bounded-disorder generator (the reference's
    ``common/TaxiRideGenerator.java:15-67`` emits rides whose events
    arrive up to a bounded delay after their event time). ``id`` is the
    ARRIVAL order; the event timestamp lags the arrival clock by a
    per-row deterministic jitter in ``[0, max_delay_ms)`` — so event
    time is out of order but the disorder is bounded, the contract
    watermarks are built for. Pure column expressions, reproducible."""
    v = F.col("id")
    jitter = F.pmod(F.xxhash64(v), F.lit(max_delay_ms))
    return spark.range(n).select(
        (v % n_keys).cast("int").alias("carId"),
        F.timestamp_millis(F.lit(base_ms) + v * step_ms - jitter).alias("ts"),
        v.alias("arrival_seq"),
        ((v * 7) % 160).cast("double").alias("speed"),
    )


def synthetic_car_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """S4 analogue: rate source + deterministic column expressions
    seeded by ``value`` (no Python generator thread)."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    v = F.col("value")
    return rate.select(
        (v % 50).cast("int").alias("carId"),
        F.col("timestamp").alias("eventTime"),
        F.col("timestamp").alias("processTime"),
        (F.lit(121.0) + (v % 1000).cast("double") / 2000.0).cast("float").alias("lon"),
        (F.lit(31.0) + (v % 700).cast("double") / 1400.0).cast("float").alias("lat"),
        ((v * 7 % 160)).cast("float").alias("speed"),
        ((v * 13 % 360)).cast("float").alias("angle"),
    )
