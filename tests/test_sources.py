"""P1/S2 parser tests: the reference's pipe-delimited telemetry format."""

from __future__ import annotations

from activedatawarehouseprototype_spark.sources.car_data import (
    parse_car_lines,
    read_car_files,
)

# The exact example record from CarDataFromFiles.java:41.
GOOD = "00270|A|0|1|1|0|0|0|2016-08-03 13:00:00|2016-08-03 13:01:13|121.061075|31.401332|55.5|217.0|6|000"
DIRTY = "00271|A|0|1|1|0|0|0|2016-08-01 13:00:00|2016-08-01 13:01:13|121.061075|31.401332|0.0|217.0|6|000"
MALFORMED = "not|a|car|row"
BLANK = ""


def test_parse_car_lines(spark):
    lines = spark.createDataFrame(
        [(GOOD,), (DIRTY,), (MALFORMED,), (BLANK,)], "value string"
    )
    rows = parse_car_lines(lines).collect()
    assert len(rows) == 1  # dirty date + malformed + blank dropped
    r = rows[0]
    assert r.carId == 270
    # event time col 10 with +8h offset applied (CarDataParser.java:34-41)
    assert r.eventTime.strftime("%Y-%m-%d %H:%M:%S") == "2016-08-03 05:01:13"
    assert abs(r.lon - 121.061075) < 1e-5
    assert abs(r.speed - 55.5) < 1e-5


def test_read_car_files(spark, tmp_path):
    p = tmp_path / "telemetry"
    p.mkdir()
    (p / "1608030000.txt").write_text(GOOD + "\n" + DIRTY + "\n")
    df = read_car_files(spark, str(p))
    assert df.count() == 1
    assert set(df.columns) == {
        "carId",
        "eventTime",
        "processTime",
        "lon",
        "lat",
        "speed",
        "angle",
    }


def test_out_of_order_events_bounded_disorder(spark):
    """S5: event time is genuinely out of order in arrival order, but
    the disorder is bounded by max_delay_ms (the watermark contract)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from activedatawarehouseprototype_spark.sources.car_data import (
        out_of_order_events,
    )

    max_delay = 30_000
    df = out_of_order_events(spark, 500, max_delay_ms=max_delay)
    prefix_max = F.max(F.unix_millis("ts")).over(
        W.orderBy("arrival_seq").rowsBetween(W.unboundedPreceding, 0)
    )
    rows = df.select(
        "arrival_seq",
        F.unix_millis("ts").alias("tms"),
        prefix_max.alias("prefix_max"),
    ).collect()
    assert len(rows) == 500
    # disorder exists...
    assert any(r.tms < r.prefix_max for r in rows)
    # ...and is bounded: no event lags the event-time frontier by more
    # than the jitter bound (frontier row had jitter 0 at worst)
    assert all(r.prefix_max - r.tms < max_delay for r in rows)
    # deterministic (hash-seeded jitter, no RNG state)
    again = out_of_order_events(spark, 500, max_delay_ms=max_delay).collect()
    assert sorted((r.arrival_seq, r.tms) for r in rows) == sorted(
        (r.arrival_seq, int(r.ts.timestamp() * 1000)) for r in again
    )


def test_source_format_roundtrips(spark, tmp_path):
    """The engine is format-agnostic at the edges: events written as
    CSV, JSON, and ORC read back and evaluate identically to parquet."""
    import datetime as dt

    from activedatawarehouseprototype_spark.rules.compiler import evaluate_rule
    from activedatawarehouseprototype_spark.rules.model import Rule

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i % 3, base + dt.timedelta(seconds=i), float(i * 7 % 50)) for i in range(60)]
    schema = "carId int, ts timestamp, speed double"
    df = spark.createDataFrame(rows, schema)
    rule = Rule.from_dict({
        "queryId": 1, "queryState": "ACTIVE", "windowMilliseconds": 30_000,
        "frequencyMilliseconds": None, "groupingKeyNames": ["carId"],
        "windowFilterRules": [], "aggregatorFunctionType": "SUM",
        "limitOperatorType": ">", "limit": 100, "aggregateFieldName": "speed",
    })

    def canon(d):
        return sorted(
            (r.key, r.window_start, r.window_end, r.agg_value, r.fired)
            for r in evaluate_rule(d, rule).collect()
        )

    want = canon(df)
    for fmt in ["csv", "json", "orc"]:
        p = str(tmp_path / fmt)
        w = df.write.format(fmt).mode("overwrite")
        if fmt == "csv":
            w = w.option("header", True)
        w.save(p)
        r = spark.read.format(fmt)
        if fmt in ("csv", "json"):
            r = r.schema(schema)  # declared schema, as a pipeline would
        got = canon(r.load(p))
        assert got == want, fmt


def test_stream_car_files_parses_live(spark, tmp_path):
    """S2 streaming surface: the telemetry wire format parses through a
    real file stream (maxFilesPerTrigger throttle)."""
    from activedatawarehouseprototype_spark.sources.car_data import stream_car_files

    p = tmp_path / "telemetry"
    p.mkdir()
    (p / "a.txt").write_text(GOOD + "\n" + DIRTY + "\n")
    (p / "b.txt").write_text(GOOD + "\n")
    q = (
        stream_car_files(spark, str(p), max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("car_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM car_stream_out").collect()
    assert len(rows) == 2  # dirty row dropped in both files
    assert all(r.carId == 270 for r in rows)


def test_synthetic_car_stream_contract(spark):
    """S4 generator: a genuine unbounded streaming source with the car
    telemetry schema (deterministic exprs over the rate source)."""
    from activedatawarehouseprototype_spark.sources.car_data import (
        synthetic_car_stream,
    )

    df = synthetic_car_stream(spark, rows_per_second=10)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "carId", "eventTime", "processTime", "lon", "lat", "speed", "angle",
    ]


def test_catalog_register_views_sql(spark):
    """catalog.register_views: every fixture table becomes SQL-visible."""
    from activedatawarehouseprototype_spark.catalog import load_all, register_views

    register_views(spark, "/root/testdata/sf0.001")
    n = spark.sql("SELECT COUNT(*) AS n FROM region").head().n
    assert n == 5
    dfs = load_all(spark, "/root/testdata/sf0.001")
    assert set(dfs) >= {"region", "events", "documents", "embeddings"}


def test_parse_car_lines_drops_malformed_under_ansi(spark):
    """Spark 4 ships with ANSI mode ON: one dirty field must null the
    row (and the row then drops), never throw CAST_INVALID_INPUT and
    abort the batch — the reference feed is known-dirty."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    rows = [
        ("1|a|b|c|d|e|f|g|h|2016-01-02 10:00:00|1.0|2.0|3.0|4.0",),
        ("x|a|b|c|d|e|f|g|h|2016-01-02 10:00:00|abc|2.0|3.0|4.0",),
        ("1|a|b|c|d|e|f|g|h|not-a-date|1.0|2.0|3.0|4.0",),
        ("short|line",),
    ]
    out = parse_car_lines(
        spark.createDataFrame(rows, "value string")
    ).collect()
    assert len(out) == 1 and out[0].carId == 1 and out[0].speed == 3.0
