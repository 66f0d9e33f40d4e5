"""Scalar-function corpus (SURVEY §2.3 + §2.8): string/date/math/JSON
expression coverage, the reference's dirty-date filter (F3), and its
geo grid-cell bucketing (P5) — all whole-stage-codegen Column
expressions, no Python UDFs in any of these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.catalog import load as _load
from activedatawarehouseprototype_spark.corpus import register
from activedatawarehouseprototype_spark.functions import geo


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _load(spark, sf_dir, name)


# --- String functions over part ---


@register(
    "scalar_string_fns",
    oracle="""
SELECT p_partkey,
       UPPER(p_type) AS type_upper,
       SUBSTRING(p_name, 1, 8) AS name_prefix,
       CAST(LENGTH(p_name) AS INT) AS name_len,
       p_brand || '#' || p_type AS brand_type,
       REPLACE(p_type, ' ', '_') AS type_snake,
       CAST(CONTAINS(p_name, 'a') AS BOOLEAN) AS has_a
FROM part
""",
)
def scalar_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.col("p_name").contains("a").alias("has_a"),
    )


# --- Date/time functions over orders (DATE-cast first so day-diff
# semantics agree across engines) ---


@register(
    "scalar_date_fns",
    oracle="""
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST(MONTH(o_orderdate) AS INT) AS o_month,
       CAST(DAY(o_orderdate) AS INT) AS o_day,
       CAST(QUARTER(o_orderdate) AS INT) AS o_quarter,
       epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
       CAST(date_diff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS INT)
           AS days_since_2024
FROM orders
""",
)
def scalar_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.unix_millis(F.date_trunc("month", "o_orderdate")).alias("month_start_ms"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("int")
        .alias("days_since_2024"),
    )


# --- Math functions over lineitem. Products/abs/sqrt are IEEE-exact
# per row (bit-identical across engines) so they ship unrounded — only
# the transcendental LN (libm differs in the last ulp) is rounded.
# NOTE: never ROUND an exact product to few decimals for the oracle:
# Spark rounds the shortest decimal repr (BigDecimal HALF_UP), DuckDB
# rounds the binary value, and price-like data hits half-boundaries. ---


@register(
    "scalar_math_fns",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged,
       ABS(l_discount - 0.05) AS disc_dev,
       CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
       SQRT(l_extendedprice) AS price_sqrt,
       ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
       CAST(l_partkey % 7 AS BIGINT) AS pk_mod7,
       GREATEST(l_discount, l_tax) AS max_rate
FROM lineitem
""",
)
def scalar_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charged"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        (F.col("l_partkey") % 7).alias("pk_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
    )


# --- JSON extraction from events.props (P2 analogue: schema-on-read
# over a JSON string column) ---


@register(
    "json_extract_props",
    oracle="""
SELECT event_type,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
""",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


# --- CASE / COALESCE / NULLIF conditional expressions ---


@register(
    "scalar_conditional_fns",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
       CAST(o_orderstatus = 'F' AS BOOLEAN) AS is_final
FROM orders
""",
)
def scalar_conditional_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        (F.col("o_orderstatus") == "F").alias("is_final"),
    )


# --- Dirty-date filter (F3; reference CarDataFromFiles.java:47-49 drops
# rows with bad event dates before parse) ---


@register(
    "dirty_date_filter",
    oracle="""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
WHERE CAST(ts AS DATE) NOT IN (DATE '2024-01-01', DATE '2024-01-02')
GROUP BY event_date
""",
)
def dirty_date_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    d = F.to_date("ts")
    return (
        e.filter(~d.isin("2024-01-01", "2024-01-02"))
        .groupBy(F.date_format(d, "yyyy-MM-dd").alias("event_date"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- Geo grid bucketing (P5; GeoUtils grid-cell primitive applied to
# coordinates synthesized deterministically from event columns).
# IEEE double arithmetic is identical in both engines, so the floor
# bucketing matches bit-exactly. ---

_CELLS_PER_ROW = geo.NYC_GRID.cells_per_row


@register(
    "geo_grid_cell_agg",
    oracle=f"""
WITH pts AS (
  SELECT value,
         -74.05 + (value % 10.0) * 0.035 AS lon,
         40.50 + (CAST(user_id % 100 AS DOUBLE)) * 0.005 AS lat
  FROM events
)
SELECT CAST(FLOOR((41.0 - lat) / 0.00125) * {_CELLS_PER_ROW}
            + FLOOR((lon - (-74.05)) / 0.0014) AS BIGINT) AS cell,
       ROUND(SUM(value), 2) AS sum_value,
       CAST(COUNT(*) AS BIGINT) AS n
FROM pts
WHERE lon >= -74.05 AND lon <= -73.70 AND lat >= 40.50 AND lat <= 41.00
GROUP BY cell
""",
)
def geo_grid_cell_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    lon = F.lit(-74.05) + (F.col("value") % 10.0) * 0.035
    lat = F.lit(40.50) + (F.col("user_id") % 100).cast("double") * 0.005
    pts = e.select("value", lon.alias("lon"), lat.alias("lat"))
    boxed = pts.filter(geo.in_box(F.col("lon"), F.col("lat")))
    return boxed.groupBy(
        geo.grid_cell(F.col("lon"), F.col("lat")).alias("cell")
    ).agg(
        # SUM at the data's own decimal precision (2), never a rounded
        # AVG: a quotient of 2-decimal values can sit EXACTLY on a
        # round-4 boundary (e.g. k*0.01/16 = 26.63125), where Spark's
        # decimal HALF_UP and DuckDB's binary rounding disagree — found
        # by the sf0.1 stress mirror in round 7. round(sum, 2) is
        # parity-safe: k*0.01 is never an odd multiple of 0.005.
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.count(F.lit(1)).alias("n"),
    )


# --- Geo cell geometry (P5: GeoUtils.getGridCellCenterLon/Lat
# :155-180, distance :208-212, direction angle :227-234): for each
# occupied cell, its center coordinates, planar distance and bearing
# from the box center. atan2/degrees are transcendental → rounded 6dp
# both sides; the rest is IEEE-exact arithmetic. ---


@register(
    "geo_cell_geometry",
    oracle=f"""
WITH pts AS (
  SELECT -74.05 + (value % 10.0) * 0.035 AS lon,
         40.50 + CAST(user_id % 100 AS DOUBLE) * 0.005 AS lat
  FROM events
), cells AS (
  SELECT DISTINCT CAST(FLOOR((41.0 - lat) / 0.00125) * {_CELLS_PER_ROW}
             + FLOOR((lon - (-74.05)) / 0.0014) AS BIGINT) AS cell
  FROM pts
  WHERE lon BETWEEN -74.05 AND -73.70 AND lat BETWEEN 40.50 AND 41.00
), c AS (
  SELECT cell,
         -74.05 + ((cell % {_CELLS_PER_ROW}) + 0.5) * 0.0014 AS clon,
         41.0 - (FLOOR(cell / {_CELLS_PER_ROW}) + 0.5) * 0.00125 AS clat
  FROM cells
)
SELECT cell, ROUND(clon, 6) AS center_lon, ROUND(clat, 6) AS center_lat,
       ROUND(SQRT(POW(clon - (-73.875), 2) + POW(clat - 40.75, 2)), 6)
           AS dist_deg,
       ROUND(CASE WHEN DEGREES(ATAN2(clat - 40.75, clon - (-73.875))) < 0
                  THEN DEGREES(ATAN2(clat - 40.75, clon - (-73.875))) + 360.0
                  ELSE DEGREES(ATAN2(clat - 40.75, clon - (-73.875))) END, 6)
           AS bearing_deg
FROM c
""",
)
def geo_cell_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    lon = F.lit(-74.05) + (F.col("value") % 10.0) * 0.035
    lat = F.lit(40.50) + (F.col("user_id") % 100).cast("double") * 0.005
    pts = e.select(lon.alias("lon"), lat.alias("lat"))
    cells = (
        pts.filter(geo.in_box(F.col("lon"), F.col("lat")))
        .select(geo.grid_cell(F.col("lon"), F.col("lat")).alias("cell"))
        .distinct()
    )
    clon = geo.cell_center_lon(F.col("cell"))
    clat = geo.cell_center_lat(F.col("cell"))
    ref_lon, ref_lat = F.lit(-73.875), F.lit(40.75)
    return cells.select(
        "cell",
        F.round(clon, 6).alias("center_lon"),
        F.round(clat, 6).alias("center_lat"),
        F.round(geo.euclid_distance(clon, clat, ref_lon, ref_lat), 6).alias(
            "dist_deg"
        ),
        F.round(geo.direction_angle(ref_lon, ref_lat, clon, clat), 6).alias(
            "bearing_deg"
        ),
    )


# --- Geo path → grid-cell list (P5; GeoUtils.java:89-150
# mapToGridCellsOnWay re-expressed as interpolation sampling — see
# functions/geo.path_cells). The oracle recomputes the sampled cells
# independently in DuckDB list SQL; per-path cell sets are compared as
# exploded DISTINCT (path, cell) rows so element order is irrelevant. ---


@register(
    "geo_path_cells",
    oracle=f"""
WITH pts AS (
  SELECT event_id,
         -74.05 + (value % 10.0) * 0.035 AS lon1,
         40.50 + CAST(user_id % 100 AS DOUBLE) * 0.005 AS lat1,
         -74.05 + ((value + 3.0) % 10.0) * 0.035 AS lon2,
         40.50 + CAST((user_id + 37) % 100 AS DOUBLE) * 0.005 AS lat2
  FROM events WHERE event_type = 'purchase'
), boxed AS (
  SELECT * FROM pts
  WHERE lon1 BETWEEN -74.05 AND -73.70 AND lat1 BETWEEN 40.50 AND 41.00
    AND lon2 BETWEEN -74.05 AND -73.70 AND lat2 BETWEEN 40.50 AND 41.00
), seg AS (
  SELECT event_id, lon1, lat1, lon2, lat2,
         GREATEST(ABS(FLOOR((lon2 - (-74.05)) / 0.0014)
                      - FLOOR((lon1 - (-74.05)) / 0.0014)),
                  ABS(FLOOR((41.0 - lat2) / 0.00125)
                      - FLOOR((41.0 - lat1) / 0.00125)),
                  1) AS n
  FROM boxed
), cells AS (
  SELECT DISTINCT event_id,
         CAST(FLOOR((41.0 - (lat1 + (lat2 - lat1) * (i / CAST(n AS DOUBLE))))
                    / 0.00125) * {_CELLS_PER_ROW}
              + FLOOR(((lon1 + (lon2 - lon1) * (i / CAST(n AS DOUBLE)))
                       - (-74.05)) / 0.0014) AS BIGINT) AS cell
  FROM seg, UNNEST(range(0, CAST(n AS BIGINT) + 1)) AS t(i)
)
SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_paths
FROM cells
GROUP BY cell
""",
)
def geo_path_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    lon1 = F.lit(-74.05) + (F.col("value") % 10.0) * 0.035
    lat1 = F.lit(40.50) + (F.col("user_id") % 100).cast("double") * 0.005
    lon2 = F.lit(-74.05) + ((F.col("value") + 3.0) % 10.0) * 0.035
    lat2 = F.lit(40.50) + ((F.col("user_id") + 37) % 100).cast("double") * 0.005
    seg = e.select(
        "event_id",
        lon1.alias("lon1"), lat1.alias("lat1"),
        lon2.alias("lon2"), lat2.alias("lat2"),
    ).filter(
        geo.in_box(F.col("lon1"), F.col("lat1"))
        & geo.in_box(F.col("lon2"), F.col("lat2"))
    )
    cells = seg.select(
        "event_id",
        F.explode(
            geo.path_cells(
                F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")
            )
        ).alias("cell"),
    )
    return cells.groupBy("cell").agg(F.count(F.lit(1)).alias("n_paths"))
