"""The comparison harness itself must not be weaker than the driver's:
round-5 ADVICE found _norm_cell collapsed None to 'NaN' for EVERY
type, so a NULL string/int on the Spark side compared equal to a
literal 'NaN' string (or a genuine NaN) on the oracle side."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.oracle_harness import compare


def test_null_string_does_not_equal_nan_literal(spark):
    sdf = spark.createDataFrame([(1, None)], "id bigint, tag string")
    opdf = pd.DataFrame({"id": [1], "tag": ["NaN"]})
    problems = compare(sdf, opdf)
    assert problems, "NULL string silently matched literal 'NaN'"


def test_null_double_still_matches_oracle_nan(spark):
    """The motivating case stays green: DuckDB surfaces SQL NULL in a
    double column as NaN; Spark's None must compare equal to it."""
    sdf = spark.createDataFrame([(1, None)], "id bigint, v double")
    opdf = pd.DataFrame({"id": [1], "v": [np.nan]})
    assert compare(sdf, opdf) == []


def test_null_int_matches_duckdb_nullable_float_surface(spark):
    """A NULL int on the Spark side vs DuckDB's NULL-int-as-NaN-float
    pandas surface: the float-typed collapse applies because the
    ORACLE side types the column float (symmetric union)."""
    sdf = spark.createDataFrame([(1, None)], "id bigint, n bigint")
    opdf = pd.DataFrame({"id": [1], "n": [np.nan]})
    assert compare(sdf, opdf) == []


def test_matching_null_strings_compare_equal(spark):
    sdf = spark.createDataFrame([(1, None)], "id bigint, tag string")
    opdf = pd.DataFrame({"id": [1], "tag": [None]})
    assert compare(sdf, opdf) == []


def test_nullable_int_na_matches_spark_null(spark):
    """pandas nullable Int64 NA (pd.NA) → None via _to_py, matching a
    Spark NULL int without tripping pd.NA's ambiguous-bool compare."""
    sdf = spark.createDataFrame([(1, None)], "id bigint, n bigint")
    opdf = pd.DataFrame({"id": [1], "n": pd.array([pd.NA], dtype="Int64")})
    assert compare(sdf, opdf) == []
