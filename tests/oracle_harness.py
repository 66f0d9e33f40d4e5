"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a corpus query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and
order-insensitive values (floats to a tolerance). Every corpus entry
must pass this before it ships.
"""

from __future__ import annotations

import math

import duckdb

from activedatawarehouseprototype_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _norm_cell(v, is_float: bool = False):
    # DuckDB→pandas surfaces SQL NULL in double columns as NaN, so the
    # oracle side cannot distinguish NULL from NaN for floats —
    # normalize BOTH to one token or a legitimately-NULL float cell
    # (e.g. AVG of an empty outer-join group) would always mismatch
    # Spark's None against the oracle's "NaN". Only FLOAT columns get
    # this collapse: a NULL string/int cell must stay distinct from a
    # literal 'NaN' string or a genuine NaN, or the oracle weakens.
    if v is None:
        return "NaN" if is_float else None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _sorted_rows(rows):
    # floats sort by a ROUNDED repr: two rows equal within the compare
    # tolerance but with different last-ulp reprs would otherwise sort
    # into different positions on the two sides and misalign the
    # element-wise comparison (false mismatches for a correct query)
    def k(c):
        if isinstance(c, float):
            return f"{c:.6e}"
        return str(c)

    return sorted(rows, key=lambda r: tuple(k(c) for c in r))


# The CORRECTNESS driver converts both results with pandas, and the
# driver host may run a pandas older than 2.0 whose timestamps are
# ns-resolution ONLY (valid range 1677-09-21 .. 2262-04-11). A
# datetime outside that range passes every local mirror (pandas >= 2
# falls back to datetime64[us]) and then crashes the DRIVER's
# conversion — the round-8 scd2 red row (SCD2 sentinel 9999-12-31).
# Guard the whole class here: any temporal cell outside the ns-safe
# years on EITHER side is a mirror failure; render such sentinels as
# strings instead (date_format / strftime on both sides).
_NS_SAFE_MIN_YEAR, _NS_SAFE_MAX_YEAR = 1678, 2261


def _ns_unsafe(v) -> bool:
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return not (_NS_SAFE_MIN_YEAR <= v.year <= _NS_SAFE_MAX_YEAR)
    return False


def compare(spark_df, oracle_pdf, float_tol: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_cols = sorted(spark_df.columns)
    o_cols = sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [f"column mismatch: spark={s_cols} oracle={o_cols}"]

    # a column is float if EITHER side types it float (symmetric, so
    # both sides apply the same NULL↔NaN collapse)
    import pandas as pd

    s_types = dict(spark_df.dtypes)
    is_float = {
        c: s_types.get(c) in ("double", "float")
        or pd.api.types.is_float_dtype(oracle_pdf[c])
        for c in s_cols
    }

    s_rows = [
        tuple(_norm_cell(row[c], is_float[c]) for c in s_cols)
        for row in spark_df.collect()
    ]
    o_raw = oracle_pdf[s_cols].itertuples(index=False, name=None)
    o_rows = [
        tuple(
            _norm_cell(_to_py(c), is_float[col])
            for col, c in zip(s_cols, r)
        )
        for r in (tuple(t) for t in o_raw)
    ]

    for side, rows in (("spark", s_rows), ("oracle", o_rows)):
        for r in rows:
            for c, v in zip(s_cols, r):
                if _ns_unsafe(v):
                    problems.append(
                        f"{side} col {c}: {v!r} outside pandas ns-safe "
                        f"range {_NS_SAFE_MIN_YEAR}..{_NS_SAFE_MAX_YEAR} "
                        "(would crash the driver's older pandas; render "
                        "as a string on both sides)"
                    )
                    return problems

    if len(s_rows) != len(o_rows):
        problems.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")
        return problems

    for i, (sr, orow) in enumerate(zip(_sorted_rows(s_rows), _sorted_rows(o_rows))):
        for c, (sv, ov) in zip(s_cols, zip(sr, orow)):
            if isinstance(sv, float) and isinstance(ov, float):
                if not math.isclose(sv, ov, rel_tol=float_tol, abs_tol=float_tol):
                    problems.append(f"row {i} col {c}: spark={sv!r} oracle={ov!r}")
            elif sv != ov:
                problems.append(f"row {i} col {c}: spark={sv!r} oracle={ov!r}")
            if len(problems) >= 5:
                return problems
    return problems


def _to_py(v):
    """numpy / pandas scalars → python scalars for stable comparison."""
    import numpy as np
    import pandas as pd

    if v is pd.NA or v is pd.NaT:
        return None  # nullable-dtype NULL → plain None (typed collapse
        # to 'NaN' happens in _norm_cell for float columns only)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.bool_,)):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v
