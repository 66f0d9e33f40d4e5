"""File-level data-skipping index: per-file min/max/null-count
manifest + predicate-driven file pruning BEFORE any data IO.

Parquet footers already let Spark skip row groups once a file is
*opened* (``spark.sql.parquet.filterPushdown``), and ``cluster_write``
(warehouse.py) lays data out so those stats are tight. What footers do
NOT give you at 100 TB is scheduling: with millions of files, every
query still lists and opens every footer. Table formats solve this
with a stats manifest consulted on the driver (Delta data skipping,
Iceberg manifest min/max; same idea as Snowflake micro-partition
pruning). This module is that manifest for plain parquet directories:

- ``build_skipping_index(spark, path, stats_cols)`` — ONE distributed
  scan of the stats columns grouped by ``input_file_name()``; writes a
  small parquet manifest next to the data (``<path>_skip_index``) via
  the same staging + atomic-rename protocol as the other indexes.
- ``prune_files(spark, path, predicates)`` — evaluates conjunctive
  predicates against the manifest (a Spark filter over the manifest
  table, NOT a driver loop) and returns the surviving file list.
- ``read_with_skipping(spark, path, predicates)`` — reads ONLY the
  surviving files, then re-applies the exact predicate, so pruning is
  strictly an optimization: a stale/conservative manifest can cost
  speed, never correctness — with one caveat, below.

The manifest is AUTHORITATIVE for the snapshot it indexed (like a
table-format transaction log): ``read_with_skipping`` reads only files
present in the manifest, and refuses (raises) if the directory has
files the manifest doesn't know, rather than silently returning a
partial table. Rebuild after each write/compact — build cost is one
column-pruned scan, the same order as the write that preceded it.

Pruning semantics per file f and predicate p (conjunction over
predicates; a file survives only if EVERY predicate might match):

    =  v        keep iff min_c <= v <= max_c
    <  v        keep iff min_c <  v
    <= v        keep iff min_c <= v
    >  v        keep iff max_c >  v
    >= v        keep iff max_c >= v
    between     keep iff max_c >= lo AND min_c <= hi
    in (vs)     keep iff any v in [min_c, max_c]

Files where the column is entirely NULL (min/max both NULL) are
skipped for any predicate on that column — SQL comparisons never
accept NULL. Consequently the predicates passed here have standard
SQL filter semantics (NULL rows never match); do not use this to
express ``c IS NULL`` scans (the manifest records ``nulls_<c>`` so an
IS-NULL variant is a straightforward extension).

Scale check: the manifest is O(files) rows and the pruned file list is
collected on the driver — bounded by the very list the Spark scheduler
must hold to plan ANY scan of those files, so this adds no new
driver-side scaling term.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators.warehouse import (
    commit_swap,
    recover_swap,
)
from activedatawarehouseprototype_spark.session import local_rows_df

_OPS = {"=", "==", "<", "<=", ">", ">=", "between", "in"}


@dataclass(frozen=True)
class Pred:
    """One conjunct: ``col op value`` (``between`` takes ``(lo, hi)``,
    ``in`` takes a non-empty list/tuple of values)."""

    col: str
    op: str
    value: object

    def __post_init__(self):
        if self.op not in _OPS:
            raise ValueError(f"unsupported op {self.op!r}; one of {sorted(_OPS)}")
        if self.op == "between":
            if not (isinstance(self.value, (tuple, list)) and len(self.value) == 2):
                raise ValueError("between takes (lo, hi)")
        if self.op == "in":
            if not (isinstance(self.value, (tuple, list)) and len(self.value) > 0):
                raise ValueError("in takes a non-empty list of values")


def _index_path(path: str) -> str:
    return path.rstrip("/") + "_skip_index"


def _list_data_files(path: str) -> list[str]:
    """All ``*.parquet`` data files under ``path``, RECURSIVELY, as
    paths relative to the table root — a partitioned/nested layout's
    files must be visible to the staleness check, and relative paths
    (not basenames) keep same-named files in different subdirectories
    from colliding."""
    out = []
    for dirpath, dirnames, filenames in os.walk(path):
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        for f in filenames:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.relpath(os.path.join(dirpath, f), path))
    return out


def _rel_file(uri: str, root: str) -> str:
    """Map an ``input_file_name()`` URI (``file:/abs`` or
    ``file:///abs``) to a path relative to the table root.

    ``input_file_name()`` URIs are URL-encoded (Hadoop Path percent-
    encodes spaces/%/non-ASCII), so decode scheme-carrying values;
    raw paths (synthesized zero-row manifest entries carry no scheme)
    pass through untouched so a literal ``%`` in a filename survives.
    ``urllib.unquote`` leaves ``+`` alone, matching Hadoop, which never
    encodes space as ``+``."""
    p = uri
    if p.startswith("file:"):
        p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
        p = unquote(p)
    return os.path.relpath(p, os.path.abspath(root))


def _raw_path(uri: str) -> str:
    """Decode a manifest ``file`` value to a raw filesystem path.
    ``spark.read.parquet`` treats percent-escapes in an input string as
    literal characters, so encoded ``input_file_name()`` URIs must be
    decoded before being handed back to a reader; raw (scheme-less)
    synthesized values pass through."""
    p = uri
    if p.startswith("file:"):
        p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
        p = unquote(p)
    return p


def _rel_col(root_abs: str) -> F.Column:
    """Column twin of :func:`_rel_file`: path of the ``file`` column
    relative to ``root_abs``. Decodes URL-encoded ``input_file_name()``
    URIs first — ``F.url_decode`` reads a literal ``+`` as a space
    (form-encoding rules; Hadoop leaves ``+`` literal), so protect it
    as ``%2B`` before decoding. Scheme-less values (synthesized
    manifest rows) are already raw paths and skip the decode."""
    raw = F.col("file")
    decoded = F.when(
        raw.startswith("file:"),
        F.url_decode(F.regexp_replace(raw, r"\+", "%2B")),
    ).otherwise(raw)
    prefix = root_abs + "/"
    start = F.locate(prefix, decoded) + F.lit(len(prefix))
    return decoded.substr(start, F.lit(1 << 20))


def build_skipping_index(
    spark: SparkSession, path: str, stats_cols: list[str]
) -> str:
    """Scan ``path`` once (column-pruned to ``stats_cols``) and write
    the per-file stats manifest. Returns the manifest path.

    Manifest schema: ``file`` (absolute URI as Spark reports it),
    ``rows``, and per stats column ``min_<c>``, ``max_<c>``,
    ``nulls_<c>`` with the column's own type preserved for min/max —
    typed stats are what make range pruning exact (no string-compare
    surprises on ints/dates)."""
    if not stats_cols:
        raise ValueError("build_skipping_index needs at least one stats column")
    recover_swap(path)
    df = spark.read.parquet(path).select(*stats_cols)
    aggs = [F.count(F.lit(1)).alias("rows")]
    for c in stats_cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"nulls_{c}"),
        ]
    manifest = (
        df.withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(*aggs)
    )
    # ZERO-ROW files (empty write partitions, empty-df appends, compactor
    # leftovers) yield no rows, hence no groupBy entry — but they DO sit
    # in the directory, so read_with_skipping's staleness check would
    # flag them forever. Synthesize their manifest rows: rows=0, NULL
    # min/max (NULL stats already mean "prunable for any predicate",
    # which is exactly right for an empty file). The listing is O(files)
    # on the driver — the same listing any scan of this path performs.
    listing = _list_data_files(path)
    types = {f.name: f.dataType for f in df.schema.fields}
    root_abs = os.path.abspath(path)
    # synthesized rows carry RAW paths (no scheme, no URL-encoding) —
    # _rel_file/_rel_col treat scheme-less values as already decoded
    files_df = local_rows_df(
        spark,
        [(os.path.join(root_abs, f), f) for f in listing],
        "file string, _rel string",
    )
    # join on the path RELATIVE to the table root (suffix after the
    # first occurrence of "<root>/"), not the basename — nested layouts
    # can repeat basenames across subdirectories
    empty_rows = (
        files_df.join(
            manifest.select(_rel_col(root_abs).alias("_rel")),
            "_rel",
            "left_anti",
        )
        .select(
            "file",
            F.lit(0).cast("long").alias("rows"),
            *[
                col
                for c in stats_cols
                for col in (
                    F.lit(None).cast(types[c]).alias(f"min_{c}"),
                    F.lit(None).cast(types[c]).alias(f"max_{c}"),
                    F.lit(0).cast("long").alias(f"nulls_{c}"),
                )
            ],
        )
    )
    manifest = manifest.unionByName(empty_rows)
    ip = _index_path(path)
    staging = ip + ".staging"
    # O(files) rows -> one output file is right until the table has
    # tens of millions of files; coalesce, don't repartition (no
    # shuffle: the groupBy already reduced to O(files) rows).
    manifest.coalesce(1).write.mode("overwrite").parquet(staging)
    commit_swap(ip, staging)
    return ip


def _survives(p: Pred) -> F.Column:
    """Column expression over the manifest: does predicate p possibly
    match any row of this file? NULL stats (all-NULL file) compare to
    NULL -> coalesce(False): skip the file."""
    mn, mx = F.col(f"min_{p.col}"), F.col(f"max_{p.col}")
    v = p.value
    if p.op in ("=", "=="):
        c = (mn <= F.lit(v)) & (mx >= F.lit(v))
    elif p.op == "<":
        c = mn < F.lit(v)
    elif p.op == "<=":
        c = mn <= F.lit(v)
    elif p.op == ">":
        c = mx > F.lit(v)
    elif p.op == ">=":
        c = mx >= F.lit(v)
    elif p.op == "between":
        lo, hi = v
        c = (mx >= F.lit(lo)) & (mn <= F.lit(hi))
    else:  # in
        c = F.lit(False)
        for item in v:
            c = c | ((mn <= F.lit(item)) & (mx >= F.lit(item)))
    return F.coalesce(c, F.lit(False))


def _filter_expr(preds: list[Pred]) -> F.Column:
    """The EXACT row-level filter the predicates denote — re-applied
    after the pruned read so manifest pruning can only ever be
    conservative, never wrong."""
    c = F.lit(True)
    for p in preds:
        col = F.col(p.col)
        if p.op in ("=", "=="):
            c = c & (col == F.lit(p.value))
        elif p.op == "<":
            c = c & (col < F.lit(p.value))
        elif p.op == "<=":
            c = c & (col <= F.lit(p.value))
        elif p.op == ">":
            c = c & (col > F.lit(p.value))
        elif p.op == ">=":
            c = c & (col >= F.lit(p.value))
        elif p.op == "between":
            c = c & col.between(F.lit(p.value[0]), F.lit(p.value[1]))
        else:
            c = c & col.isin(list(p.value))
    return c


def _load_manifest(spark: SparkSession, path: str) -> DataFrame:
    ip = _index_path(path)
    recover_swap(ip)
    if not os.path.isdir(ip):
        raise FileNotFoundError(
            f"no skipping index at {ip}; run build_skipping_index first"
        )
    return spark.read.parquet(ip)


def prune_files(
    spark: SparkSession, path: str, predicates: list[Pred]
) -> list[str]:
    """Manifest-side pruning: the list of files whose [min, max] ranges
    can satisfy EVERY predicate. Predicates on columns the manifest
    didn't index are ignored for pruning (they still filter rows in
    ``read_with_skipping``)."""
    manifest = _load_manifest(spark, path)
    cond = F.lit(True)
    for p in predicates:
        if f"min_{p.col}" not in manifest.columns:
            continue
        cond = cond & _survives(p)
    return [
        _raw_path(r["file"])
        for r in manifest.filter(cond).select("file").collect()
    ]


def read_with_skipping(
    spark: SparkSession, path: str, predicates: list[Pred]
) -> DataFrame:
    """Read only the files the manifest can't rule out, then apply the
    exact predicate. Raises if the directory holds data files the
    manifest has never seen (stale index — rebuild), because silently
    ignoring unindexed files would DROP their rows."""
    manifest = _load_manifest(spark, path)
    known = {
        _rel_file(r["file"], path)
        for r in manifest.select("file").collect()
    }
    on_disk = set(_list_data_files(path))
    unknown = on_disk - known
    if unknown:
        raise RuntimeError(
            f"skipping index at {_index_path(path)} is stale: "
            f"{len(unknown)} data file(s) not in the manifest "
            f"(e.g. {sorted(unknown)[:3]}); rebuild the index"
        )
    files = prune_files(spark, path, predicates)
    schema = spark.read.parquet(path).schema
    if not files:
        return spark.createDataFrame([], schema).filter(_filter_expr(predicates))
    # basePath: partition columns live in the DIRECTORY names, not the
    # file footers — a bare-file read with an explicit schema would
    # return NULL for them (silently emptying any partition-column
    # predicate). basePath + schema keeps both the stable column set
    # and the path-derived partition values.
    return (
        spark.read.option("basePath", os.path.abspath(path))
        .schema(schema)
        .parquet(*files)
        .filter(_filter_expr(predicates))
    )


def update_skipping_index(spark: SparkSession, path: str) -> dict:
    """Incremental manifest maintenance: scan ONLY the data files the
    manifest has never seen (new appends), drop manifest rows whose
    files are gone (compaction/retention), keep everything else
    untouched. The full-rebuild path (`build_skipping_index`) rescans
    the entire table — at 100 TB that is exactly the cost an
    incremental refresh exists to avoid; this one's scan is
    O(new data), its bookkeeping O(files).

    Stats columns come from the existing manifest's schema (min_<c>
    columns) — the update cannot silently change what is indexed.
    Returns ``{"added": n_new_files, "removed": n_dropped_rows}``.
    Commit is the same staging + atomic-swap protocol as the build, so
    a crash leaves either the old or the new manifest, never a mix."""
    manifest = _load_manifest(spark, path)
    stats_cols = [c[len("min_"):] for c in manifest.columns if c.startswith("min_")]
    root_abs = os.path.abspath(path)
    known = {_rel_file(r["file"], path) for r in manifest.select("file").collect()}
    on_disk = set(_list_data_files(path))
    new_rel = sorted(on_disk - known)
    gone_rel = sorted(known - on_disk)

    keep = manifest
    if gone_rel:
        rel = _rel_col(root_abs)
        if len(gone_rel) <= 64:
            keep = manifest.filter(~rel.isin(gone_rel))
        else:
            # a compactor can delete thousands of files; an IN-list
            # that size bloats the plan — anti-join a broadcast list
            gone_df = local_rows_df(
                spark, [(g,) for g in gone_rel], "_gone string"
            )
            keep = (
                manifest.withColumn("_rel", rel)
                .join(
                    F.broadcast(gone_df),
                    F.col("_rel") == F.col("_gone"),
                    "left_anti",
                )
                .drop("_rel")
            )
    if not new_rel and not gone_rel:
        return {"added": 0, "removed": 0}

    parts = [keep]
    if new_rel:
        new_abs = [os.path.join(root_abs, f) for f in new_rel]
        # basePath, NOT an explicit schema: in a partitioned layout the
        # partition columns live in directory names, not file footers —
        # an explicit-schema read of the bare files would yield NULL
        # for them, and a stats column that IS a partition column would
        # then get NULL min/max, i.e. "prunable for anything": silently
        # WRONG pruning. basePath re-derives them from the paths.
        df = (
            spark.read.option("basePath", root_abs)
            .parquet(*new_abs)
            .select(*stats_cols)
        )
        aggs = [F.count(F.lit(1)).alias("rows")]
        for c in stats_cols:
            aggs += [
                F.min(c).alias(f"min_{c}"),
                F.max(c).alias(f"max_{c}"),
                (F.count(F.lit(1)) - F.count(c)).alias(f"nulls_{c}"),
            ]
        fresh = (
            df.withColumn("file", F.input_file_name()).groupBy("file").agg(*aggs)
        )
        # zero-row new files leave no groupBy entry — synthesize, same
        # contract as the build (NULL stats = prunable for anything)
        types = {f.name: f.dataType for f in df.schema.fields}
        listed = local_rows_df(
            spark,
            [(os.path.join(root_abs, f), f) for f in new_rel],
            "file string, _rel string",
        )
        empty_rows = (
            listed.join(
                fresh.select(_rel_col(root_abs).alias("_rel")),
                "_rel",
                "left_anti",
            )
            .select(
                "file",
                F.lit(0).cast("long").alias("rows"),
                *[
                    col
                    for c in stats_cols
                    for col in (
                        F.lit(None).cast(types[c]).alias(f"min_{c}"),
                        F.lit(None).cast(types[c]).alias(f"max_{c}"),
                        F.lit(0).cast("long").alias(f"nulls_{c}"),
                    )
                ],
            )
        )
        parts += [fresh.unionByName(empty_rows)]

    from functools import reduce as _reduce

    merged = _reduce(lambda a, b: a.unionByName(b), parts)
    ip = _index_path(path)
    staging = ip + ".staging"
    merged.coalesce(1).write.mode("overwrite").parquet(staging)
    commit_swap(ip, staging)
    return {"added": len(new_rel), "removed": len(gone_rel)}
