"""Versioned warehouse table: Delta-style time travel over plain
parquet — immutable data commits + an ordered JSON commit log.

``BASELINE.json`` names "Spark SQL + Delta Lake" as the north-star
storage; no Delta jars exist in this environment, so this implements
the transaction-log PATTERN the swap needs (same call shapes —
``commit`` ≈ write/MERGE, ``read(version=...)`` ≈ ``VERSION AS OF``,
``history`` ≈ DESCRIBE HISTORY, ``vacuum`` ≈ VACUUM) with the same
scale discipline Delta gets from its log:

- **Data files are immutable.** Every commit writes a fresh
  ``data/c{version}/`` directory; nothing is rewritten in place.
- **A version is a FILE LIST, not a copy.** The log entry names the
  commit dirs composing that version, so an append commits only the
  new rows (O(|batch|)) and a ROLLBACK is a zero-copy log entry that
  re-points at old dirs.
- **Readers never race writers.** A version's dir list is fixed at
  commit time; the log file itself appears atomically (tmp+rename),
  so a concurrent reader sees either the old latest or the new one,
  never a half-written table.
- **Schema travels with the log.** Each entry records the DataFrame
  schema JSON, so empty commits (a 0-row append writes no parquet
  data files) and schema evolution stay readable.
- **vacuum** deletes dirs unreferenced by the retained versions —
  storage is bounded by live history, as with Delta's VACUUM.
- **SINGLE WRITER.** Commits assume one writer at a time (the
  warehouse-MV/pipeline usage — foreachBatch is serial): the
  orphan-cleanup retry in ``commit`` treats an existing un-logged
  commit dir as a dead crash leftover, which is only sound when no
  CONCURRENT writer can be mid-write in it. Delta resolves this with
  optimistic concurrency + conflict re-check; multi-writer
  deployments need that (or a lock) on top of this log.

Layout:
  {path}/_log/{version:08d}.json   one entry per commit (see _entry)
  {path}/data/c{version:08d}/      parquet files written BY that commit

At 100 TB the only driver-side work is the log (one small JSON per
commit) — data moves exclusively through executor-side parquet IO.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from activedatawarehouseprototype_spark.session import local_rows_df
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class VersionedTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._log_dir = os.path.join(path, "_log")
        self._data_dir = os.path.join(path, "data")

    # -- log plumbing ----------------------------------------------------

    def _versions(self) -> list[int]:
        if not os.path.isdir(self._log_dir):
            return []
        return sorted(
            int(f[:-5]) for f in os.listdir(self._log_dir) if f.endswith(".json")
        )

    def _entry(self, version: int) -> dict:
        with open(os.path.join(self._log_dir, f"{version:08d}.json")) as f:
            return json.load(f)

    def _write_entry(self, version: int, entry: dict) -> None:
        os.makedirs(self._log_dir, exist_ok=True)
        final = os.path.join(self._log_dir, f"{version:08d}.json")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f)
        os.replace(tmp, final)  # the commit point (atomic on POSIX)

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    # -- write path ------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        op: str | None = None,
        ts: float | None = None,
    ) -> int:
        """Write ``df`` as the next version. ``mode='append'`` adds the
        batch to the previous version's file list; ``'overwrite'``
        starts a fresh list. Returns the new version number.

        ``ts`` (epoch seconds) stamps the entry for ``as_of_ts`` reads;
        defaults to the wall clock."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        prev = self.latest_version()
        version = 0 if prev is None else prev + 1
        cdir = os.path.join(self._data_dir, f"c{version:08d}")
        if os.path.exists(cdir):
            # orphan from a crash BETWEEN the data write and the log
            # write: no log entry references it (the log rename is the
            # commit point), so the half-written dir is dead weight
            # that would otherwise block this retry. Safe to clear —
            # a dir with a log entry can never collide here because
            # version numbers only move forward past logged entries.
            import shutil

            shutil.rmtree(cdir)
        df.write.mode("error").parquet(cdir)
        dirs = [f"c{version:08d}"]
        if mode == "append" and prev is not None:
            dirs = self._entry(prev)["dirs"] + dirs
        self._write_entry(
            version,
            {
                "version": version,
                "ts": float(ts) if ts is not None else time.time(),
                "op": op or mode,
                "mode": mode,
                "dirs": dirs,
                "schema": df.schema.json(),
            },
        )
        return version

    def rollback(self, to_version: int, ts: float | None = None) -> int:
        """Re-point the table at an older version's file list as a NEW
        commit (history is never rewritten; zero data copied)."""
        old = self._entry(to_version)  # raises if unknown
        prev = self.latest_version()
        version = prev + 1
        self._write_entry(
            version,
            {
                "version": version,
                "ts": float(ts) if ts is not None else time.time(),
                "op": f"rollback to {to_version}",
                "mode": "rollback",
                "dirs": old["dirs"],
                "schema": old["schema"],
            },
        )
        return version

    # -- read path -------------------------------------------------------

    def read(
        self, version: int | None = None, as_of_ts: float | None = None
    ) -> DataFrame:
        """Read the table at a version (default: latest). ``as_of_ts``
        picks the last version committed at-or-before that timestamp
        (Delta's TIMESTAMP AS OF)."""
        if version is not None and as_of_ts is not None:
            raise ValueError("pass version OR as_of_ts, not both")
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no commits at {self.path}")
        if as_of_ts is not None:
            eligible = [v for v in vs if self._entry(v)["ts"] <= as_of_ts]
            if not eligible:
                raise ValueError(
                    f"no version at or before ts={as_of_ts} "
                    f"(earliest is {self._entry(vs[0])['ts']})"
                )
            version = eligible[-1]
        elif version is None:
            version = vs[-1]
        entry = self._entry(version)
        schema = StructType.fromJson(json.loads(entry["schema"]))
        paths = [os.path.join(self._data_dir, d) for d in entry["dirs"]]
        reader = self.spark.read.schema(schema)
        if not paths:
            return local_rows_df(self.spark, [], schema)
        return reader.parquet(*paths)

    def history(self) -> list[dict]:
        """Newest-first commit metadata (DESCRIBE HISTORY analogue)."""
        return [
            {k: e[k] for k in ("version", "ts", "op", "mode", "dirs")}
            for e in (self._entry(v) for v in reversed(self._versions()))
        ]

    # -- maintenance -----------------------------------------------------

    def vacuum(self, retain_last: int = 1) -> list[str]:
        """Drop log entries older than the last ``retain_last`` versions
        and delete data dirs no retained version references. Returns the
        deleted dir names. Time travel before the horizon is gone after
        this — same contract as Delta VACUUM."""
        import shutil

        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        vs = self._versions()
        retained = vs[-retain_last:]
        live = {d for v in retained for d in self._entry(v)["dirs"]}
        removed = []
        for v in vs[:-retain_last]:
            os.remove(os.path.join(self._log_dir, f"{v:08d}.json"))
        if os.path.isdir(self._data_dir):
            for d in sorted(os.listdir(self._data_dir)):
                if d.startswith("c") and d not in live:
                    shutil.rmtree(os.path.join(self._data_dir, d))
                    removed.append(d)
        return removed


# -- rewrite commits (OPTIMIZE / DELETE analogues) ------------------------


def optimize(vt: VersionedTable, n_files: int = 8, ts: float | None = None) -> int:
    """Compact the current version into ``n_files`` files as a NEW
    commit (Delta OPTIMIZE): readers of old versions are untouched;
    ``vacuum`` later reclaims the small files once no retained version
    references them. Append history after this restarts from the
    compacted file list."""
    df = vt.read()
    return vt.commit(
        df.repartition(n_files), mode="overwrite", op=f"optimize({n_files})", ts=ts
    )


def delete_where(vt: VersionedTable, condition: str, ts: float | None = None) -> int:
    """DELETE FROM current WHERE condition, as a new commit — the
    GDPR-style erasure flow for a versioned table: the new HEAD no
    longer contains the rows, old versions still do (audit trail)
    until ``vacuum`` drops them past the retention horizon. Returns
    the new version.

    SQL DELETE semantics: only rows where the predicate is TRUE are
    deleted; rows where it evaluates to NULL are retained (``NOT
    (cond)`` would erase unrelated rows with NULLs in the predicate
    columns — the opposite of what a GDPR erasure should touch)."""
    df = vt.read().filter(~F.coalesce(F.expr(condition), F.lit(False)))
    return vt.commit(
        df, mode="overwrite", op=f"delete where {condition}", ts=ts
    )


def schema_diff(vt: VersionedTable, from_version: int, to_version: int) -> dict:
    """Schema drift between two versions (the log records each commit's
    schema, so this is pure control-plane JSON — no data read):
    {added: [(name, type)], removed: [(name, type)],
     changed: [(name, old_type, new_type)]}."""
    import json as _json

    def fields(v):
        sch = _json.loads(vt._entry(v)["schema"])
        return {f["name"]: _json.dumps(f["type"]) for f in sch["fields"]}

    a, b = fields(from_version), fields(to_version)
    return {
        "added": sorted((n, t) for n, t in b.items() if n not in a),
        "removed": sorted((n, t) for n, t in a.items() if n not in b),
        "changed": sorted(
            (n, a[n], b[n]) for n in a.keys() & b.keys() if a[n] != b[n]
        ),
    }
