"""Persisted MinHash-LSH dedup index: build / lookup / append.

Covers the three contracts that make the index the 100 TB incremental
path: (a) lookup matches the batch-mode LSH semantics, (b) the index
scan is partition-pruned by band-sig bucket (PartitionFilters in the
plan), (c) the hot-shingle cap decided at BUILD time governs later
batches (persisted list, not batch-local document frequencies)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from activedatawarehouseprototype_spark.operators import dedup_index as DI


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()


def _sentence(i: int, n: int = 12) -> str:
    return " ".join(WORDS[(i + j) % len(WORDS)] + str((i * 7 + j * 3) % 23) for j in range(n))


@pytest.fixture(scope="module")
def corpus_rows():
    return [(i, _sentence(i)) for i in range(60)]


def test_lookup_finds_exact_and_near_dups(spark, tmp_path, corpus_rows):
    idx = str(tmp_path / "idx")
    corpus = _mkdocs(spark, corpus_rows)
    DI.dedup_index_build(corpus, idx, n=3, k=12, bands=3)
    batch = _mkdocs(
        spark,
        [
            (1000, _sentence(7)),             # exact copy of doc 7
            (1001, _sentence(13) + " zz9"),   # near-dup of doc 13
            (1002, "totally unrelated words only here once"),
        ],
    )
    got = {
        (r["id_new"], r["id_indexed"])
        for r in DI.dedup_index_lookup(spark, idx, batch).collect()
    }
    assert (1000, 7) in got
    assert (1001, 13) in got
    assert not any(new_id == 1002 for new_id, _ in got)


def test_lookup_matches_batch_mode_lsh(spark, tmp_path, corpus_rows):
    """Index lookup == lsh_candidates on the union, restricted to
    (batch, corpus) cross pairs — same signatures, same band knee."""
    from activedatawarehouseprototype_spark.operators import dedup

    idx = str(tmp_path / "idx2")
    corpus = _mkdocs(spark, corpus_rows)
    batch = _mkdocs(
        spark,
        [(2000 + i, _sentence(i * 3) + (" zz9" if i % 2 else ""))
         for i in range(8)],
    )
    DI.dedup_index_build(corpus, idx, n=3, k=12, bands=3)
    got = {
        (r["id_new"], r["id_indexed"])
        for r in DI.dedup_index_lookup(spark, idx, batch).collect()
    }
    pairs = dedup.lsh_candidates(
        corpus.unionByName(batch), "doc_id", "text", n=3, k=12, bands=3
    )
    want = {
        (b, a)
        for a, b in ((r["id_a"], r["id_b"]) for r in pairs.collect())
        if a < 2000 <= b
    }
    assert got == want


def test_lookup_scan_is_partition_pruned(spark, tmp_path, corpus_rows):
    idx = str(tmp_path / "idx3")
    DI.dedup_index_build(_mkdocs(spark, corpus_rows), idx, n=3, k=12, bands=3)
    batch = _mkdocs(spark, [(3000, _sentence(5))])
    # lookup localCheckpoints its result, so the pruned scan is not in
    # the RETURNED plan; re-create the pruned read the lookup builds
    # (same code path: _read_meta + _banded_for + bucket isin) and
    # assert the bucket partition filter reaches the file scan.
    m = DI._read_meta(spark, idx)
    hot = spark.read.parquet(f"{idx}/hot_shingles")
    banded = DI._banded_for(batch, "doc_id", "text", m["n"], m["k"],
                            m["bands"], m["n_buckets"], hot)
    buckets = sorted(r["bucket"] for r in banded.select("bucket").distinct().collect())
    assert 0 < len(buckets) <= m["n_buckets"]
    pruned = spark.read.parquet(f"{idx}/bands").filter(F.col("bucket").isin(buckets))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    mfilt = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert mfilt and "bucket" in mfilt.group(1)


def test_append_then_lookup_sees_new_docs(spark, tmp_path, corpus_rows):
    idx = str(tmp_path / "idx4")
    DI.dedup_index_build(_mkdocs(spark, corpus_rows), idx, n=3, k=12, bands=3)
    DI.dedup_index_append(
        spark, idx, _mkdocs(spark, [(500, "one unique sentence " + _sentence(41))])
    )
    batch = _mkdocs(spark, [(4000, "one unique sentence " + _sentence(41))])
    got = {
        (r["id_new"], r["id_indexed"])
        for r in DI.dedup_index_lookup(spark, idx, batch).collect()
    }
    assert (4000, 500) in got  # exact copy of the APPENDED doc


def test_hot_shingle_cap_is_persisted(spark, tmp_path):
    """With a cap of 1, every corpus shingle (each appears in 2 docs)
    is hot: signatures are empty on both sides and NOTHING matches —
    even an exact copy — proving the lookup consults the PERSISTED
    list rather than recomputing batch-local frequencies (under which
    each batch shingle appears once and would survive)."""
    idx = str(tmp_path / "idx5")
    text = "red green blue yellow purple orange"
    corpus = _mkdocs(spark, [(1, text), (2, text)])
    DI.dedup_index_build(corpus, idx, n=3, k=12, bands=3, max_doc_freq=1)
    got = DI.dedup_index_lookup(
        spark, idx, _mkdocs(spark, [(9000, text)])
    ).collect()
    assert got == []
    # sanity: without the cap the same lookup matches both copies
    idx2 = str(tmp_path / "idx5b")
    DI.dedup_index_build(corpus, idx2, n=3, k=12, bands=3)
    got2 = {
        (r["id_new"], r["id_indexed"])
        for r in DI.dedup_index_lookup(
            spark, idx2, _mkdocs(spark, [(9000, text)])
        ).collect()
    }
    assert got2 == {(9000, 1), (9000, 2)}


def test_cli_dedup_index_roundtrip(spark, tmp_path):
    """dedup-index-build then dedup-index-lookup --append: matches are
    written, unmatched docs join the index, and a re-lookup of the
    same batch now matches the appended copies."""
    from activedatawarehouseprototype_spark.cli import main

    corpus = _mkdocs(spark, [(i, _sentence(i)) for i in range(30)])
    corp_p = str(tmp_path / "corpus.parquet")
    corpus.write.parquet(corp_p)
    batch = _mkdocs(spark, [(5000, _sentence(3)), (5001, _sentence(99))])
    batch_p = str(tmp_path / "batch.parquet")
    batch.write.parquet(batch_p)

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "matches")
    assert main(["dedup-index-build", "--input", corp_p, "--index", idx,
                 "--n", "3"]) == 0
    assert main(["dedup-index-lookup", "--index", idx, "--batch", batch_p,
                 "--output", out, "--append"]) == 0
    got = {(r["id_new"], r["id_indexed"])
           for r in spark.read.parquet(out).collect()}
    assert got == {(5000, 3)}  # 5001's sentence is not in the corpus

    # 5001 was appended as a survivor; 5000 (matched) was NOT. A new
    # batch carrying the same text under a fresh id now matches 5001,
    # and an exact copy of doc 3's text still matches only the corpus
    # doc (5000 never entered the index).
    batch2 = _mkdocs(spark, [(6001, _sentence(99)), (6000, _sentence(3))])
    batch2_p = str(tmp_path / "batch2.parquet")
    batch2.write.parquet(batch2_p)
    out2 = str(tmp_path / "matches2")
    assert main(["dedup-index-lookup", "--index", idx, "--batch", batch2_p,
                 "--output", out2]) == 0
    got2 = {(r["id_new"], r["id_indexed"])
            for r in spark.read.parquet(out2).collect()}
    assert got2 == {(6001, 5001), (6000, 3)}


def test_dedup_index_compact_preserves_lookups(spark, tmp_path, corpus_rows):
    """After several appends the bands table holds many small files;
    compaction shrinks the file count and lookups return identical
    results."""
    import os

    idx = str(tmp_path / "idx6")
    DI.dedup_index_build(_mkdocs(spark, corpus_rows), idx, n=3, k=12, bands=3)
    for i in range(3):
        DI.dedup_index_append(
            spark, idx, _mkdocs(spark, [(600 + i, _sentence(80 + i))])
        )
    batch = _mkdocs(spark, [(7000, _sentence(81)), (7001, _sentence(5))])
    before = {
        (r["id_new"], r["id_indexed"])
        for r in DI.dedup_index_lookup(spark, idx, batch).collect()
    }

    def n_files():
        total = 0
        for root, _, files in os.walk(f"{idx}/bands"):
            total += sum(1 for f in files if f.endswith(".parquet"))
        return total

    n_before = n_files()
    DI.dedup_index_compact(spark, idx)
    assert n_files() < n_before
    after = {
        (r["id_new"], r["id_indexed"])
        for r in DI.dedup_index_lookup(spark, idx, batch).collect()
    }
    assert after == before and (7000, 601) in after


def test_cli_index_compact(spark, tmp_path):
    from activedatawarehouseprototype_spark.cli import main

    idx = str(tmp_path / "idx7")
    DI.dedup_index_build(
        _mkdocs(spark, [(i, _sentence(i)) for i in range(20)]), idx, n=3
    )
    DI.dedup_index_append(spark, idx, _mkdocs(spark, [(99, _sentence(99))]))
    assert main(["index-compact", "--index", idx, "--kind", "dedup"]) == 0
    got = {
        (r["id_new"], r["id_indexed"])
        for r in DI.dedup_index_lookup(
            spark, idx, _mkdocs(spark, [(500, _sentence(99))])
        ).collect()
    }
    assert (500, 99) in got


def test_index_lookup_recall_across_similarity_knee(spark, tmp_path):
    """Quantified LSH knee on the INDEX path (k=12, bands=3 → 4-row
    bands): near-copies (95% of words kept) almost all match; docs
    keeping only 20% almost never do. Deterministic construction, so
    the measured recalls (0.97 / 0.0 here) are stable — thresholds
    leave margin for parameter tweaks, not randomness."""
    base_words = [f"w{i}q{i % 7}" for i in range(40)]
    corpus = _mkdocs(
        spark,
        [(i, " ".join((base_words[j % 40] + f"d{i}") for j in range(40)))
         for i in range(30)],
    )
    idx = str(tmp_path / "idx-knee")
    DI.dedup_index_build(corpus, idx, n=3, k=12, bands=3)

    def variant(doc_id, new_id, keep_frac):
        words = [(base_words[j % 40] + f"d{doc_id}") for j in range(40)]
        n_keep = int(len(words) * keep_frac)
        kept = words[:n_keep] + [f"noise{new_id}x{j}"
                                 for j in range(len(words) - n_keep)]
        return (new_id, " ".join(kept))

    high = _mkdocs(spark, [variant(i, 1000 + i, 0.95) for i in range(30)])
    low = _mkdocs(spark, [variant(i, 2000 + i, 0.2) for i in range(30)])

    hi_hits = {
        r["id_new"]
        for r in DI.dedup_index_lookup(spark, idx, high).collect()
        if r["id_indexed"] == r["id_new"] - 1000
    }
    lo_hits = {
        r["id_new"]
        for r in DI.dedup_index_lookup(spark, idx, low).collect()
        if r["id_indexed"] == r["id_new"] - 2000
    }
    assert len(hi_hits) / 30 >= 0.8, f"high-sim recall {len(hi_hits)/30:.2f}"
    assert len(lo_hits) / 30 <= 0.2, f"low-sim leakage {len(lo_hits)/30:.2f}"


def test_bucket_skew_guard_warns_and_compact_splits(spark, tmp_path, corpus_rows):
    """Round-4 VERDICT item 7: a pathological batch whose signatures
    all land in one bucket (identical texts) must (a) be visible in the
    maintained per-bucket stats, (b) raise a skew warning at append,
    and (c) be splittable into multiple files by
    dedup_index_compact(max_rows_per_file=...) without changing lookup
    results."""
    import os
    import warnings

    idx = str(tmp_path / "skewidx")
    corpus = _mkdocs(spark, corpus_rows)
    DI.dedup_index_build(corpus, idx, n=3, k=12, bands=3)

    # stats exist and cover every band row of the build
    st = {r.bucket: r.n_rows for r in DI.bucket_stats(spark, idx).collect()}
    assert sum(st.values()) == 3 * len(corpus_rows)
    assert DI.hot_buckets(spark, idx) == []

    # plant the hot bucket: 400 docs with IDENTICAL text → identical
    # signatures → all band rows land in (at most) 3 buckets
    hot_text = "omega " * 40
    hot_batch = _mkdocs(
        spark, [(10_000 + i, hot_text) for i in range(400)]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        DI.dedup_index_append(spark, idx, hot_batch)
    assert any("exceed" in str(x.message) for x in w), "no skew warning"
    hot = DI.hot_buckets(spark, idx)
    assert hot, "planted hot bucket not detected"
    st2 = {r.bucket: r.n_rows for r in DI.bucket_stats(spark, idx).collect()}
    assert sum(st2.values()) == 3 * (len(corpus_rows) + 400)

    # lookup result before compaction (a near-dup of the hot text)
    probe = _mkdocs(spark, [(99_999, hot_text + " zz")])
    before = {
        (r.id_new, r.id_indexed)
        for r in DI.dedup_index_lookup(spark, idx, probe).collect()
    }
    assert len(before) >= 400  # matches every planted copy

    # compact with the splitter: the hot bucket gets multiple files
    DI.dedup_index_compact(spark, idx, max_rows_per_file=200)
    hot_dir = os.path.join(idx, "bands", f"bucket={hot[0]}")
    n_files = len([f for f in os.listdir(hot_dir) if f.endswith(".parquet")])
    assert n_files >= 2, f"hot bucket not split: {n_files} file(s)"
    # the per-file ROW BOUND is hard (maxRecordsPerFile), even if two
    # salt groups hash-collide into one shuffle partition
    import pyarrow.parquet as pq

    for f in os.listdir(hot_dir):
        if f.endswith(".parquet"):
            nr = pq.ParquetFile(os.path.join(hot_dir, f)).metadata.num_rows
            assert nr <= 200, f"file {f} has {nr} rows > max_rows_per_file"
    after = {
        (r.id_new, r.id_indexed)
        for r in DI.dedup_index_lookup(spark, idx, probe).collect()
    }
    assert after == before  # splitting changed layout, not answers
    # stats refreshed from actuals
    st3 = {r.bucket: r.n_rows for r in DI.bucket_stats(spark, idx).collect()}
    assert st3 == st2


@pytest.mark.slow
def test_compact_crash_matrix_every_rename_boundary(spark, tmp_path, corpus_rows):
    """Exhaustive crash injection over dedup_index_compact's swap
    protocol (bands commit_swap -> stats commit_swap, 4 rename
    boundaries): crash before EVERY os.replace call, re-run compact,
    and assert lookups and bucket stats are indistinguishable from a
    never-crashed compaction. Compaction preserves the row set, so
    even the window between the two swaps (new bands committed, old
    stats) leaves stats CORRECT — the matrix proves that, rather than
    assuming it. The walk stops when a run completes with no
    injection left to fire, so swap points added later are covered
    automatically."""
    import os

    class _Crash(RuntimeError):
        pass

    def _inject(mp, crash_at):
        real = os.replace
        state = {"calls": 0, "fired": False}

        def patched(src, dst, **kw):
            if state["calls"] == crash_at:
                state["fired"] = True
                raise _Crash(f"injected before os.replace #{crash_at}")
            state["calls"] += 1
            return real(src, dst, **kw)

        mp.setattr("os.replace", patched)
        return state

    batch = _mkdocs(
        spark,
        [(3000 + i, _sentence(i * 5) + (" zz9" if i % 3 else ""))
         for i in range(6)],
    )

    def build(idx):
        DI.dedup_index_build(_mkdocs(spark, corpus_rows), idx, n=3, k=12, bands=3)
        DI.dedup_index_append(
            spark, idx, _mkdocs(spark, [(2000 + i, _sentence(i * 2)) for i in range(10)])
        )

    def lookup(idx):
        return {
            (r["id_new"], r["id_indexed"])
            for r in DI.dedup_index_lookup(spark, idx, batch).collect()
        }

    def stats(idx):
        return {
            (r["bucket"], r["n_rows"])
            for r in DI.bucket_stats(spark, idx).collect()
        }

    golden_idx = str(tmp_path / "golden")
    build(golden_idx)
    DI.dedup_index_compact(spark, golden_idx, max_rows_per_file=40)
    golden_hits, golden_stats = lookup(golden_idx), stats(golden_idx)
    assert golden_hits and golden_stats

    crash_at = 0
    while True:
        idx = str(tmp_path / f"crash{crash_at}")
        build(idx)
        with pytest.MonkeyPatch.context() as mp:
            state = _inject(mp, crash_at)
            try:
                DI.dedup_index_compact(spark, idx, max_rows_per_file=40)
            except _Crash:
                pass
        if not state["fired"]:
            break
        # BEFORE recovery, reads must already be safe: bucket_stats
        # self-recovers its own swap, and the bands table is either the
        # old or the new layout — lookup hits are identical in both
        assert lookup(idx) == golden_hits, f"pre-recovery, crash point {crash_at}"
        # recovery = re-running the compaction
        DI.dedup_index_compact(spark, idx, max_rows_per_file=40)
        assert lookup(idx) == golden_hits, f"crash point {crash_at}"
        assert stats(idx) == golden_stats, f"crash point {crash_at}"
        for leftover in ("bands.old", "bands.staging",
                         "bucket_stats.old", "bucket_stats.staging"):
            assert not os.path.exists(os.path.join(idx, leftover)), leftover
        crash_at += 1
    assert crash_at >= 4, f"expected >=4 rename boundaries, saw {crash_at}"
