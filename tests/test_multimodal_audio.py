"""Audio tier of the multimodal plumbing (FAUD fake codec — the
container ships no audio library, so the deterministic generator
makes decode results exactly predictable; a real deployment swaps
``_decode_audio_blob``): decode stats vs hand values, error rows as
data, segmentation round-trip."""

from __future__ import annotations

import math

import pytest

from activedatawarehouseprototype_spark.operators.multimodal import (
    audio_segments,
    decode_audio,
    make_fake_audio,
)


def _blobs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, content binary")


def test_decode_matches_hand_computation(spark):
    doc_id, n, rate = 7, 400, 8_000
    df = _blobs(spark, [(doc_id, make_fake_audio(doc_id, n, rate))])
    got = decode_audio(df).collect()[0]
    assert (got["sample_rate"], got["channels"], got["n_samples"]) == (rate, 1, n)
    assert got["duration_s"] == pytest.approx(n / rate)
    vals = [(((doc_id * 131 + i * 17) % 20001) - 10000) / 32768.0 for i in range(n)]
    rms = math.sqrt(sum(v * v for v in vals) / n)
    peak = max(abs(v) for v in vals)
    zc = sum(
        1 for a, b in zip(vals, vals[1:]) if (a < 0) != (b < 0)
    ) / (n - 1)
    assert got["rms"] == pytest.approx(rms, rel=1e-12)
    assert got["peak"] == pytest.approx(peak, rel=1e-12)
    assert got["zero_cross_rate"] == pytest.approx(zc, rel=1e-12)
    assert got["decode_error"] is None


def test_stereo_mono_mix(spark):
    df = _blobs(spark, [(1, make_fake_audio(1, 100, 16_000, channels=2))])
    got = decode_audio(df).collect()[0]
    assert got["channels"] == 2 and got["n_samples"] == 100
    assert got["rms"] is not None


def test_corrupt_blobs_are_rows_not_failures(spark):
    good = make_fake_audio(1, 50)
    df = _blobs(
        spark,
        [
            (1, good),
            (2, b"not audio at all"),
            (3, good[:-1]),  # truncated sample
            (4, None),
        ],
    )
    got = {r["doc_id"]: r for r in decode_audio(df).collect()}
    assert got[1]["decode_error"] is None
    assert "FAUD" in got[2]["decode_error"]
    assert "truncated" in got[3]["decode_error"]
    assert got[4]["decode_error"] is not None
    assert len(got) == 4  # every input row surfaced


def test_segments_roundtrip_and_boundaries(spark):
    """2.5 s at 1 kHz in 1 s segments -> 3 segments (1000/1000/500
    samples); each segment independently decodes and the sample counts
    reassemble the original."""
    rate, n = 1_000, 2_500
    df = _blobs(spark, [(9, make_fake_audio(9, n, rate))])
    segs = audio_segments(df, segment_s=1.0).orderBy("segment_idx").collect()
    assert [r["segment_idx"] for r in segs] == [0, 1, 2]
    assert [r["start_s"] for r in segs] == [0.0, 1.0, 2.0]
    seg_df = _blobs(spark, [(r["segment_idx"], bytes(r["segment"])) for r in segs])
    dec = {r["doc_id"]: r for r in decode_audio(seg_df).collect()}
    assert [dec[i]["n_samples"] for i in range(3)] == [1000, 1000, 500]
    assert all(dec[i]["sample_rate"] == rate for i in range(3))
    assert all(dec[i]["decode_error"] is None for i in range(3))


def test_segments_skip_undecodable(spark):
    df = _blobs(spark, [(1, b"junk"), (2, make_fake_audio(2, 10, 1000))])
    segs = audio_segments(df, segment_s=1.0).collect()
    assert {r["doc_id"] for r in segs} == {2}
    with pytest.raises(ValueError):
        audio_segments(df, segment_s=0.0)


def test_audio_exact_int_stats_match_formula_and_float_path(spark):
    """The exact BIGINT stats must equal a pure-Python evaluation of
    the FAUD sample formula AND tie out against the float decode path
    (sum_sq == rms^2 * n * 32768^2 within float tolerance)."""
    import math

    from pyspark.sql import Row

    from activedatawarehouseprototype_spark.operators.multimodal import (
        attach_fake_audio,
        audio_exact_int_stats,
        decode_audio,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=d, n_samples=50 + d % 13) for d in (0, 7, 21, 9001)]
    )
    blobs = attach_fake_audio(docs).persist()
    got = {r["doc_id"]: r for r in audio_exact_int_stats(blobs).collect()}
    fl = {r["doc_id"]: r for r in decode_audio(blobs).collect()}
    for d in (0, 7, 21, 9001):
        n = 50 + d % 13
        vs = [((d * 131 + i * 17) % 20001) - 10000 for i in range(n)]
        r = got[d]
        assert r["n_samples"] == n and r["channels"] == 1
        assert r["sample_rate"] == 16_000
        assert r["peak_i16"] == max(abs(v) for v in vs)
        assert r["zero_crossings"] == sum(
            1 for a, b in zip(vs, vs[1:]) if (a < 0) != (b < 0)
        )
        assert r["sum_sq"] == sum(v * v for v in vs)
        # tie-out vs the float path on the SAME blobs
        f = fl[d]
        assert f["n_samples"] == n
        assert math.isclose(
            f["rms"] ** 2 * n * 32768**2, r["sum_sq"], rel_tol=1e-9
        )
        assert math.isclose(f["peak"] * 32768, r["peak_i16"], rel_tol=1e-12)
        assert round(f["zero_cross_rate"] * (n - 1)) == r["zero_crossings"]
    blobs.unpersist()


def test_audio_exact_int_stats_malformed_blobs_yield_nulls(spark):
    from pyspark.sql import Row

    from activedatawarehouseprototype_spark.operators.multimodal import (
        audio_exact_int_stats,
        make_fake_audio,
    )

    rows = [
        Row(doc_id=1, content=b"nope"),
        Row(doc_id=2, content=None),
        # stereo: exact stats refuse (mean across channels is not
        # integer-exact) — NULLs, not wrong numbers
        Row(doc_id=3, content=make_fake_audio(3, 8, channels=2)),
        Row(doc_id=4, content=make_fake_audio(4, 5)),
    ]
    got = {r["doc_id"]: r for r in
           audio_exact_int_stats(spark.createDataFrame(rows)).collect()}
    for bad in (1, 2, 3):
        assert got[bad]["sum_sq"] is None and got[bad]["n_samples"] is None
    assert got[4]["n_samples"] == 5 and got[4]["sum_sq"] is not None
