"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas
functions via ``mapInPandas``.

The container has no image/audio codecs, so ``decode_image`` runs a
clearly-documented DETERMINISTIC FAKE codec (the FIMG format below) —
everything Spark-side is real and tested: the schema contract, the
mapInPandas batch shape, per-row decode-error handling, and
``byte_stats`` (a genuine per-blob computation: length, mean byte,
Shannon entropy over the byte histogram). A real deployment swaps ONE
function (``_decode_blob``) for PIL/libvips.

At 100 TB: blobs ride in parquet binary columns; mapInPandas streams
Arrow batches so peak memory is one batch per core, not one file;
feature extraction parallelizes per partition with zero driver
involvement. Size ``spark.sql.files.maxPartitionBytes`` to a few
hundred blobs per task.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_METADATA = StructType(
    [
        StructField("mime", StringType()),
        StructField("source_id", LongType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("blob_len", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_entropy", DoubleType()),
    ]
)


def attach_blobs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic binary column (md5 digest bytes of
    the text) plus typed metadata — stands in for real image/audio
    payloads so the downstream plumbing is exercised for real."""
    content = F.unhex(F.md5(F.col(text_col).cast("binary")))
    return df.select(
        F.col(id_col),
        content.alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.col(id_col).cast("long").alias("source_id"),
            F.octet_length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _entropy(b: bytes) -> float:
    if not b:
        return 0.0
    counts: dict[int, int] = {}
    for x in b:
        counts[x] = counts.get(x, 0) + 1
    n = len(b)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def byte_stats(df: DataFrame) -> DataFrame:
    """Per-blob features via Arrow-batched mapInPandas (the real
    multimodal hot path shape: binary in, fixed-width features out)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # a nullable binary column is the normal parquet shape for
            # media blobs: treat NULL as empty instead of crashing the
            # task on len(None)
            blobs = pdf["content"].map(lambda b: b if b is not None else b"")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "blob_len": blobs.map(len).astype("int64"),
                    "byte_mean": blobs.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "byte_entropy": blobs.map(_entropy),
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
        StructField("frame_len", LongType()),
    ]
)


def sample_frames(
    df: DataFrame, frame_bytes: int = 4, stride: int = 2
) -> DataFrame:
    """Frame-sampling plumbing (the video-keyframe shape: ONE blob row
    in → MANY frame rows out). The blob is treated as a dense sequence
    of ``frame_bytes``-sized frames and every ``stride``-th frame is
    emitted as its own binary row — with real codecs the chunking step
    becomes the decoder's frame iterator, the fan-out/batching/schema
    stay identical. Arrow-batched; output volume is
    |blob| / (frame_bytes * stride) rows per input row, all computed
    partition-local (no shuffle introduced by the sampling itself)."""
    if frame_bytes <= 0 or stride <= 0:
        raise ValueError("frame_bytes and stride must be positive")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for did, blob in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(blob)
                n_frames = len(b) // frame_bytes
                for k in range(0, n_frames, stride):
                    ids.append(int(did))
                    idxs.append(k)
                    frames.append(b[k * frame_bytes : (k + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": pd.Series(frames, dtype="object"),
                    "frame_len": pd.Series(
                        [len(f) for f in frames], dtype="int64"
                    ),
                }
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


EMBED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic fixed-width feature vector per blob (the
    embed-the-image shape: binary in → ``array<double>`` out). The fake
    "model" is the L1-normalized byte histogram folded to ``dim``
    buckets — deterministic so tests pin exact values; swap the body
    for a real vision/audio encoder (ONNX/torch in a predict_batch
    UDF), the Arrow batching and output schema are the contract. The
    output column drops straight into the similarity operators
    (``topk_brute_force`` / LSH / IVF), closing the multimodal → ANN
    pipeline without leaving DataFrame land."""
    if dim <= 0:
        raise ValueError("dim must be positive")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            feats: list[list[float]] = []
            for blob in pdf["content"]:
                b = np.frombuffer(bytes(blob), dtype=np.uint8)
                if b.size == 0:
                    feats.append([0.0] * dim)
                    continue
                hist = np.bincount(b % dim, minlength=dim).astype(np.float64)
                feats.append((hist / hist.sum()).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "feature": pd.Series(feats, dtype="object"),
                }
            )

    return df.mapInPandas(batches, EMBED_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content", BinaryType()),
        StructField("orig_len", LongType()),
        StructField("new_len", LongType()),
    ]
)


def resize_blob(df: DataFrame, factor: int = 4) -> DataFrame:
    """Resize plumbing (the make-a-thumbnail shape: ONE blob row in ->
    ONE smaller blob row out, unlike ``sample_frames``'s fan-out).
    Without codecs, "resize" is deterministic byte decimation (every
    ``factor``-th byte) — with a real image library the body becomes
    decode -> PIL/vips resize -> re-encode while the Arrow batching,
    1:1 row contract, and output schema stay identical. Partition-
    local, no shuffle; output is ~1/factor of the input bytes, which
    is also the IO story a real thumbnail pass has at scale."""
    if factor <= 0:
        raise ValueError("factor must be positive")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[bytes] = []
            lens: list[int] = []
            for blob in pdf["content"]:
                # NULL content is the normal parquet shape for media
                # blobs (same guard as byte_stats): map to b'' so a
                # null cell yields an empty thumbnail, not a dead task
                b = bytes(blob) if blob is not None else b""
                out.append(b[::factor])
                lens.append(len(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "content": pd.Series(out, dtype="object"),
                    "orig_len": pd.Series(lens, dtype="int64"),
                    "new_len": pd.Series(
                        [len(o) for o in out], dtype="int64"
                    ),
                }
            )

    return df.mapInPandas(batches, RESIZE_SCHEMA)


# --- deterministic fake image format (documented test codec) -------------
#
# The container ships no image codecs, so the decode tier runs on a
# DETERMINISTIC FAKE format instead of raising: a real deployment swaps
# _decode_blob's body for PIL/libvips and NOTHING else changes — the
# schema, Arrow batching, per-row error handling, and the decode ->
# resize -> features -> ANN chain are all exercised for real.
#
#   FIMG | width:u16be | height:u16be | channels:u8 | pixels (w*h*c bytes)

FIMG_MAGIC = b"FIMG"

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("channel_means", ArrayType(DoubleType())),
        StructField("decode_error", StringType()),
    ]
)


def make_fake_image(
    doc_id: int, width: int, height: int, channels: int = 3
) -> bytes:
    """Encode a deterministic FIMG blob: pixel (x, y, c) is a pure
    function of (doc_id, x, y, c) — so decode results are exactly
    predictable in tests without any codec library."""
    if not (0 < width < 65536 and 0 < height < 65536 and 0 < channels < 256):
        raise ValueError("dimensions out of FIMG range")
    header = (
        FIMG_MAGIC
        + width.to_bytes(2, "big")
        + height.to_bytes(2, "big")
        + channels.to_bytes(1, "big")
    )
    px = bytearray()
    for y in range(height):
        for x in range(width):
            for c in range(channels):
                px.append((doc_id * 31 + x * 7 + y * 13 + c * 101) % 256)
    return header + bytes(px)


def _decode_blob(blob) -> tuple:
    """(width, height, channels, channel_means, error) for one blob —
    THE swap point for a real codec (PIL: Image.open -> size/mode ->
    np.asarray(...).mean(axis=(0, 1))). Errors are per-row data, not
    task failures: a corrupt blob in a 100-TB crawl must not kill the
    job."""
    b = bytes(blob) if blob is not None else b""
    if len(b) < 9 or b[:4] != FIMG_MAGIC:
        return None, None, None, None, "not a FIMG blob"
    w = int.from_bytes(b[4:6], "big")
    h = int.from_bytes(b[6:8], "big")
    c = b[8]
    px = b[9:]
    if len(px) != w * h * c:
        return None, None, None, None, (
            f"truncated pixels: {len(px)} != {w}*{h}*{c}"
        )
    means = []
    for ch in range(c):
        sel = px[ch::c]
        means.append(sum(sel) / len(sel) if sel else 0.0)
    return w, h, c, means, None


def decode_image(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "content"
) -> DataFrame:
    """Decode image blobs to dimensions + per-channel means. Runs the
    deterministic FIMG test codec in this environment (no image
    libraries in the container — see the block comment above);
    swapping in a real codec changes ONE function (``_decode_blob``).
    Per-row errors surface in ``decode_error`` instead of failing the
    task."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_decode_blob(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.array(
                        [r[0] for r in rows], dtype="Int64"
                    ),
                    "height": pd.array(
                        [r[1] for r in rows], dtype="Int64"
                    ),
                    "channels": pd.array(
                        [r[2] for r in rows], dtype="Int64"
                    ),
                    "channel_means": pd.Series(
                        [r[3] for r in rows], dtype="object"
                    ),
                    "decode_error": pd.Series(
                        [r[4] for r in rows], dtype="object"
                    ),
                }
            )

    return df.mapInPandas(batches, DECODE_SCHEMA)


def binary_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    k: int = 8,
    w: int = 6,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate BLOBS without decoding them: winnowed
    rolling-hash fingerprints over the raw bytes — the modality-blind
    member of the dedup family (exact md5 catches identical files;
    this catches re-containered / prefix-stamped / appended variants,
    the common near-dup shapes for media assets, all without any
    codec in the environment).

    Implementation is a pure composition of oracled pieces: hex-encode
    the blob, split into byte tokens (one per 2 hex chars via a
    codegen regexp), and run the SAME winnow_overlap_pairs machinery
    the text family uses (k-byte grams, w-window minima, inverted
    fingerprint index — Σ|bucket|² pair generation, never all-pairs).
    Containment = shared / min(|A|, |B|), so a blob embedded in a
    larger one scores ~1.0."""
    from activedatawarehouseprototype_spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    as_tokens = F.trim(
        F.regexp_replace(F.hex(F.col(blob_col)), "(..)", "$1 ")
    )
    tokenized = df.select(F.col(id_col), as_tokens.alias("_bytes_text"))
    return winnow_overlap_pairs(
        tokenized, id_col, "_bytes_text",
        k=k, w=w, threshold=threshold, max_doc_freq=max_doc_freq,
    )


# -- audio tier -------------------------------------------------------------
# FAUD (fake-audio) test codec, the audio sibling of FIMG:
#   FAUD | sample_rate:u32be | channels:u8 | samples (s16be, interleaved)
# Samples are signed 16-bit PCM. ``_decode_audio_blob`` is THE swap
# point for a real decoder (soundfile/librosa: sf.read -> rate,
# np.ndarray; torchaudio.load likewise); no audio library exists in
# this container, so tests use the deterministic generator below.

FAUD_MAGIC = b"FAUD"

AUDIO_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("zero_cross_rate", DoubleType()),
        StructField("decode_error", StringType()),
    ]
)


def make_fake_audio(
    doc_id: int, n_samples: int, sample_rate: int = 16_000, channels: int = 1
) -> bytes:
    """Encode a deterministic FAUD blob: sample (i, c) is a pure
    function of (doc_id, i, c) — a ramp-modulated square-ish wave so
    rms/peak/zero-crossings are exactly predictable in tests."""
    if not (0 < sample_rate < 2**32 and 0 < channels < 256 and n_samples >= 0):
        raise ValueError("parameters out of FAUD range")
    header = (
        FAUD_MAGIC
        + int(sample_rate).to_bytes(4, "big")
        + int(channels).to_bytes(1, "big")
    )
    out = bytearray(header)
    for i in range(n_samples):
        for c in range(channels):
            v = ((doc_id * 131 + i * 17 + c * 7919) % 20001) - 10000
            out += int(v).to_bytes(2, "big", signed=True)
    return bytes(out)


def _decode_audio_blob(blob) -> tuple:
    """(rate, channels, n_samples, duration, rms, peak, zcr, error)
    for one blob — the real-decoder swap point. Signal stats are
    computed over the MONO MIX (mean across channels), the common
    normalization for corpus-level audio QA. Errors are per-row data,
    never task failures."""
    import numpy as np

    b = bytes(blob) if blob is not None else b""
    if len(b) < 9 or b[:4] != FAUD_MAGIC:
        return None, None, None, None, None, None, None, "not a FAUD blob"
    rate = int.from_bytes(b[4:8], "big")
    ch = b[8]
    body = b[9:]
    if rate <= 0 or ch <= 0:
        return None, None, None, None, None, None, None, "bad FAUD header"
    if len(body) % (2 * ch) != 0:
        return None, None, None, None, None, None, None, (
            f"truncated samples: {len(body)} bytes not a multiple of 2*{ch}"
        )
    n = len(body) // (2 * ch)
    if n == 0:
        return rate, ch, 0, 0.0, None, None, None, None
    x = np.frombuffer(body, dtype=">i2").astype("float64").reshape(n, ch)
    mono = x.mean(axis=1) / 32768.0
    rms = float(np.sqrt(np.mean(mono * mono)))
    peak = float(np.max(np.abs(mono)))
    signs = np.signbit(mono)
    zcr = float(np.count_nonzero(signs[1:] != signs[:-1]) / max(n - 1, 1))
    return rate, ch, n, n / rate, rms, peak, zcr, None


def decode_audio(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "content"
) -> DataFrame:
    """Decode audio blobs to rate/duration + signal stats (rms, peak,
    zero-crossing rate — the standard cheap audio-QA gates: silence,
    clipping, noise). Runs the deterministic FAUD test codec here;
    swapping in a real decoder changes ONE function
    (``_decode_audio_blob``)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_decode_audio_blob(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "sample_rate": pd.array([r[0] for r in rows], dtype="Int64"),
                    "channels": pd.array([r[1] for r in rows], dtype="Int64"),
                    "n_samples": pd.array([r[2] for r in rows], dtype="Int64"),
                    "duration_s": pd.array([r[3] for r in rows], dtype="Float64"),
                    "rms": pd.array([r[4] for r in rows], dtype="Float64"),
                    "peak": pd.array([r[5] for r in rows], dtype="Float64"),
                    "zero_cross_rate": pd.array(
                        [r[6] for r in rows], dtype="Float64"
                    ),
                    "decode_error": pd.Series([r[7] for r in rows], dtype="object"),
                }
            )

    return df.mapInPandas(batches, AUDIO_DECODE_SCHEMA)


def audio_segments(
    df: DataFrame,
    segment_s: float = 1.0,
    id_col: str = "doc_id",
    blob_col: str = "content",
) -> DataFrame:
    """Fixed-length segmentation: ONE audio blob row -> N FAUD segment
    rows of ``segment_s`` seconds each (the trailing remainder ships as
    a shorter final segment) — the audio sibling of ``sample_frames``:
    training pipelines chunk long recordings before feature
    extraction, and each segment re-encodes as a standalone decodable
    blob. Output: (doc_id, segment_idx, start_s, segment BINARY).
    Undecodable blobs contribute no segments (QA surfaces them via
    ``decode_audio``)."""
    if segment_s <= 0:
        raise ValueError(f"segment_s must be positive, got {segment_s}")
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("segment_idx", LongType()),
            StructField("start_s", DoubleType()),
            StructField("segment", BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, starts, blobs = [], [], [], []
            for did, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob) if blob is not None else b""
                if len(b) < 9 or b[:4] != FAUD_MAGIC:
                    continue
                rate = int.from_bytes(b[4:8], "big")
                ch = b[8]
                if rate <= 0 or ch <= 0:
                    continue
                body = b[9:]
                if len(body) % (2 * ch) != 0:
                    continue
                frame_bytes = 2 * ch
                n = len(body) // frame_bytes
                per_seg = max(int(segment_s * rate), 1)
                header = b[:9]
                for k, s in enumerate(range(0, n, per_seg)):
                    seg = body[s * frame_bytes : (s + per_seg) * frame_bytes]
                    ids.append(int(did))
                    idxs.append(k)
                    starts.append(s / rate)
                    blobs.append(header + seg)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "segment_idx": pd.array(idxs, dtype="int64"),
                    "start_s": pd.array(starts, dtype="float64"),
                    "segment": pd.Series(blobs, dtype="object"),
                }
            )

    return df.mapInPandas(batches, out_schema)


AUDIO_INT_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("peak_i16", LongType()),
        StructField("zero_crossings", LongType()),
        StructField("sum_sq", LongType()),
    ]
)


def attach_fake_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    n_samples_col: str = "n_samples",
    sample_rate: int = 16_000,
) -> DataFrame:
    """Synthesize a mono FAUD blob per row (``make_fake_audio`` of the
    row's id and sample count) via Arrow-batched mapInPandas — the
    encode half of the audio pipeline, so the corpus entry exercises
    bytes -> decode -> features end to end rather than starting from
    pre-decoded rows. Real data swaps this synthesizer for a parquet
    binary column; everything downstream is unchanged."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("content", BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "content": [
                        make_fake_audio(
                            int(d), int(n), sample_rate=sample_rate
                        )
                        for d, n in zip(pdf[id_col], pdf[n_samples_col])
                    ],
                }
            )

    return df.select(id_col, n_samples_col).mapInPandas(batches, out_schema)


def audio_exact_int_stats(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "content"
) -> DataFrame:
    """EXACT integer audio features from FAUD blobs — the
    parity-grade twin of :func:`decode_audio`'s float stats: peak as
    max |s16| (``peak_i16``), zero crossings as strict sign-bit
    changes of the mono mix (``v < 0`` flips, matching
    ``np.signbit(v/32768)`` for mono), and the raw energy ``sum_sq``
    = Σ v² as a BIGINT (rms² · n · 32768² exactly, no float
    summation anywhere). Exact integers are what make a cross-engine
    SQL oracle possible over binary media blobs; the float stats
    remain the human-facing decode path. Mono blobs only — a
    multi-channel mean is not integer-exact; callers mix down first.
    Raises nothing per-row: malformed blobs yield NULL stats columns
    (decode errors are data, not task failures)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "sample_rate", "channels", "n_samples",
                "peak_i16", "zero_crossings", "sum_sq",
            )}
            for d, blob in zip(pdf[id_col], pdf[blob_col]):
                out["doc_id"].append(int(d))
                b = bytes(blob) if blob is not None else b""
                ok = len(b) >= 9 and b[:4] == FAUD_MAGIC
                rate = int.from_bytes(b[4:8], "big") if ok else 0
                ch = b[8] if ok else 0
                body = b[9:] if ok else b""
                if (
                    not ok or rate <= 0 or ch != 1
                    or len(body) % 2 != 0
                ):
                    for k in ("sample_rate", "channels", "n_samples",
                              "peak_i16", "zero_crossings", "sum_sq"):
                        out[k].append(None)
                    continue
                v = np.frombuffer(body, dtype=">i2").astype("int64")
                n = len(v)
                out["sample_rate"].append(rate)
                out["channels"].append(1)
                out["n_samples"].append(n)
                out["peak_i16"].append(int(np.max(np.abs(v))) if n else None)
                out["zero_crossings"].append(
                    int(np.count_nonzero((v[1:] < 0) != (v[:-1] < 0)))
                    if n else None
                )
                out["sum_sq"].append(int(np.dot(v, v)) if n else None)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, AUDIO_INT_STATS_SCHEMA)
