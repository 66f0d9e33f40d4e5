"""Distributed BPE vs a pure-Python reference implementation of the
classic algorithm (count adjacent pairs weighted by word frequency,
merge the argmax with (count desc, lexicographic) tie-break,
left-to-right non-overlapping application)."""

from __future__ import annotations

from collections import Counter

import pytest

from activedatawarehouseprototype_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
)


def _ref_train(texts, num_merges, min_pair_count=2):
    words = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: list(w) for w in words}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, cnt in words.items():
            sym = vocab[w]
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w in vocab:
            sym, out, i = vocab[w], [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            vocab[w] = out
    return merges


def _ref_encode(text, merges):
    toks = []
    for w in text.split(" "):
        if not w:
            continue
        sym = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        toks.extend(sym)
    return toks


CORPUS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "low newer wide lowest",
]


def _docs(spark, texts=CORPUS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


def test_merges_match_reference(spark):
    got = bpe_train(_docs(spark), "text", num_merges=12, min_pair_count=2)
    want = _ref_train(CORPUS, 12, 2)
    assert got == want
    assert len(got) > 3  # the corpus genuinely trains several merges


def test_overlapping_runs_merge_left_to_right(spark):
    # 'aaaa' with merge (a,a): non-overlapping left-to-right gives
    # [aa, aa], never [a, aa, a]
    docs = _docs(spark, ["aaaa aaaa aaaa"])
    merges = bpe_train(docs, "text", num_merges=1, min_pair_count=2)
    assert merges == [("a", "a")]
    enc = bpe_encode(docs, "doc_id", "text", merges).collect()[0]
    assert enc["tokens"] == ["aa", "aa"] * 3
    assert enc["n_tokens"] == 6


def test_encode_matches_reference(spark):
    merges = bpe_train(_docs(spark), "text", num_merges=8)
    out = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(
            _docs(spark), "doc_id", "text", merges
        ).collect()
    }
    for i, t in enumerate(CORPUS):
        assert out[i] == _ref_encode(t, merges), f"doc {i}"


def test_early_stop_and_validation(spark):
    docs = _docs(spark, ["ab cd ef"])  # no pair reaches count 2
    assert bpe_train(docs, "text", num_merges=5, min_pair_count=2) == []
    with pytest.raises(ValueError):
        bpe_train(docs, "text", num_merges=-1)
    with pytest.raises(ValueError):
        bpe_train(docs, "text", num_merges=1, min_pair_count=0)
