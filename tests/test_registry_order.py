"""Guards the driver-window composition of the query registry.

The CORRECTNESS driver runs exactly the first 50 entries of
``__spark_entry__.queries()`` (round-2 judge-verified).  Rounds 3-5
rotated every never-checked entry through that window; round 6
front-loaded the then-oldest (r3) evidence; rounds 7-9 each
front-loaded the previous round's documented deferral, debuted that
round's new operators in-window, and deferred the overflow with an
explicit list.  Round 10 front-loads the 40 r6-era deferrals (the
oldest evidence in the registry), debuts its 3 new operators, and
takes 4 of the 47-entry r7 cohort, deferring the other 43 to round 11
(at 186 entries / 50 slots the steady-state refresh period is 3.7
rounds; the invariant is "refresh strictly oldest-first, debuts always
in-window, worst-case age = ceil(N/50) + 1 rounds, documented per
round").  These tests make sure a refactor can't silently undo the
rotation or drop a query, and — after three rounds of prose counts
drifting from the real lists — that every count CLAIMED in the
rotation comments matches the list it describes
(test_rotation_prose_counts).
"""

from __future__ import annotations

import json
import os
import re

from activedatawarehouseprototype_spark.corpus import (
    _DRIVER_ROTATION,
    _STABLE_CORE,
    ORACLES,
    QUERIES,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_CAP = 50

_NEW_IN_R10 = {
    "classifier_train_ridge_stats",
    "exact_substring_spans_hist",
    "ivf_rebuild_cell_stats",
}

# The 4 r7-cohort entries refreshed in the round-10 window
# (family-diverse: text quality gate, ppjoin dedup, recursive-CTE SQL
# front door, graph triangle counting).
_R7_REFRESH = {
    "text_gopher_quality",
    "dedup_ppjoin_jaccard",
    "sql_recursive_reachability",
    "graph_triangle_counts",
}

# The 40 r6-green entries the round-9 rotation deferred to round 10 —
# round 10 front-loads EXACTLY this list (their r6 evidence is the
# oldest in the registry).
_DEFERRED_TO_R10 = {
    "ann_ivf_batch_topk",
    "ann_lsh_batch_multiprobe_topk",
    "ann_lsh_bucket_topk",
    "array_embedding_stats",
    "bool_aggs_per_segment",
    "entropy_quality_scores",
    "funnel_match_recognize_strict",
    "grouping_sets_orders",
    "histogram_event_values",
    "hourly_activity_profile",
    "interval_overlap_sessions",
    "ntile_equidepth_histogram",
    "null_semantics_aggs",
    "pivot_status_by_priority",
    "regexp_part_type_tokens",
    "reservoir_sample_fixed_k",
    "retention_cohorts_monthly",
    "rolling_zscore_anomalies",
    "scalar_string_fns",
    "skew_salted_join_topk",
    "snapshot_diff_documents",
    "source_quota_cap_stats",
    "text_repetition",
    "udf_sql_registered_brand_code",
    "udtf_token_explode",
    "weighted_sample_by_quality",
    "window_running_order_totals",
    "percentile_order_prices",
    "stats_price_quantity",
    "tpch_q6_revenue_delta",
    "text_top_bigrams",
    "udaf_weighted_avg_price",
    "pivot_native_status_by_priority",
    "tpch_q3_shipping_priority",
    "rule_passthrough",
    "ann_topk_cosine",
    "dedup_exact_text",
    "window_top3_orders_per_customer",
    "graph_pagerank_suppliers",
    "multimodal_byte_stats",
}

# The 43 r7-green entries the round-10 rotation defers to round 11:
# the window holds the 40 r6 deferrals + 3 debuts + 4 r7 refreshes +
# 3 stable core, leaving no further slots for the 47-entry r7 cohort.
# Their evidence reaches age 4 in round 11 — the round-11 editor
# front-loads EXACTLY this list first. None changed since its r7
# hash-match, and the full-corpus pytest mirror
# (tests/test_corpus_oracle.py) re-checks each every round.
_DEFERRED_TO_R11 = {
    "bm25_topk_docs",
    "chunk_documents_tokens",
    "decontaminate_ngram_overlap",
    "dedup_fingerprint",
    "dedup_index_incremental",
    "dedup_ngram_jaccard",
    "dedup_simhash16",
    "dedup_winnow_overlap",
    "dirty_date_filter",
    "drift_psi_event_values",
    "emb_blocked_cosine_hist",
    "emb_near_dup_pairs",
    "embedding_covariance_entries",
    "ewma_final_by_user",
    "filter_between_in_dates",
    "fuzzy_part_name_pairs",
    "geo_path_cells",
    "hll_mv_daily_distinct",
    "hll_set_algebra_event_types",
    "join_anti_customers_without_orders",
    "join_revenue_by_nation",
    "lm_unigram_doc_scores",
    "mv_incremental_merge_algebra",
    "pack_sequences_stats",
    "quality_percentile_gate",
    "rule_same_ts_dedup_quirk",
    "rule_union_alerts",
    "sample_split_stats",
    "semantic_cluster_dedup",
    "shard_manifest",
    "sketch_approx_distinct_and_quantiles",
    "skipping_index_pruned_scan",
    "sql_subquery_above_avg_orders",
    "stratified_sample_by_lang",
    "stream_interval_join_clicks",
    "stringagg_statuses_per_flag",
    "temperature_mix_by_lang",
    "text_lang_id",
    "text_stats",
    "tfidf_top_terms_per_doc",
    "token_budget_mix_stats",
    "windowed_distinct_users",
    "windowed_topk_events",
}


def _correctness(round_tag: str) -> set[str]:
    with open(os.path.join(_REPO, f"CORRECTNESS_{round_tag}.json")) as f:
        return set(json.load(f))


def test_rotation_all_inside_driver_window():
    first = list(QUERIES)[:DRIVER_CAP]
    missing = [n for n in _DRIVER_ROTATION if n not in first]
    assert not missing, f"rotated queries fell outside the driver window: {missing}"


def test_stable_core_inside_driver_window():
    first = list(QUERIES)[:DRIVER_CAP]
    missing = [n for n in _STABLE_CORE if n not in first]
    assert not missing, f"stable-core canaries outside the driver window: {missing}"


def test_r9_deferral_promise_kept():
    """Round 9 promised the 40 deferred r6 entries would be
    FRONT-LOADED in round 10 — they must all sit inside this round's
    window, and FIRST (before any other rotated entry), since their
    evidence is the oldest in the registry."""
    first = set(list(QUERIES)[:DRIVER_CAP])
    missing = [n for n in _DEFERRED_TO_R10 if n not in first]
    assert not missing, f"r9-deferred entries not front-loaded: {missing}"
    assert set(_DRIVER_ROTATION[: len(_DEFERRED_TO_R10)]) == _DEFERRED_TO_R10


def test_rotation_targets_were_stale_after_r9():
    """The round-10 rotation should only name queries that did NOT get
    a green round-9 driver row: the r6 deferrals, the round-10 debuts
    (no row anywhere by construction), and r7-era refreshes."""
    r9 = _correctness("r09")
    overlap = [n for n in _DRIVER_ROTATION if n in r9]
    assert not overlap, f"already driver-checked (green) in r9: {sorted(overlap)}"


def test_never_driver_checked_entries_all_in_window():
    """Every entry that has NEVER had a driver row across r1-r9 (the
    round-10 debuts) must sit inside this round's window — nothing
    ships without a driver row in its debut window."""
    checked = set()
    for r in ("r01", "r02", "r03", "r04", "r05", "r06", "r07", "r08", "r09"):
        checked |= _correctness(r)
    first = set(list(QUERIES)[:DRIVER_CAP])
    never = [n for n in QUERIES if n not in checked]
    assert set(never) == _NEW_IN_R10  # the debuts, exactly
    outside = [n for n in never if n not in first]
    assert not outside, (
        f"never-driver-checked entries left outside the window: {outside}"
    )


def test_whole_registry_evidence_at_most_three_rounds_old():
    """Union check: every registry entry either sits in this round's
    window (earning an r10 row) or has an r9/r8 driver row — EXCEPT
    the 43 explicitly-deferred r7 entries (the window cannot hold the
    40 r6 deferrals + 3 debuts + the 47-entry r7 cohort; the deferral
    is documented and round 11 must front-load them)."""
    r9 = _correctness("r09")
    r8 = _correctness("r08")
    first = set(list(QUERIES)[:DRIVER_CAP])
    stale = [n for n in QUERIES if n not in r9 and n not in r8 and n not in first]
    unexplained = [n for n in stale if n not in _DEFERRED_TO_R11]
    assert not unexplained, (
        "entries with r7-or-older driver evidence left outside the "
        f"window and not in the documented r11 deferral: {unexplained}"
    )
    # the deferral list must not silently grow entries it doesn't
    # need: everything in it is genuinely outside the window
    assert set(stale) == _DEFERRED_TO_R11 - first


def test_window_composition_exact():
    """The 50-slot window is exactly the documented composition:
    40 r6 deferrals + 3 debuts + 4 r7 refreshes + 3 stable core."""
    first = set(list(QUERIES)[:DRIVER_CAP])
    assert first == (
        _DEFERRED_TO_R10 | _NEW_IN_R10 | _R7_REFRESH | set(_STABLE_CORE)
    )
    assert len(_R7_REFRESH) == 4
    # the refreshes really are r7-era: green in r7, untouched since
    r7 = _correctness("r07")
    r8, r9 = _correctness("r08"), _correctness("r09")
    assert _R7_REFRESH <= r7 and not (_R7_REFRESH & (r8 | r9))
    # and the two deferral ledgers partition the r7 cohort exactly
    assert _DEFERRED_TO_R11 | _R7_REFRESH == (r7 - r8 - r9) - set(_STABLE_CORE)
    assert not (_DEFERRED_TO_R11 & _R7_REFRESH)


def test_rotation_prose_counts():
    """Mechanical guard for rotation PROSE (round-9 VERDICT item 5 —
    third occurrence of a drifted count): every "<N> ... deferr* ...
    round <R>" claim in corpus/__init__.py must match the actual
    test-side list for that round. Rotating editors update _KNOWN when
    they add a round; a free-typed count that disagrees fails here."""
    known = {9: 23, 10: len(_DEFERRED_TO_R10), 11: len(_DEFERRED_TO_R11)}
    src_path = os.path.join(
        _REPO, "activedatawarehouseprototype_spark", "corpus", "__init__.py"
    )
    with open(src_path) as f:
        src = f.read()
    claims = re.findall(
        r"(\d+)\s+(?:\w+[ -]+){0,3}?deferr\w*\s+to\s+round\s*\n?\s*#?\s*(\d+)",
        src,
    )
    assert claims, "expected at least one deferral claim in the rotation prose"
    for n, rnd in claims:
        rnd = int(rnd)
        assert rnd in known, f"deferral claim for unpinned round {rnd}"
        assert int(n) == known[rnd], (
            f"rotation prose claims {n} deferred to round {rnd}, but the "
            f"test-side list has {known[rnd]} — fix the comment or the list"
        )


def test_no_duplicates_and_oracles_subset():
    names = list(QUERIES)
    assert len(names) == len(set(names))
    assert set(ORACLES) <= set(QUERIES)
    # every key in both dicts iterates in the same relative order
    q_order = [n for n in names if n in ORACLES]
    assert q_order == list(ORACLES)


def test_entrypoint_exposes_rotated_order():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert list(mod.queries())[:DRIVER_CAP] == list(QUERIES)[:DRIVER_CAP]
