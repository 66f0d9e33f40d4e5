"""Benchmark runner (driver contract): times the headline corpus
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is fully executed via the no-op sink (all partitions
computed, nothing collected to the driver) — measuring engine
throughput, not toPandas serialization.

Cross-round comparability: HEADLINE grows as operators land, so
``headline_corpus_wall_seconds`` is NOT a trend line (the r7 56-query
set vs the r8 66-query set measure different work). ``BENCH_CORE`` is
the FIXED 13-query subset (stable-core canaries + one representative
per major family) whose wall/mean seconds ARE comparable round to
round — do not edit that list; add new operators to HEADLINE only.

Measured note (round-9, VERDICT r8 item 5): tpch_q7's r8 "1.51x
normalized regression" was cold-start variance, not a plan change —
at sf0.1 the executed plan holds 5 BroadcastHashJoins / 0 SMJ / 0 NLJ
and warm runs take 0.16-0.21 s vs the 1.27 s single cold sample the
r8 bench recorded; sub-second queries are dominated by first-scan
codegen+footer costs, which min-of-2 sampling only partly removes.

Measured note (round-9 mid-round bench hygiene): the calibration
probe swung 4.8 -> 5.6 -> 11.0 s across three same-day runs on this
multi-tenant box. A mid-round sf0.1 sweep flagged four >1.25x
normalized "regressions" (join_revenue_by_nation, tpch_q2, tpch_q4,
ivf_pq_search_topk); re-measured with 3 warm runs each against a
same-session probe, ALL four are probe-relative FASTER than their r8
samples (e.g. join_revenue 0.123 vs 0.168 probe-units, ivf_pq 0.452
vs 0.559) — host noise, not plan changes. Streaming events/s moves
with the same tide; compare it across rounds only after dividing by
the probe.

Measured note (round-10, VERDICT r9 item 2): the five r9 >1.25x
normalized entries re-measured with the same method (same-session
probes 5.565/5.863 s, 4 runs each, warm best):
text_gopher_quality 1.047 s = 0.188 probe-units (r8: 0.816/4.833 =
0.169 -> 1.11x), frequent_part_pairs 1.813 = 0.324 (r8 0.271, 1.20x),
compaction_small_files_rollup 2.023 = 0.361 (r8 0.344, 1.05x),
bloom_semijoin_hot_customer_orders 1.715 = 0.306 warm-isolated but
1.163 raw inside a full headline run, i.e. at-or-below r8's 0.240
probe-units in the like-for-like setting (the isolated session pays
the first lineitem/orders scan the full run amortizes across 60+
queries), dedup_ppjoin_jaccard 2.571 = 0.459 isolated / 1.776 raw
in-run (r8 0.300; md5-bound, 3-sample min in the real bench). None
shows a plan change; the r9 samples were min-of-2/3 on a host whose
probe ran 6.488 s vs r8's 4.833 (1.34x slower), and today's full-run
raw numbers are all at-or-below the r8 raws. bloom_filter.py's
size-gated dispatch verified intact: the corpus entry's filter is
far below MAX_INLINE_WORDS, so it renders as the one-SQL-string
codegen predicate, not the Arrow path.

Measured note (round-11, VERDICT r10 items 3+4): the four r10 >1.35x
normalized entries (emb_near_dup_pairs 1.67x, dedup_minhash_lsh
1.47x, dedup_winnow_overlap 1.39x, graph_pagerank_suppliers 1.37x)
re-measured three ways. (1) git diff r9-end..HEAD over their
execution paths: BYTE-IDENTICAL (dedup.py gained only new functions;
the graph.py delta touches kcore, not pagerank) — no plan could have
changed. (2) Same-method warm re-measure of current code: probes
6.764/6.869, e.g. emb 0.396 pu — still elevated vs the r9 record
(0.216). (3) The decisive ABA: r11 code -> r9-end code (worktree) ->
r11 code, sequentially on a quiet box, 3 warm runs each. Result: r9
CODE lands BETWEEN the two r11 runs (winnow 0.419 -> r9 0.523 ->
0.538 pu; pagerank 0.610 -> 0.640 -> 0.689), the within-version swing
(winnow 2.23 s vs 3.33 s raw, 1.5x) exceeds any between-version
delta, and the PROBE ITSELF drifted 5.32 -> 6.19 s across the ~15 min
ABA. Conclusion: these four are md5/CPU-bound queries whose
sensitivity to co-tenant CPU pressure differs from the scan/join
probe's, so their probe-units carry ~±35% noise on this box; the r10
deltas are measurement, not regression. Read them across >=2 rounds
of agreement before acting.

Same-evidence note on bench_core (r9 25.406 s raw / r10 25.423 s raw
while the probe moved 6.488 -> 5.419): the fixed 13-query core is
dominated by per-query fixed costs (job submission, first-scan
codegen, shuffle setup) that do not scale down with the probe's
moment, so core/probe INFLATES whenever the probe catches a fast
window — the same artifact as the four queries above, in aggregate.
The JSON now carries ``bench_core_probe_units`` so both the raw wall
(stable: 25.4 both rounds) and the normalized view ship together;
trend on raw first, probe-units second.

Streaming probe (round-10, VERDICT r9 item 3): the batch probe runs
~40 min before the streaming section on a full bench, so dividing
streaming events/s by it conflated two different host moments. The
JSON now carries ``streaming_probe_seconds`` (min of a probe
immediately BEFORE and immediately AFTER the streaming section) and
``streaming_probe_ratio`` (streaming probe / batch probe): normalize
cross-round streaming deltas by the STREAMING probe, and read the
ratio as how much the host moved mid-run.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from activedatawarehouseprototype_spark.corpus import QUERIES  # noqa: E402
from activedatawarehouseprototype_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "rule_tumbling_avg",
    "rule_sliding_max",
    "rule_per_event_avg",
    "rule_count_tumbling",
    "rule_union_alerts",
    "rule_fanout_match_counts",
    "tpch_q1_pricing_summary",
    "tpch_q4_late_orders",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q14_promo_effect",
    "tpch_q18_large_volume_customers",
    "tpch_q2_min_cost_supplier",
    "tpch_q16_parts_supplier_relationship",
    "join_revenue_by_nation",
    "topk_customers_by_spend",
    "window_top3_orders_per_customer",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_minhash_components",
    "dedup_winnow_overlap",
    "dedup_repeated_spans",
    "emb_near_dup_pairs",
    "semantic_cluster_dedup",
    "lm_unigram_doc_scores",
    "fuzzy_part_name_pairs",
    "ann_topk_cosine",
    "ann_ivf_topk",
    "ivf_pq_search_topk",
    "cdc_enrich_pipeline_evals",
    "text_stats",
    "sample_split_stats",
    "pack_sequences_stats",
    "resample_ffill_daily_values",
    "timetravel_orders_rollup",
    # round-6 additions
    "graph_pagerank_suppliers",
    "retention_cohorts_monthly",
    "entropy_quality_scores",
    "interval_overlap_sessions",
    "skew_salted_join_topk",
    "rolling_zscore_anomalies",
    "snapshot_diff_documents",
    # round-7 registrations of the round-6 operator tier
    "bm25_topk_docs",
    "windowed_topk_events",
    "dedup_ppjoin_jaccard",
    "text_gopher_quality",
    "hll_mv_daily_distinct",
    "ewma_final_by_user",
    # new in round 7
    "drift_psi_event_values",
    "graph_triangle_counts",
    "temperature_mix_by_lang",
    "hll_set_algebra_event_types",
    # new in round 8
    "scd2_customer_priority_history",
    "bloom_semijoin_hot_customer_orders",
    "compaction_small_files_rollup",
    "cms_event_type_counts",
    "frequent_part_pairs",
    "cusum_user_value_shifts",
    "balanced_downsample_by_lang",
    "bm25_index_search_topk",
    "lag_features_user_values",
    "schema_evolution_orders_union",
    # new in round 9 (+ tpch_q5 so every BENCH_CORE query is timed)
    "tpch_q5_local_supplier_volume",
    "kmeans_lattice_clusters",
    "mad_outliers_event_values",
    "winsorized_value_sums",
    "fuzzy_blocked_part_pairs",
    "ols_trend_user_values",
    "pmi_collocations_top20",
    "profile_orders_columns",
    "cluster_safe_split_stats",
    "event_transition_matrix",
    "ab_ztest_event_conversion",
    "classifier_gate_stats",
    "cuped_arm_components",
    "kcore_copurchase_parts",
    "audio_exact_stats",
    # new in round 10
    "classifier_train_ridge_stats",
    "exact_substring_spans_hist",
    "ivf_rebuild_cell_stats",
    # new in round 11
    "cut_duplicate_spans_stats",
    "dedup_components_twostar",
    "corpus_pipeline_e2e_stats",
]

# FIXED cross-round subset — never edit (see module docstring). One
# representative per family: rules, TPC-H join/agg shapes, top-k,
# dedup (LSH + components), ANN (IVF + PQ), retrieval, graph, CDC/MV,
# plus the per-event streaming-twin shape.
# Reference point (first round with the core, for normalization):
# round 9 measured bench_core_wall_seconds=19.156 (mean 1.474/query)
# at calibration_probe_seconds=5.325 — normalize future rounds by the
# probe ratio before reading a trend.
BENCH_CORE = [
    "rule_tumbling_avg",
    "rule_per_event_avg",
    "tpch_q1_pricing_summary",
    "tpch_q5_local_supplier_volume",
    "tpch_q18_large_volume_customers",
    "topk_customers_by_spend",
    "dedup_minhash_lsh",
    "dedup_minhash_components",
    "ann_ivf_topk",
    "ivf_pq_search_topk",
    "bm25_topk_docs",
    "graph_pagerank_suppliers",
    "cdc_enrich_pipeline_evals",
]


def _extra_queries():
    """Headline entries whose bench shape differs from (or has no) a
    registry entry: full PCA fit+project, and the PER-ROW ewma output
    (the registry's ewma_final_by_user aggregates to per-key finals —
    keeping this one preserves cross-round comparability of the r6
    `ewma_user_values` timing). Same (spark, sf_dir) -> DataFrame
    contract and the same noop-sink timing as registry queries."""
    from activedatawarehouseprototype_spark.catalog import load
    from activedatawarehouseprototype_spark.operators.pca import (
        fit_pca,
        pca_project,
    )
    from activedatawarehouseprototype_spark.operators.timeseries import ewma

    def pca(spark, sf_dir):
        emb = load(spark, sf_dir, "embeddings")
        return pca_project(emb, fit_pca(emb, d=8))

    def ewma_q(spark, sf_dir):
        return ewma(
            load(spark, sf_dir, "events"), "user_id", "ts", "value",
            tie_col="event_id",
        )

    return {
        "pca_fit_project": pca,
        "ewma_user_values": ewma_q,
    }


def calibration_probe_seconds(spark) -> float:
    """Fixed CPU-bound probe for cross-round comparability (round-4
    VERDICT item 3: twice now, untouched-query drift tracked host
    speed, not regressions). Pure-Spark hash aggregate over a
    deterministic range — no repo code, no IO, constant work — so
    BENCH_r*.json deltas can be split into 'engine change' vs 'host
    speed': normalized_q = q_seconds * (probe_ref / probe_now). Raw
    numbers stay in the JSON untouched."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(500_000_000)
        .groupBy((F.col("id") % 1_000_000).alias("k"))
        .agg(F.sum("id").alias("s"), F.count(F.lit(1)).alias("n"))
        .agg(F.sum("s"), F.sum("n"))
        .collect()
    )
    return time.perf_counter() - t0


def _synthetic_events(spark, n_events: int):
    """ONE synthetic telemetry distribution for every streaming
    benchmark (5000 cars, 1k events/s, speeds 0-160) — diverging
    copies would silently make the W1/W2/50-rule numbers measure
    different data."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = int(dt.datetime(2024, 1, 1).timestamp())
    return spark.range(n_events).select(
        (F.col("id") % 5000).cast("int").alias("carId"),
        F.timestamp_seconds(F.lit(base) + F.col("id") / 1000.0).alias("ts"),
        (F.col("id") * 7 % 160).cast("double").alias("speed"),
    )


def streaming_events_per_sec(spark, n_events: int = 1_000_000) -> float:
    """Reference parity metric: sustained events/s through the rule
    pipeline (the reference simulates ≈13k events/s on one node —
    CarDataFromFiles.java:63-68)."""
    import datetime as dt
    import json as _json
    import tempfile

    from pyspark.sql import functions as F

    from activedatawarehouseprototype_spark.streaming.pipeline import ActivePipeline
    from activedatawarehouseprototype_spark.streaming.registry import RuleRegistry

    events = _synthetic_events(spark, n_events)
    reg = RuleRegistry()
    reg.apply_json(
        _json.dumps(
            {
                "queryId": 1,
                "queryState": "ACTIVE",
                "lastTime": -1,
                "windowMilliseconds": 10000,
                "frequencyMilliseconds": None,  # W2 tumbling
                "groupingKeyNames": ["carId"],
                "windowFilterRules": [
                    {"field": "speed", "operator": ">", "value": "20"}
                ],
                "aggregatorFunctionType": "AVG",
                "limitOperatorType": ">",
                "limit": 120,
                "aggregateFieldName": "speed",
            }
        )
    )
    import shutil

    work = tempfile.mkdtemp(prefix="adw-bench-")
    try:
        pipe = ActivePipeline(spark=spark, registry=reg, work_dir=work)
        halves = [
            events.filter(F.col("carId") % 2 == i).persist() for i in (0, 1)
        ]
        for h in halves:
            h.count()
        t0 = time.perf_counter()
        for i, h in enumerate(halves):
            pipe.process_batch(h, i)
        elapsed = time.perf_counter() - t0
        for h in halves:
            h.unpersist()
        return n_events / elapsed
    finally:
        shutil.rmtree(work, ignore_errors=True)


def streaming_w1_events_per_sec(spark, n_events: int = 2_000_000) -> float:
    """Per-event-slide (W1) streaming throughput: the reference's
    signature mode, here via applyInPandasWithState with the vectorized
    numpy core — state-store reads/writes and Arrow transfer included.

    n_events is sized so stream START-UP (JVM query init, state-store
    open, source listing — ~3s fixed) is amortized and the number
    reflects steady-state per-event cost; at 500k events the fixed
    part dominated and the metric tracked host speed, not the
    operator."""
    import datetime as dt
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from activedatawarehouseprototype_spark.rules.model import Rule
    from activedatawarehouseprototype_spark.streaming.per_event_window import (
        w1_stream,
    )

    work = tempfile.mkdtemp(prefix="adw-w1bench-")
    events = _synthetic_events(spark, n_events)
    events.write.mode("overwrite").parquet(f"{work}/events")
    rule = Rule.from_dict(
        {
            "queryId": 1,
            "queryState": "ACTIVE",
            "windowMilliseconds": 10_000,
            "frequencyMilliseconds": 0,  # W1 per-event
            "groupingKeyNames": ["carId"],
            "windowFilterRules": [],
            "aggregatorFunctionType": "AVG",
            "limitOperatorType": ">",
            "limit": 120,
            "aggregateFieldName": "speed",
        }
    )
    stream = spark.readStream.schema(events.schema).parquet(f"{work}/events")
    t0 = time.perf_counter()
    q = (
        w1_stream(stream, rule)
        .writeStream.format("noop")
        .option("checkpointLocation", f"{work}/chk")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    elapsed = time.perf_counter() - t0
    shutil.rmtree(work, ignore_errors=True)
    return n_events / elapsed


def streaming_50rule_events_per_sec(spark, n_events: int = 800_000) -> float:
    """Rule-set scalability metric: sustained events/s with FIFTY
    standing W2 rules active at once. The grouped fan-out path
    (streaming/group_eval.py) evaluates all of them in ONE buffer scan
    + one shared shuffle — per-rule-plan unions would re-scan the
    buffer 50 times per batch. n_events amortizes the one-off plan
    compile/codegen for the 50-shape grouped evaluator (~2s) the same
    way the W1 metric amortizes stream start-up."""
    import datetime as dt
    import json as _json
    import tempfile

    from pyspark.sql import functions as F

    from activedatawarehouseprototype_spark.streaming.pipeline import ActivePipeline
    from activedatawarehouseprototype_spark.streaming.registry import RuleRegistry

    events = _synthetic_events(spark, n_events).persist()
    events.count()
    reg = RuleRegistry()
    for i in range(50):
        reg.apply_json(
            _json.dumps(
                {
                    "queryId": 100 + i,
                    "queryState": "ACTIVE",
                    "lastTime": -1,
                    "windowMilliseconds": 10000,
                    "frequencyMilliseconds": None,
                    "groupingKeyNames": ["carId"],
                    "windowFilterRules": [
                        {"field": "speed", "operator": ">", "value": str(i * 3)}
                    ],
                    "aggregatorFunctionType": "AVG",
                    "limitOperatorType": ">",
                    "limit": 120,
                    "aggregateFieldName": "speed",
                }
            )
        )
    import shutil

    work = tempfile.mkdtemp(prefix="adw-bench50-")
    try:
        pipe = ActivePipeline(spark=spark, registry=reg, work_dir=work)
        t0 = time.perf_counter()
        pipe.process_batch(events, 0)
        elapsed = time.perf_counter() - t0
        events.unpersist()
        return n_events / elapsed
    finally:
        shutil.rmtree(work, ignore_errors=True)


def ingest_docs_per_sec(spark, n_docs: int = 30_000) -> float:
    """Dedup-at-the-door ingestion throughput: docs/s through ONE
    DedupIngest batch (index lookup + intra-batch LSH + store/index
    append) against a pre-built index of the sf documents corpus.
    Batch composition: one third near-dups of indexed docs (dropped),
    two thirds new (admitted) — the realistic crawl-snapshot mix."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from activedatawarehouseprototype_spark.catalog import load
    from activedatawarehouseprototype_spark.operators import dedup_index as DI
    from activedatawarehouseprototype_spark.streaming.ingest import DedupIngest

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="adw-bench-ingest-")
    try:
        idx = f"{work}/idx"
        DI.dedup_index_build(docs, idx, n=5, k=12, bands=3, max_doc_freq=64)
        third = n_docs // 3
        dups = (
            docs.limit(third)
            .select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz9")).alias("text"),
            )
        )
        fresh = (
            spark.range(n_docs - third)
            .select(
                (F.col("id") + 20_000_000).alias("doc_id"),
                F.concat_ws(
                    " ",
                    *[
                        F.concat(F.lit(f"w{j}x"), (F.col("id") * (j + 7)) % 9973)
                        for j in range(30)
                    ],
                ).alias("text"),
            )
        )
        batch = dups.unionByName(fresh).persist()
        batch.count()
        ing = DedupIngest(spark, idx, f"{work}/store")
        t0 = time.perf_counter()
        ing.process_batch(batch, 0)
        elapsed = time.perf_counter() - t0
        batch.unpersist()
        return n_docs / elapsed
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="adw-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up JVM/codegen + the parquet reader stack outside the timed
    # region (the first parquet scan pays Hadoop FS + footer-reader init).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from activedatawarehouseprototype_spark.catalog import load

    load(spark, sf_dir, "region").count()
    load(spark, sf_dir, "events").limit(1).count()

    # min of two runs per query: the box runs other tenants, so a
    # single sample conflates engine cost with scheduler noise.
    timings: dict[str, float] = {}
    skipped = [n for n in HEADLINE if n not in QUERIES]
    if skipped:
        # a silently shrinking headline reads as a speedup; say so
        print(f"WARNING: headline queries missing from the registry: "
              f"{skipped}", file=sys.stderr)
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        # the md5-bound dedup queries are the most sensitive to
        # co-tenant CPU noise — give them a third sample.
        n_runs = 3 if name.startswith("dedup_") else 2
        best = None
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    for name, fn in _extra_queries().items():
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # best of two, mirroring the corpus timings: the first run pays JVM
    # codegen + shuffle-service warmup, which is noise, not engine cost.
    probe = min(calibration_probe_seconds(spark) for _ in range(2))

    # same-moment probes bracket the streaming section (see module
    # docstring, round-10 note): the streaming numbers normalize by
    # THIS probe, not the batch one taken ~40 min earlier
    stream_probe_before = calibration_probe_seconds(spark)
    eps = max(streaming_events_per_sec(spark) for _ in range(2))
    eps50 = max(streaming_50rule_events_per_sec(spark) for _ in range(2))
    eps_w1 = max(streaming_w1_events_per_sec(spark) for _ in range(2))
    ingest_dps = max(ingest_docs_per_sec(spark) for _ in range(2))
    stream_probe = min(
        stream_probe_before, calibration_probe_seconds(spark)
    )

    total = round(sum(timings.values()), 3)
    core = [n for n in BENCH_CORE if n in timings]
    core_total = round(sum(timings[n] for n in core), 3)
    payload = {
        "metric": "headline_corpus_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "headline_n_queries": len(timings),
        "headline_mean_seconds": round(total / max(len(timings), 1), 3),
        "bench_core_wall_seconds": core_total,
        "bench_core_mean_seconds": round(core_total / max(len(core), 1), 3),
        "bench_core_n_queries": len(core),
        "calibration_probe_seconds": round(probe, 3),
        "streaming_probe_seconds": round(stream_probe, 3),
        "streaming_probe_ratio": round(stream_probe / probe, 3),
        "streaming_events_per_sec": round(eps),
        "streaming_50rule_events_per_sec": round(eps50),
        "streaming_w1_events_per_sec": round(eps_w1),
        "ingest_docs_per_sec": round(ingest_dps),
        # probe-normalized twins (round-11, VERDICT r10 item 4): ingest
        # runs INSIDE the streaming bracket, so its cross-round trend
        # line is docs per STREAMING-probe-unit, not docs/s;
        # bench_core's is core wall over the batch probe. Compare THESE
        # across rounds; the raw seconds/rates above describe only this
        # host's moment.
        "ingest_docs_per_probe": round(ingest_dps * stream_probe),
        # round-12 (VERDICT r11 item 4): the three streaming rates get
        # the same treatment — events per STREAMING-probe-unit. The
        # r11 W2 drop (374k -> 176k raw at probe 6.2) recovered to
        # 281k at probe 5.0 on byte-identical code at the r12 round
        # start, confirming the raw rate tracks the host moment; these
        # twins make that visible inside one JSON line.
        "streaming_events_per_probe": round(eps * stream_probe),
        "streaming_50rule_events_per_probe": round(eps50 * stream_probe),
        "streaming_w1_events_per_probe": round(eps_w1 * stream_probe),
        "bench_core_probe_units": round(core_total / probe, 3),
    }
    # The driver keeps only the LAST ~2000 bytes of output and parses
    # the JSON line out of that tail — round 7's line outgrew the
    # buffer (57 per-query keys) and the round's bench parse came back
    # null. Full detail always goes to stderr; the stdout line keeps
    # the slowest queries (the diagnostic ones) and accounts for the
    # rest explicitly (count + summed seconds), so nothing is silently
    # dropped and the headline total stays exact.
    print(json.dumps(payload), file=sys.stderr)
    budget = 1600
    line = json.dumps(payload, separators=(",", ":"))
    if len(line) > budget:
        by_cost = sorted(timings, key=timings.get, reverse=True)
        shown: dict[str, float] = {}
        for name in by_cost:
            trial = dict(shown, **{name: timings[name]})
            trial_payload = dict(
                payload,
                queries=trial,
                queries_omitted=len(timings) - len(trial),
                omitted_queries_total=round(
                    total - sum(trial.values()), 3
                ),
            )
            if len(json.dumps(trial_payload, separators=(",", ":"))) > budget:
                break
            shown = trial
        payload["queries"] = shown
        payload["queries_omitted"] = len(timings) - len(shown)
        payload["omitted_queries_total"] = round(
            total - sum(shown.values()), 3
        )
        line = json.dumps(payload, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
