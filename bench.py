"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries execute to a noop sink (full pipeline runs, nothing collected
to the driver) after a warm-up pass, so timings measure plan execution,
not JVM/session startup or result transfer.

HEADLINE selection rule (VERDICT r3 item 6): a query is headline iff it
is (a) a reference-surface pipeline (windowed_avg, ctr, stream-stream
join shapes), (b) a TPC-H representative exercising a distinct join/agg
topology, or (c) the most expensive registered member of an extension
family (dedup, ANN, text, graph, curation, stats, ...) — i.e. the set
is chosen to cover every operator FAMILY while staying small enough
that the driver's per-round wall clock stays ~2 min at sf0.1. Cheap
family siblings (e.g. the dozens of scalar-function or window-variant
queries) are deliberately not headline: they share plan shapes with a
headline member and are still correctness-gated every round by the
full-registry oracle artifact. `--full` benches EVERY registered query
(used to produce the committed BENCH_LOCAL_FULL artifact per round);
`tests/test_bench_contract.py` pins headline ⊆ registry and the rule's
family coverage.

Regression gate (VERDICT r3 item 3): `--gate PREV.json` compares the
fresh per-query map against a committed previous round's map and fails
(exit 1) when a shared query slows >GATE_PER_QUERY x (and >GATE_NOISE_S
absolute — sub-second timings jitter) or the shared-set total slows
>GATE_TOTAL x. The round loop runs it after the timed pass and commits
the report as BENCH_GATE_r{N}.json.

Variance discipline: treat a violation as real only if it REPRODUCES —
rerun once on an idle box before investigating (observed in round 4: a
run at the tail of ~2 h of back-to-back Spark jobs showed two 1.5x
violations, total_ratio 1.099; the immediate idle-box rerun was
violation-free at total_ratio 1.006 with both queries back at their
round-3 times — page-cache/JIT noise, not regression).

Machine-readable load evidence (VERDICT r9 item 5 / r10 item 3):
EVERY run — gated, headline, or --full — captures /proc/loadavg + the
competing-process list (>=50% instantaneous CPU outside this process
tree) BEFORE the bench starts and again after the timed pass, into
the committed artifact's `load_evidence` block. The machine ambient
rule (`is_ambient_loaded`) fires when the PRE snapshot's load1 OR
load5 exceeds AMBIENT_LOAD1 (the load5 clause catches the round-4/
round-10 "tail of back-to-back jobs" case where load1 has already
decayed), or when a competing process appears in ANY snapshot. A
VIOLATED gate on an ambient box — or an ambient-loaded headline/full
run — auto-reruns the timed pass ONCE (shared stages still cached,
same session) and the artifact records both attempts. The recorded
`ambient_loaded` field reflects the FIRST attempt's snapshots; when
an auto-rerun fired, `rerun_ambient_loaded` separately adjudicates
the rerun's own snapshots (ADVICE r10).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from streams_prototyping_spark import registry
from streams_prototyping_spark.session import get_spark

# Headline set: one representative per operator family (reference
# pipelines, relational, analytic, windows, dedup, similarity, text,
# multimodal python path).
HEADLINE = [
    "windowed_avg",
    "ctr_per_ad",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q8_market_share",
    "q13_customer_distribution",
    "q21_suppliers_kept_waiting",
    "join_asof",
    "join_asof_tolerance",
    "ksql_ctr",
    "stream_stream_join_bucketed",
    "join_broadcast_chain",
    "join_left_outer",
    "join_theta_residual",
    "sort_limit_topk",
    "window_topn_per_group",
    "window_running_sum",
    "ewma_per_user",
    "sequence_packing",
    "user_value_trend",
    "interpolate_masked_days",
    "rolling_median_daily",
    "epoch_shuffle_order",
    "dataset_interleave",
    "copurchase_lift",
    "priority_transition_matrix",
    "events_session_window",
    "events_hopping_window",
    "explode_wordcount",
    "events_multi_rollup",
    "dedup_exact",
    "minhash_lsh_pairs",
    "dedup_clusters",
    "dedup_canonical",
    "span_dedup",
    "dup_substring_spans",
    "semantic_dedup",
    "ngram_containment_pairs",
    "winnowing_fingerprint",
    "repetition_stats",
    "text_normalize",
    "simhash_fingerprint",
    "cosine_topk",
    "ann_lsh_topk",
    "ann_lsh_topk_multiprobe",
    "ann_ivf_topk",
    "ann_ivf_topk_nprobe",
    "ann_recall_report",
    "token_stats",
    "quality_score",
    "gopher_quality_filter",
    "boilerplate_phrases",
    "unigram_logprob",
    "collocation_pmi",
    "tfidf_cosine_pairs",
    "bm25_topk",
    "token_entropy",
    "bigram_lm_nll",
    "count_min_heavy_hitters",
    "random_projection_embed",
    "hard_negative_mining",
    "nearest_centroid_confusion",
    "kmeans_lloyd",
    "pq_encode",
    "pq_adc_topk",
    "ivf_pq_topk",
    "decontamination_overlap",
    "domain_mixture_weights",
    "curation_pipeline_select",
    "source_quality_report",
    "nll_decile_stats",
    "value_outliers_mad",
    "collapse_repeats",
    "lsh_bucket_stats",
    "numeric_profile",
    "referential_integrity_audit",
    "bloom_filter_audit",
    "simhash_near_pairs",
    "regex_string_functions",
    "weighted_sample_es",
    "avro_roundtrip",
    "multimodal_resize",
    "doc_chunking",
    "dataset_split",
    "multimodal_decode",
    # round 3: lakehouse maintenance, graph, time series, curation ext
    "scd2_user_tier",
    "cdc_apply_changelog",
    "zorder_cell_stats",
    "sliding_distinct_users",
    "cc_star_contraction",
    "pagerank_parts",
    "triangle_count",
    "holt_smoothing_daily",
    "seasonal_residual_anomalies",
    "rolling_corr_daily",
    "blocklist_filter",
    "bpe_pair_counts",
    "knn_label_eval",
    "minhash_estimate_error",
    "bfs_reachability",
    "weak_supervision_vote",
    "stratified_kfold_assign",
    "lang_confusion_matrix",
    # round 4: statistical audits, sketches, trend tests, distribution stats
    "hll_distinct_audit",
    "roc_auc_value_purchase",
    "calibration_bins",
    "changepoint_daily_revenue",
    "benford_first_digit",
    "equidepth_value_histogram",
    "aa_split_audit",
    "mann_kendall_trend",
    "theil_sen_slope",
    "kl_divergence_sources",
    "vocab_coverage_curve",
    # round 5: hypothesis tests, feature eng, retrieval eval, graph ML,
    # time-series diagnostics
    "welch_ttest_value",
    "ks_test_two_sample",
    "spearman_corr_value_hour",
    "kmv_set_cardinality",
    "poisson_bootstrap_ci",
    "target_encoding_loo",
    "psi_drift_report",
    "feature_hash_onehot",
    "importance_downsample",
    "ndcg_at_k",
    "rrf_fusion_topk",
    "jaccard_link_prediction",
    "k_core_decomposition",
    "degree_distribution",
    "acf_daily_revenue",
    "forecast_backtest_snaive",
    "event_type_markov",
    # round 3b: linear algebra, salting demo, BPE loop
    "embedding_covariance",
    "pca_power_iteration",
    "ols_value_normal_eq",
    "salted_skew_join",
    "bpe_learn_merges",
    "bpe_tokenize_stats",
    "label_prop_communities",
    "mahalanobis_outliers",
    "histogram_quantile_audit",
    "dp_noise_audit",
    "point_in_range_join",
    "bloom_prefilter_join",
    "naive_bayes_confusion",
    "markov_attribution_removal",
    "shapley_attribution",
    "cuped_variance_reduction",
    "near_dup_source_matrix",
    "experiment_readout_cuped",
    "dedup_savings_report",
    "kaplan_meier_survival",
    "log_odds_word_shift",
    # round 5b: scalar quantization, positional retrieval, diversified
    # rerank, snapshot reconciliation
    "sq8_adc_topk",
    "phrase_search_positional",
    "mmr_rerank",
    "table_diff_audit",
    # round 5c: probabilistic record linkage (blocked-pair scoring),
    # greedy one-to-one matching (the records module's expensive
    # member: iterative checkpointed rounds), margin-based mining
    "fs_linkage_weights",
    "greedy_match_assign",
    "margin_knn_mining",
    # round 8 (VERDICT r7 item 4): full-registry audit against the
    # family-most-expensive rule at the committed BENCH_LOCAL_FULL
    # timings — every module's most expensive member joins HEADLINE
    # (12 adds), plus cross_doc_ngram_novelty (top-5 overall, module
    # already covered by tfidf_cosine_pairs but too expensive to stay
    # invisible to the per-query gate). The rule is now pinned by
    # tests/test_bench_contract.py::test_headline_has_each_modules_most_expensive.
    "cross_doc_ngram_novelty",
    "community_modularity",
    "multimodal_audio_real",
    "token_budget_select",
    "embedding_near_dup_pairs",
    "q18_large_volume_customers",
    "cube_agg",
    "wilson_ci_ctr",
    "window_value_functions",
    "approx_distinct_users",
    "pps_horvitz_thompson",
    "recursive_month_spine",
    # round 8b: the recall audit is the similarity module's most
    # expensive member (bounded-truth side still costs two pair joins)
    "near_dup_recall_audit",
    # round 9: the banded high-recall near-dup module (VERDICT r8 item
    # 1) — both members join headline: the detector is the module's
    # production operator, the audit its most expensive member (it
    # embeds the detector plus the exact-truth pass)
    "embedding_near_dup_pairs_banded",
    "near_dup_banded_recall_audit",
]


# --- lossless round-over-round stdout contract (VERDICT r11 item 2) --
# The driver tail-parses the LAST 2000 chars of stdout (measured:
# bench_history/BENCH_r02.json captured exactly 2000 chars and parsed
# null when round 2's line outgrew it), so the full 176-query map
# (~5.5 KB serialized) CANNOT ride the stdout line without breaking
# the driver's parse — the exact round-2 failure. What the driver's
# comparison actually needs is that no query it saw last round
# disappears this round (4 phantom "dropped_from_bench" in PERF_r11
# came from the slowest-20 window shifting). So the stdout line now
# carries the union of (a) every query in the PREVIOUS driver
# artifact's map — these may never be dropped — and (b) as many of the
# current slowest as fit a LINE_BUDGET below the driver's buffer. The
# full map still goes to BENCH_LOCAL_LATEST.json, committed.
PREV_REPORTED = [
    # BENCH_r11.json parsed.queries — the driver's r12 comparison base
    "embedding_near_dup_pairs_banded", "simhash_near_pairs",
    "near_dup_banded_recall_audit", "bm25_topk", "tfidf_cosine_pairs",
    "bloom_prefilter_join", "poisson_bootstrap_ci", "knn_label_eval",
    "community_modularity", "naive_bayes_confusion", "semantic_dedup",
    "pagerank_parts", "rrf_fusion_topk", "avro_roundtrip",
    "ann_recall_report", "greedy_match_assign", "copurchase_lift",
    "near_dup_recall_audit", "curation_pipeline_select",
    "label_prop_communities",
]
LINE_BUDGET = 1900  # chars; the driver buffer is 2000 — leave margin


def budgeted_summary(summary: dict, timings: dict[str, float],
                     always: list[str] = PREV_REPORTED,
                     budget: int = LINE_BUDGET) -> dict:
    """Fill summary["queries"] with every `always` query present in
    `timings` plus as many of the remaining slowest as keep the
    serialized line inside `budget`. Pure, unit-tested."""
    by_slow = sorted(timings, key=lambda q: -timings[q])
    keep = [q for q in by_slow if q in set(always)]
    rest = [q for q in by_slow if q not in set(always)]

    def render(names: list[str]) -> str:
        s = dict(summary)
        s["queries"] = {q: timings[q] for q in sorted(names, key=lambda q: -timings[q])}
        s["queries_note"] = "%d of %d (prev-reported + slowest); full map in %s" % (
            len(names), len(timings), summary.get("_full_name", "BENCH_LOCAL_LATEST.json")
        )
        s.pop("_full_name", None)
        return json.dumps(s)

    while rest and len(render(keep + [rest[0]])) <= budget:
        keep.append(rest.pop(0))
    out = json.loads(render(keep))
    return out


GATE_PER_QUERY = 1.5   # a query may not slow more than 1.5x round-over-round
GATE_TOTAL = 1.2       # nor the shared-set total more than 1.2x
GATE_NOISE_S = 0.5     # absolute slack: sub-second timings jitter ~100s of ms
# Drift symmetry (VERDICT r6 item 3): a GREEN run whose total is below
# this ratio means the box/code is now much faster than the committed
# baseline — which silently WIDENS the regression the 1.2x threshold
# tolerates (at 0.8x observed, a true ~1.5x regression still reads
# green). Slow drift falsified the r5 gate; fast drift blunts it the
# same way, so both directions demand a re-baseline.
GATE_DRIFT_LOW = 0.9
# Pre-bench 1-min loadavg above this = the box was NOT idle when the
# bench started (an idle box reads << 1; a competing Spark job or the
# tail of one reads several). Only consulted when the gate VIOLATES —
# a green run on a loaded box is still green.
AMBIENT_LOAD1 = 4.0


def _proc_cpu_sample() -> dict[int, tuple[int, int, str]]:
    """One /proc pass: pid -> (ppid, utime+stime clock ticks, comm).
    comm is parsed around the LAST ')' because it may itself contain
    spaces or parentheses."""
    out: dict[int, tuple[int, int, str]] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            raw = Path(f"/proc/{d}/stat").read_text()
        except OSError:  # process exited between listdir and read
            continue
        try:
            lp = raw.rindex(")")
            comm = raw[raw.index("(") + 1 : lp]
            f = raw[lp + 2 :].split()
            out[int(d)] = (int(f[1]), int(f[11]) + int(f[12]), comm)
        except (ValueError, IndexError):
            continue
    return out


def read_load_evidence(sample_s: float = 1.0) -> dict:
    """Snapshot of what else the box is doing: loadavg triple, CPU
    count, and processes >= 50% INSTANTANEOUS CPU outside this process
    tree (the bench's own Spark JVM / Python workers are descendants
    and are excluded). Written into every committed bench artifact so
    an ambient-load adjudication is machine-checkable (VERDICT r9
    item 5 / r10 item 3).

    %CPU is a ~1 s delta of /proc/<pid>/stat utime+stime, NOT `ps`
    pcpu (ADVICE r10: pcpu is a lifetime average — a long-lived
    process that just STARTED competing never reaches the 50% bar,
    while a recently-finished busy one still reads above it)."""
    la1, la5, la15 = os.getloadavg()
    competing: list[dict] = []
    try:
        clk = os.sysconf("SC_CLK_TCK") or 100
        t0 = time.perf_counter()
        s0 = _proc_cpu_sample()
        time.sleep(max(sample_s, 0.05))
        dt = time.perf_counter() - t0
        s1 = _proc_cpu_sample()
        ppid = {p: v[0] for p, v in s1.items()}
        me = os.getpid()

        def in_my_tree(pid: int) -> bool:
            seen: set[int] = set()
            while pid and pid not in seen:
                if pid == me:
                    return True
                seen.add(pid)
                pid = ppid.get(pid, 0)
            return False

        for pid, (_, ticks1, comm) in s1.items():
            if pid not in s0:
                continue
            pcpu = (ticks1 - s0[pid][1]) / (clk * dt) * 100.0
            if pcpu >= 50.0 and not in_my_tree(pid):
                competing.append(
                    {"pid": pid, "pcpu": round(pcpu, 1), "comm": comm}
                )
        competing.sort(key=lambda r: -r["pcpu"])
    except Exception:  # noqa: BLE001 — evidence capture must never fail a bench
        pass
    return {
        "load1": round(la1, 2),
        "load5": round(la5, 2),
        "load15": round(la15, 2),
        "ncpus": os.cpu_count() or 1,
        "n_competing": len(competing),
        "competing_top": competing[:5],
    }


def is_ambient_loaded(*snapshots: dict) -> bool:
    """The machine-checkable 'ambient' rule: the PRE-bench snapshot
    shows the box already busy (load1), OR recently busy (load5 — the
    round-4 'tail of ~2h of back-to-back jobs' case: page cache dirty
    and cold while load1 has already decayed; observed again in round
    10 as a lone 1.54x violation on the disk-writing avro query with
    pre load1 0.03 / load15 6.55), or a competing >=50%-CPU process
    was observed in any snapshot."""
    if not snapshots:
        return False
    pre = snapshots[0]
    if pre.get("load1", 0.0) > AMBIENT_LOAD1 or pre.get("load5", 0.0) > AMBIENT_LOAD1:
        return True
    return any(s.get("n_competing", 0) > 0 for s in snapshots)


def compare_gate(
    fresh: dict[str, float],
    prev: dict[str, float],
    *,
    per_query: float = GATE_PER_QUERY,
    total: float = GATE_TOTAL,
    noise_s: float = GATE_NOISE_S,
    drift_low: float = GATE_DRIFT_LOW,
) -> dict:
    """Pure comparison: fresh vs previous per-query seconds over the
    SHARED query set. Returns {ok, violations, totals}; a violation is
    a query slower than per_query x AND more than noise_s slower in
    absolute terms, or the shared total exceeding total x.

    ``stale_baseline`` flags a green run whose total ratio fell below
    ``drift_low``: not a failure (fast is good), but the baseline no
    longer bounds regressions tightly — re-baseline with the two-idle-
    runs protocol (two back-to-back runs on an idle box, commit the
    second) before trusting the next green."""
    shared = sorted(set(fresh) & set(prev))
    violations = []
    for q in shared:
        if fresh[q] > prev[q] * per_query and fresh[q] - prev[q] > noise_s:
            violations.append(
                {"query": q, "prev_s": prev[q], "fresh_s": fresh[q],
                 "ratio": round(fresh[q] / prev[q], 2) if prev[q] else None}
            )
    t_prev = sum(prev[q] for q in shared)
    t_fresh = sum(fresh[q] for q in shared)
    total_ok = t_fresh <= t_prev * total or t_fresh - t_prev <= noise_s
    total_ratio = round(t_fresh / t_prev, 3) if t_prev else None
    stale = total_ratio is not None and 0 < total_ratio < drift_low
    return {
        "ok": not violations and total_ok,
        "n_shared": len(shared),
        "violations": violations,
        "total_prev_s": round(t_prev, 3),
        "total_fresh_s": round(t_fresh, 3),
        "total_ratio": total_ratio,
        "total_ok": total_ok,
        "stale_baseline": stale,
        "stale_note": (
            "total ratio %.3f < %.2f: baseline is stale-fast; the %.1fx "
            "total threshold now tolerates a ~%d%% true regression — "
            "re-baseline (two idle runs, commit the second)"
            % (total_ratio, drift_low, total, round((total / total_ratio - 1) * 100))
            if stale
            else ""
        ),
        "thresholds": {"per_query": per_query, "total": total,
                       "noise_s": noise_s, "drift_low": drift_low},
    }


def main() -> None:
    # ambient evidence BEFORE any of our own work starts: at this point
    # load1 reflects whatever ELSE the box was doing (or the tail of a
    # just-finished job), which is exactly the adjudication question
    pre_ev = read_load_evidence()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    # sf1 bench gate (VERDICT r4 item 3): pointing SPARK_GRAFT_SF_DIR at
    # the generated sf1 upscale runs the same headline bench + --gate
    # machinery at 6M rows; build the dataset on demand if absent
    if sf_dir.rstrip("/").endswith("spark_graft_sf1") and not os.path.exists(
        f"{sf_dir}/_SUCCESS_SF1"
    ):
        from scripts.make_sf1 import build

        build(get_spark("bench-make-sf1"))
    full_mode = "--full" in sys.argv
    gate_prev = None
    if "--gate" in sys.argv:
        gate_prev = sys.argv[sys.argv.index("--gate") + 1]

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    # warm-up: touch every input table once (OS page cache + parquet
    # footer caches), so per-query numbers measure compute, not first-IO
    from streams_prototyping_spark.data import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    # warm the Python worker fleet (first Arrow/pandas stage otherwise
    # pays ~1 s per worker spawn, misattributed to whichever Pandas-UDF
    # query runs first)
    import pandas as _pd

    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()

    # two passes: pass 1 warms codegen/JIT, the block caches, AND the
    # shared stage cache (the ANN/dedup index stages — see
    # stage_cache.py); pass 2 is timed — steady-state numbers, which is
    # what a long-running cluster actually sees: indexes are built once
    # (checkpointed tables in production) and queried many times. This
    # also makes run-to-run comparison in BENCH_r{N}.json meaningful
    # rather than JIT-noise.
    names = sorted(registry.QUERIES) if full_mode else HEADLINE

    def timed_pass() -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            fn = registry.QUERIES[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 3)
        return out

    # r12 (VERDICT r11 item 3): time every shared-stage build during the
    # warm-up pass so warm-only "wins" are visible in the artifact
    from streams_prototyping_spark import stage_cache

    stage_cache.TIME_BUILDS = True
    stage_cache.BUILD_SEC.clear()
    for name in names:  # warm-up pass (codegen/JIT, caches, shared stages)
        registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    stage_cache.TIME_BUILDS = False
    stage_build_sec = dict(sorted(stage_cache.BUILD_SEC.items()))
    timings = timed_pass()
    post_ev = read_load_evidence()
    load_ev: dict = {"pre": pre_ev, "post": post_ev}
    ambient = is_ambient_loaded(pre_ev, post_ev)
    ambient_rerun = None
    # Headline/full mode (no gate): the committed BENCH_r{N} /
    # BENCH_LOCAL artifacts must be idle-box numbers or carry the
    # auto-rerun that tried (VERDICT r10 item 3: the r10 headline was a
    # loaded-box 209.5 s a reviewer could only discount by cross-reading
    # the gate file). Ambient first attempt -> rerun ONCE, same session,
    # stages warm; both attempts recorded.
    if gate_prev is None and ambient:
        first_total = round(sum(timings.values()), 3)
        rerun_pre = read_load_evidence()
        timings = timed_pass()
        rerun_post = read_load_evidence()
        load_ev["rerun_pre"] = rerun_pre
        load_ev["rerun_post"] = rerun_post
        ambient_rerun = {
            "reason": "first attempt on a loaded box (machine rule: pre "
            f"load1/load5 > {AMBIENT_LOAD1} or competing >=50%-CPU "
            "process)",
            "first_total_s": first_total,
        }

    # gate comparison runs BEFORE stage release / session teardown so an
    # ambient-load auto-rerun re-times against the same warm state the
    # first attempt had (VERDICT r9 item 5)
    gate_report = None
    if gate_prev is not None:
        prev_doc = json.loads(Path(gate_prev).read_text())
        # accept both shapes: our own artifacts carry `queries` at the
        # top level, the driver's BENCH_r{N}.json wraps them under
        # `parsed` (discovered when a gate run against BENCH_r04.json
        # silently compared 0 shared queries)
        prev = (
            prev_doc.get("queries")
            or prev_doc.get("parsed", {}).get("queries")
            or {}
        )
        gate_report = compare_gate(timings, prev)
        gate_report["load_evidence"] = {"pre": pre_ev, "post": post_ev}
        gate_report["ambient_loaded"] = is_ambient_loaded(pre_ev, post_ev)
        gate_report["ambient_load1_threshold"] = AMBIENT_LOAD1
        if not gate_report["ok"] and gate_report["ambient_loaded"]:
            first_attempt = {
                k: gate_report[k]
                for k in ("ok", "violations", "total_ratio", "total_fresh_s")
            }
            rerun_pre = read_load_evidence()
            timings = timed_pass()
            rerun_post = read_load_evidence()
            gate_report = compare_gate(timings, prev)
            gate_report["load_evidence"] = {
                "pre": pre_ev,
                "post": post_ev,
                "rerun_pre": rerun_pre,
                "rerun_post": rerun_post,
            }
            gate_report["ambient_loaded"] = is_ambient_loaded(pre_ev, post_ev)
            # the rerun's own box state, adjudicated separately
            # (ADVICE r10: ambient_loaded covers only the first attempt)
            gate_report["rerun_ambient_loaded"] = is_ambient_loaded(
                rerun_pre, rerun_post
            )
            gate_report["ambient_load1_threshold"] = AMBIENT_LOAD1
            gate_report["auto_rerun"] = {
                "reason": "violated on a loaded box (machine rule: pre "
                f"load1 > {AMBIENT_LOAD1} or competing >=50%-CPU process)",
                "first_attempt": first_attempt,
            }

    from streams_prototyping_spark.stage_cache import release_all

    release_all()  # unpersist the shared stages before session teardown

    total = round(sum(timings.values()), 3)
    # The driver captures only the TAIL of stdout and json-parses the last
    # line; with 130+ headline queries the full per-query map outgrew that
    # buffer in round 2 ("parsed": null — no headline total recorded). So:
    # full map goes to a file, and the final stdout line stays compact —
    # total + sf + count + only the ~20 slowest queries (the ones worth
    # reading in a bench artifact anyway).
    if gate_report is not None:
        # the gate path may have auto-rerun; its evidence block is the
        # complete record for this session's timings
        load_ev = gate_report["load_evidence"]
    full = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "mode": "full" if full_mode else "headline",
        "stage_build_sec": stage_build_sec,
        "load_evidence": load_ev,
        "ambient_loaded": ambient,
        "ambient_load1_threshold": AMBIENT_LOAD1,
    }
    if ambient_rerun is not None:
        full["ambient_rerun"] = ambient_rerun
        full["rerun_ambient_loaded"] = is_ambient_loaded(
            load_ev["rerun_pre"], load_ev["rerun_post"]
        )
    here = Path(__file__).resolve().parent
    full_path = here / (
        "BENCH_LOCAL_FULL.json" if full_mode else "BENCH_LOCAL_LATEST.json"
    )
    full_path.write_text(json.dumps(full, indent=1) + "\n")

    # compact evidence for the driver's tail-parsed line (BENCH_r{N}
    # .json must self-adjudicate — VERDICT r10 item 3): full snapshots
    # minus the competing-process details, which live in the artifact
    compact_ev = {
        k: {kk: vv for kk, vv in snap.items() if kk != "competing_top"}
        for k, snap in load_ev.items()
    }
    summary = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "_full_name": full_path.name,
        "load_evidence": compact_ev,
        "ambient_loaded": ambient,
    }
    if ambient_rerun is not None:
        summary["ambient_rerun"] = ambient_rerun
        summary["rerun_ambient_loaded"] = full["rerun_ambient_loaded"]
    summary = budgeted_summary(summary, timings)
    print(json.dumps(summary))
    spark.stop()

    # gate verdict AFTER the summary line so the driver's stdout
    # tail-parse is never broken by a failing gate (the exit code
    # carries the verdict); the comparison itself ran pre-teardown
    if gate_report is not None:
        gate_report["prev_artifact"] = gate_prev
        gate_report["sf"] = sf
        (here / "BENCH_GATE_LATEST.json").write_text(
            json.dumps(gate_report, indent=1) + "\n"
        )
        print(
            json.dumps(
                {"gate": gate_report["ok"],
                 "violations": gate_report["violations"],
                 "total_ratio": gate_report["total_ratio"],
                 "stale_baseline": gate_report["stale_baseline"],
                 "ambient_loaded": gate_report["ambient_loaded"],
                 "auto_rerun": "auto_rerun" in gate_report}
            ),
            file=sys.stderr,
        )
        if gate_report["stale_baseline"]:
            print("GATE WARNING: " + gate_report["stale_note"], file=sys.stderr)
        if not gate_report["ok"]:
            sys.exit(1)


if __name__ == "__main__":
    main()
