"""Scale-curve evidence (VERDICT r2 item 6; r3 item 2 adds sf1): run
the slowest headline queries at sf0.001 / sf0.01 / sf0.1 (and, with
--sf1, a generated sf1 = 10x key-shifted upscale of sf0.1 — see
scripts/make_sf1.py) and fit the growth exponent
alpha = log(t_hi/t_lo) / log(rows_hi/rows_lo) over the top SF step
(the small steps are dominated by fixed per-query overhead, so only
the largest step is meaningful — 0.1 -> 1 when --sf1 is given).
alpha ~ 1 = linear in rows; > ~1.3 flags a query whose plan would not
survive a 100x scale-up.

Prints one JSON line and (with --md) rewrites SCALING.md.

Usage: python scripts/scaling_curve.py [--md] [--sf1] [--all] [--sf10]
       [--sf100] [query ...]

--sf10: measure the THIRD decade (sf0.1 -> sf1 -> sf10, ~60M lineitem
rows via scripts/make_sf10.py's chained upscale) for the curated
expensive set and fit alpha on the sf1 -> sf10 step. Writes
SCALING_SF10.md with --md (SCALING.md keeps the full-headline sf1
table).

--sf100 (VERDICT r6 item 5): the FOURTH decade — measure sf10 and
sf100 only (600M lineitem rows / ~1.5M documents via make_sf100.py;
the smaller decades are already on record in SCALING*.md) and fit
alpha on the sf10 -> sf100 step for the flagship families. Writes
SCALING_SF100.md with --md. Run with SPARK_GRAFT_DRIVER_MEM=24g.

--all (VERDICT r4 item 2): measure EVERY bench.py headline query
instead of the curated 24, and fit only the sf0.1 -> sf1 step (the
small SFs are fixed-overhead-dominated and never fitted anyway, so
skipping them halves a run that is ~6x bigger by query count).
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from streams_prototyping_spark import registry
from streams_prototyping_spark.session import get_spark
from streams_prototyping_spark.stage_cache import release_all

# the 15 slowest from BENCH_LOCAL_r02c plus the three VERDICT watch
# candidates (triangle_count / poisson_bootstrap_ci / simhash_near_pairs
# are already in the slowest set)
DEFAULT_QUERIES = [
    "poisson_bootstrap_ci",
    "triangle_count",
    "bm25_topk",
    "pagerank_parts",
    "tfidf_cosine_pairs",
    "simhash_near_pairs",
    "numeric_profile",
    "ivf_pq_topk",
    "rrf_fusion_topk",
    "multimodal_resize",
    "knn_label_eval",
    "psi_drift_report",
    "curation_pipeline_select",
    "equidepth_value_histogram",
    "bfs_reachability",
    "minhash_lsh_pairs",
    # round-3b additions worth a curve
    "naive_bayes_confusion",
    "label_prop_communities",
    "point_in_range_join",
    "bpe_learn_merges",
    "markov_attribution_removal",
    "shapley_attribution",
    "embedding_covariance",
    "copurchase_lift",
]

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    argv = [
        a
        for a in sys.argv[1:]
        if a not in ("--md", "--sf1", "--all", "--sf10", "--sf100")
    ]
    write_md = "--md" in sys.argv[1:]
    all_mode = "--all" in sys.argv[1:]
    sf10_mode = "--sf10" in sys.argv[1:]
    sf100_mode = "--sf100" in sys.argv[1:]
    with_sf1 = "--sf1" in sys.argv[1:] or all_mode or sf10_mode
    if all_mode:
        from bench import HEADLINE

        queries = argv or list(HEADLINE)
    else:
        queries = argv or DEFAULT_QUERIES

    spark = get_spark("scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    from streams_prototyping_spark.data import TABLES, load_table

    if sf100_mode:
        from scripts.make_sf10 import build_sf10
        from scripts.make_sf100 import build_sf100

        sfs = ["10"]
        dirs = {"10": build_sf10(spark)}
        dirs["100"] = build_sf100(spark)
        sfs.append("100")
    else:
        sfs = ["0.1"] if (all_mode or sf10_mode) else list(SFS)
        dirs = {sf: f"/root/testdata/sf{sf}" for sf in sfs}
        if with_sf1:
            from scripts.make_sf1 import build

            dirs["1"] = build(spark)
            sfs.append("1")
        if sf10_mode:
            from scripts.make_sf10 import build_sf10

            dirs["10"] = build_sf10(spark)
            sfs.append("10")

    results: dict[str, dict[str, float]] = {q: {} for q in queries}
    rowcounts: dict[str, int] = {}
    for sf in sfs:
        sf_dir = dirs[sf]
        for t in TABLES:
            load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
        rowcounts[sf] = load_table(spark, sf_dir, "lineitem").count()
        for timed in (False, True):
            for q in queries:
                fn = registry.QUERIES[q]
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                if timed:
                    results[q][sf] = round(time.perf_counter() - t0, 3)
        release_all()  # per-sf shared stages: drop before the next SF

    lo, hi = sfs[-2], sfs[-1]
    ratio = rowcounts[hi] / rowcounts[lo]
    report = {}
    for q in queries:
        t_lo, t_hi = results[q][lo], results[q][hi]
        alpha = math.log(t_hi / t_lo) / math.log(ratio) if t_lo > 0 else float("nan")
        report[q] = {
            **{f"sec_sf{sf}": results[q][sf] for sf in sfs},
            "alpha": round(alpha, 2),
            "flag": "SUPERLINEAR" if alpha > 1.3 else "",
        }

    out = {"rows": rowcounts, "step": f"sf{lo}->sf{hi}", "queries": report}
    print(json.dumps(out))

    if write_md:
        rows_line = ", ".join(f"sf{sf}={rowcounts[sf]:,}" for sf in sfs)
        lines = [
            "# SCALING"
            + ("_SF100" if sf100_mode else ("_SF10" if sf10_mode else ""))
            + " — measured growth exponents (round 7)",
            "",
            "Produced by `python scripts/scaling_curve.py --md"
            + (
                " --sf100"
                if sf100_mode
                else (
                    " --sf10"
                    if sf10_mode
                    else (" --all" if all_mode else (" --sf1" if with_sf1 else ""))
                )
            )
            + "` on local[32]."
            + (
                " --all mode: EVERY bench.py headline query, fitted on the"
                " sf0.1 -> sf1 step only (VERDICT r4 item 2)."
                if all_mode
                else ""
            ),
            f"Rows (lineitem): {rows_line}."
            + (
                " sf1 is the deterministic 10x key-shifted upscale of sf0.1"
                " (scripts/make_sf1.py) — per-key cardinalities and join"
                " selectivities preserved, content perturbed per replica."
                if with_sf1
                else ""
            ),
            "",
            f"alpha = log(t_sf{hi}/t_sf{lo}) / log(rows_sf{hi}/rows_sf{lo}) —",
            "the empirical growth exponent over the largest measured step",
            "(smaller steps are fixed-overhead-dominated and not fitted).",
            "alpha <= ~1 is linear-or-better in rows; > 1.3 is flagged.",
            "Timings are second-pass (warm caches + shared index stages),",
            "matching bench.py's steady-state methodology.",
            "",
            "| query | " + " | ".join(f"sf{sf} s" for sf in sfs)
            + " | alpha | flag |",
            "|---|" + "---|" * (len(sfs) + 2),
        ]
        for q in sorted(report, key=lambda q: -report[q]["alpha"]):
            r = report[q]
            cells = " | ".join(str(r[f"sec_sf{sf}"]) for sf in sfs)
            lines.append(f"| {q} | {cells} | {r['alpha']} | {r['flag']} |")
        lines += [
            "",
            "Reading: with ~100x more rows per SF decade, per-query fixed",
            "costs (plan compile, stage launch, Python worker fleet) dominate",
            "the small SFs, which depresses alpha; a genuinely superlinear",
            "plan still shows alpha well above 1 on the top step. Queries",
            "flagged SUPERLINEAR get a plan re-audit before the next round.",
        ]
        md_name = (
            "SCALING_SF100.md"
            if sf100_mode
            else ("SCALING_SF10.md" if sf10_mode else "SCALING.md")
        )
        Path(__file__).resolve().parent.parent.joinpath(md_name).write_text(
            "\n".join(lines) + "\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
