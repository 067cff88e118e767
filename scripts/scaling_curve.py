"""Scale-curve evidence (VERDICT r2 item 6): run the slowest headline
queries at sf0.001 / sf0.01 / sf0.1 and fit the growth exponent
alpha = log(t_hi/t_lo) / log(rows_hi/rows_lo) over the top SF step
(the small step is dominated by fixed per-query overhead, so only the
0.01 -> 0.1 step is meaningful). alpha ~ 1 = linear in rows; > ~1.3
flags a query whose plan would not survive a 100x scale-up.

Prints one JSON line and (with --md) rewrites SCALING.md.

Usage: python scripts/scaling_curve.py [--md] [query ...]
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
    argv = [a for a in sys.argv[1:] if a != "--md"]
    write_md = "--md" in sys.argv[1:]
    queries = argv or DEFAULT_QUERIES

    spark = get_spark("scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    from streams_prototyping_spark.data import TABLES, load_table

    results: dict[str, dict[str, float]] = {q: {} for q in queries}
    rowcounts: dict[str, int] = {}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
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

    lo, hi = SFS[-2], SFS[-1]
    ratio = rowcounts[hi] / rowcounts[lo]
    report = {}
    for q in queries:
        t_lo, t_hi = results[q][lo], results[q][hi]
        alpha = math.log(t_hi / t_lo) / math.log(ratio) if t_lo > 0 else float("nan")
        report[q] = {
            **{f"sec_sf{sf}": results[q][sf] for sf in SFS},
            "alpha": round(alpha, 2),
            "flag": "SUPERLINEAR" if alpha > 1.3 else "",
        }

    out = {"rows": rowcounts, "step": f"sf{lo}->sf{hi}", "queries": report}
    print(json.dumps(out))

    if write_md:
        lines = [
            "# SCALING — measured growth exponents (round 3)",
            "",
            "Produced by `python scripts/scaling_curve.py --md` on local[32].",
            f"Rows (lineitem): sf0.001={rowcounts['0.001']:,}, "
            f"sf0.01={rowcounts['0.01']:,}, sf0.1={rowcounts['0.1']:,}.",
            "",
            "alpha = log(t_sf0.1/t_sf0.01) / log(rows_sf0.1/rows_sf0.01) —",
            "the empirical growth exponent over the largest measured step",
            "(the sf0.001 step is fixed-overhead-dominated and not fitted).",
            "alpha <= ~1 is linear-or-better in rows; > 1.3 is flagged.",
            "Timings are second-pass (warm caches + shared index stages),",
            "matching bench.py's steady-state methodology.",
            "",
            "| query | sf0.001 s | sf0.01 s | sf0.1 s | alpha | flag |",
            "|---|---|---|---|---|---|",
        ]
        for q in sorted(report, key=lambda q: -report[q]["alpha"]):
            r = report[q]
            lines.append(
                f"| {q} | {r['sec_sf0.001']} | {r['sec_sf0.01']} | "
                f"{r['sec_sf0.1']} | {r['alpha']} | {r['flag']} |"
            )
        lines += [
            "",
            "Reading: with ~100x more rows per SF decade, per-query fixed",
            "costs (plan compile, stage launch, Python worker fleet) dominate",
            "the small SFs, which depresses alpha; a genuinely superlinear",
            "plan still shows alpha well above 1 on the top step. Queries",
            "flagged SUPERLINEAR get a plan re-audit before the next round.",
        ]
        Path(__file__).resolve().parent.parent.joinpath("SCALING.md").write_text(
            "\n".join(lines) + "\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
