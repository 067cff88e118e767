"""df-window prune stats for tfidf_cosine_pairs (VERDICT r8 item 7).

tfidf_cosine_pairs holds the registry's highest surviving sf100
exponent (alpha 1.15). Its candidate volume is Σ_grams C(df, 2) over
grams inside the df-window [TFIDF_DF_MIN, TFIDF_DF_MAX] — if that sum
grows linearly with the corpus (candidates/doc flat across the
decade), the 1.15 is inherent pair-output growth; if candidates/doc
climbs, the prune is eroding and the plan needs work. This script
measures both sides of the prune at sf10 and sf100 and stores the
table in SCALING_SF100.json under "tfidf_prune_stats" (rendered by
sf100_sweep.write_md).

One aggregation pass per SF over the gram df table — no pair join is
executed, so the instrument costs a scan + two groupBys even at 5M
docs.

Usage: python scripts/tfidf_prune_stats.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HERE = Path(__file__).resolve().parent.parent
STORE = HERE / "SCALING_SF100.json"
SFS = {"10": "/tmp/spark_graft_sf10", "100": "/tmp/spark_graft_sf100"}


def measure(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from streams_prototyping_spark.functions.corpus_stats import (
        TFIDF_DF_MAX,
        TFIDF_DF_MIN,
        gram_tf_df,
    )
    from streams_prototyping_spark.data import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    df_tbl = gram_tf_df(spark, sf_dir).groupBy("gram").agg(
        F.count("*").alias("df")
    )
    pairs = F.col("df") * (F.col("df") - 1) / 2
    in_win = F.col("df").between(TFIDF_DF_MIN, TFIDF_DF_MAX)
    r = df_tbl.agg(
        F.count("*").alias("n_grams"),
        F.sum(F.when(in_win, 1).otherwise(0)).alias("n_grams_window"),
        F.sum(pairs).cast("long").alias("cand_unpruned"),
        F.sum(F.when(in_win, pairs).otherwise(0)).cast("long").alias("cand_window"),
        F.max("df").alias("max_df"),
    ).first()
    return {
        "n_docs": int(n_docs),
        "n_grams": int(r["n_grams"]),
        "n_grams_window": int(r["n_grams_window"]),
        "cand_pairs_unpruned": int(r["cand_unpruned"]),
        "cand_pairs_window": int(r["cand_window"]),
        "cand_per_doc": round(2.0 * int(r["cand_window"]) / int(n_docs), 1),
        "pruned_frac": round(
            1.0 - int(r["cand_window"]) / max(int(r["cand_unpruned"]), 1), 6
        ),
        "max_df": int(r["max_df"]),
    }


def main() -> None:
    from streams_prototyping_spark.session import get_spark
    from streams_prototyping_spark.stage_cache import release_all

    spark = get_spark("tfidf-prune-stats")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for sf, d in SFS.items():
        out[sf] = measure(spark, d)
        release_all()
        print(json.dumps({sf: out[sf]}), flush=True)
    spark.stop()
    store = json.loads(STORE.read_text())
    store["tfidf_prune_stats"] = out
    STORE.write_text(json.dumps(store, indent=1) + "\n")
    # re-render the md with the new section
    sys.path.insert(0, str(HERE / "scripts"))
    import sf100_sweep

    sf100_sweep.write_md(store)
    print("annotated SCALING_SF100.{json,md}")


if __name__ == "__main__":
    main()
