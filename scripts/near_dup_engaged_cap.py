"""Engaged-cap scaling measurement for embedding_near_dup_pairs
(VERDICT r7 item 1: retire the weak grade).

The r7 sf10->sf100 step showed alpha 1.56 and was DEFENDED as a
one-time cap-engagement transition (sf10's c=100 near-copies sit
below the TARGET_BUCKET_OCC=128 sub-block cap; sf100's c=1000 sit
above it), with semantic_dedup's 1.04 as an analogy anchor. That is
an argument, not a measurement of THIS operator. This script makes
the measurement: two corpora with IDENTICAL duplication rate c=1000
(cap engaged at BOTH ends, by construction and verified by occupancy
stats) differing only 10x in base-vector count:

  END A: 200  base vectors (sf0.1 vec_id < 200)  x 1000 near-copies = 200k
  END B: 2000 base vectors (all of sf0.1)        x 1000 near-copies = 2M

Near-copies use make_sf1.py's deterministic perturbation shape at
1e-6 amplitude (cosine vs base ~ 1.0 — genuinely near-duplicates),
with key-shifted ids (replica i -> base_id + i * n_bases). Sub-block
assignment is the HASHED id (similarity._SPLIT_HASH_SPARK, round-8
fix), so occupancy is id-structure-independent; key-shifted ids are
exactly the adversarial case the original raw modulo failed on
(stride ≡ 0 mod n_subblocks put every replica of a base in ONE
sub-block — the occupancy table below is what caught it).

If the cap does its job, per-vector candidate counts are identical at
both ends and alpha ~ 1. The occupancy table (bucket count, mean/max
occupancy, engaged fraction = share of vectors in buckets over the
cap, candidate pairs per vector from the actual sub-block sizes)
proves the regime rather than asserting it.

Methodology matches scaling_curve.py: noop sink, warm-up pass then
timed pass; each END runs in its own subprocess/JVM (the sf100 lesson:
shuffle scratch reclaims deterministically, and one end's spill can't
starve the other). Results -> NEAR_DUP_ENGAGED_CAP.json; the
SCALING_SF100.md analysis section renders from it (sf100_sweep.py).

Usage: python scripts/near_dup_engaged_cap.py           (orchestrate both ends)
       python scripts/near_dup_engaged_cap.py --end A   (one end, prints JSON)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HERE = Path(__file__).resolve().parent.parent
STORE = HERE / "NEAR_DUP_ENGAGED_CAP.json"
SRC = "/root/testdata/sf0.1/embeddings.parquet"
REPLICAS = 1000  # duplication rate c — above TARGET_BUCKET_OCC at both ends
ENDS = {"A": 200, "B": 2000}  # end -> base-vector count


def corpus_dir(end: str) -> str:
    return os.environ.get(
        f"SPARK_GRAFT_NDCAP_{end}_DIR", f"/tmp/spark_graft_ndcap_{end}"
    )


def build_corpus(spark, end: str) -> str:
    """embeddings-only dataset dir: n_bases x REPLICAS near-copies."""
    from pyspark.sql import functions as F

    n_bases = ENDS[end]
    out = corpus_dir(end)
    marker = os.path.join(out, "_SUCCESS_NDCAP")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    bases = (
        spark.read.parquet(SRC)
        .filter(F.col("vec_id") < n_bases)
        .select("vec_id", "embedding", "label")
    )
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    # replica perturbation: make_sf1._perturb's deterministic shape at
    # 1e-6 amplitude -> offset <= 1e-3 over 1000 replicas, cosine vs
    # base ~ 1.0 (true near-copies; every replica of a base lands in
    # the base's LSH bucket, which is the regime under test).
    eps = F.col("rep").cast("double") * F.lit(1e-6)
    dup = (
        bases.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(n_bases)).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, j: (
                    x + eps * F.cos((F.col("vec_id") % 97 + j + 1).cast("double"))
                ).cast("float"),
            ).alias("embedding"),
            "label",
        )
    )
    dup.repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    Path(marker).touch()
    return out


def occupancy_stats(spark, sf_dir: str) -> dict:
    """Prove the regime: bucket occupancy + sub-block candidate volume
    from the ACTUAL index (_bucketed + the operator's own sub split)."""
    from pyspark.sql import functions as F

    from streams_prototyping_spark.functions.similarity import (
        _SPLIT_HASH_SPARK,
        TARGET_BUCKET_OCC,
        _bucketed,
        _lsh_bits,
    )

    bucketed = _bucketed(spark, sf_dir)
    bn = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("bn"))
    agg = bn.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("bn").alias("n_vecs"),
        F.max("bn").alias("max_occ"),
        F.avg("bn").alias("mean_occ"),
        F.sum(F.when(F.col("bn") > TARGET_BUCKET_OCC, F.col("bn")).otherwise(0)).alias(
            "vecs_over_cap"
        ),
    ).first()
    # candidate pairs from actual sub-block sizes: sum C(sz, 2)
    subs = (
        bucketed.join(F.broadcast(bn), "bucket")
        .select(
            "bucket",
            (
                F.expr(_SPLIT_HASH_SPARK.format(id="vec_id"))
                % F.greatest(
                    F.lit(1).cast("long"),
                    F.ceil(F.col("bn") / float(TARGET_BUCKET_OCC)),
                )
            ).alias("sub"),
        )
        .groupBy("bucket", "sub")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(F.sum(F.expr("sz * (sz - 1) / 2")).alias("cand_pairs"))
        .first()
    )
    n = int(agg["n_vecs"])
    cand = int(subs["cand_pairs"])
    return {
        "n_vecs": n,
        "lsh_bits": _lsh_bits(spark, sf_dir),
        "n_buckets": int(agg["n_buckets"]),
        "mean_occ": round(float(agg["mean_occ"]), 1),
        "max_occ": int(agg["max_occ"]),
        "engaged_frac": round(int(agg["vecs_over_cap"]) / n, 4),
        "cand_pairs": cand,
        "cand_per_vec": round(2.0 * cand / n, 1),
    }


def measure_end(end: str) -> dict:
    from streams_prototyping_spark import registry
    from streams_prototyping_spark.session import get_spark
    from streams_prototyping_spark.stage_cache import release_all

    spark = get_spark(f"ndcap-{end}")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    sf_dir = build_corpus(spark, end)
    fn = registry.QUERIES["embedding_near_dup_pairs"]
    stats = occupancy_stats(spark, sf_dir)
    secs = []
    n_pairs = None
    for timed in (False, True):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        if timed:
            secs.append(round(time.perf_counter() - t0, 3))
            n_pairs = df.count()
    release_all()
    rec = {"end": end, "sec": secs[-1], "n_pairs": int(n_pairs), **stats}
    print(json.dumps(rec), flush=True)
    spark.stop()
    return rec


def main() -> None:
    if "--end" in sys.argv:
        measure_end(sys.argv[sys.argv.index("--end") + 1])
        return
    import subprocess

    store = json.loads(STORE.read_text()) if STORE.exists() else {}
    for end in ENDS:
        if end in store:
            continue
        env = dict(os.environ)
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
        out = subprocess.run(
            [sys.executable, __file__, "--end", end],
            capture_output=True,
            text=True,
            env=env,
            timeout=5400,
        )
        rec = None
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                rec = json.loads(line)
        if rec is None:
            print(out.stdout[-3000:], file=sys.stderr)
            print(out.stderr[-3000:], file=sys.stderr)
            raise SystemExit(f"end {end} failed")
        store[end] = rec
        STORE.write_text(json.dumps(store, indent=1) + "\n")
    a, b = store["A"], store["B"]
    alpha = math.log(b["sec"] / a["sec"]) / math.log(b["n_vecs"] / a["n_vecs"])
    store["alpha"] = round(alpha, 2)
    store["flag"] = "SUPERLINEAR" if alpha > 1.3 else ""
    STORE.write_text(json.dumps(store, indent=1) + "\n")
    print(json.dumps({"alpha": store["alpha"], "flag": store["flag"]}))


if __name__ == "__main__":
    main()
