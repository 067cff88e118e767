"""Generate an sf1 dataset (10x sf0.1) for the scaling curve
(VERDICT r3 item 2: add an sf1 point and refit alpha on the 0.1->1
step).

/root/testdata is read-only and ships no sf1, so we upscale sf0.1
deterministically into $SPARK_GRAFT_SF1_DIR (default
/tmp/spark_graft_sf1): 10 key-shifted replicas of every fact table.
Key shifting (replica i adds i * (max_key+1) to every PK/FK) is what
makes the upscale measurement-valid: naive row duplication would put
10x copies on BOTH sides of every join key, inflating join outputs
100x and poisoning the fitted exponent, whereas shifted replicas keep
per-key cardinalities — and therefore join selectivities and group
sizes — identical to sf0.1, which is how a real 10x corpus behaves.

Content columns are perturbed per replica where identity would be
degenerate:
  - documents.text: every 3rd word tagged with the replica index
    (shingle overlap vs the source replica drops below near-dup
    thresholds, so the corpus-wide duplicate RATE stays at its sf0.1
    level instead of every doc gaining 9 exact twins);
  - embeddings.embedding: a small deterministic per-replica offset
    (cosine/IVF geometry stays realistic, no 10-way exact ties).
Dimension tables (region, nation) keep their real-world-fixed
cardinality; customer/supplier/part FKs into them are preserved.

Deterministic (no RNG), idempotent, ~15 s. Rerun any time; the
scaling harness regenerates it on demand.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# table -> columns to key-shift (PKs and FKs into other REPLICATED
# tables; FKs into dimension tables are left alone)
SHIFT: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONLY = ["region", "nation"]

# strides must be consistent across tables sharing a key family
_KEY_FAMILY = {
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
}


def sf1_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")


def _strides(spark: SparkSession, src_dir: str = SRC) -> dict[str, int]:
    """stride per (table, pk) family = max(pk)+1 in the source SF."""
    out: dict[str, int] = {}
    for table, cols in SHIFT.items():
        for c in cols:
            fam = _KEY_FAMILY.get(c, (table, c))
            key = f"{fam[0]}.{fam[1]}"
            if key not in out:
                src = spark.read.parquet(f"{src_dir}/{fam[0]}.parquet")
                out[key] = int(src.agg(F.max(fam[1])).first()[0]) + 1
            out[f"{table}.{c}"] = out[key]
    return out


def _perturb(table: str, df: DataFrame, i: int) -> DataFrame:
    if i == 0:
        return df
    if table == "documents":
        tagged = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w, j: F.when(j % 3 == i % 3, F.concat(w, F.lit(f"~{i}")))
                .otherwise(w),
            ),
            " ",
        )
        return df.withColumn("text", tagged).withColumn(
            "n_chars", F.length("text").cast(df.schema["n_chars"].dataType)
        )
    if table == "embeddings":
        eps = F.lit(float(i) * 1e-3)
        return df.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, j: (
                    x + eps * F.cos((F.col("vec_id") % 97 + j + 1).cast("double"))
                ).cast(df.schema["embedding"].dataType.elementType),
            ),
        )
    return df


def build(
    spark: SparkSession,
    out_dir: str | None = None,
    force: bool = False,
    src_dir: str = SRC,
    replicas: int = REPLICAS,
    marker_name: str = "_SUCCESS_SF1",
    partitions: int = 16,
) -> str:
    """Key-shifted upscale of ``src_dir`` by ``replicas``x into
    ``out_dir``. Chaining builds bigger decades (sf0.1 -> sf1 -> sf10)
    with the same per-key-cardinality-preserving construction; the
    doc-tag / embedding-offset perturbations compose (a second-level
    replica tags already-tagged words), so the duplicate rate and
    vector geometry stay realistic at every decade."""
    out = out_dir or sf1_dir()
    marker = os.path.join(out, marker_name)
    if os.path.exists(marker) and not force:
        return out
    os.makedirs(out, exist_ok=True)
    strides = _strides(spark, src_dir)
    for table in COPY_ONLY:
        spark.read.parquet(f"{src_dir}/{table}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out}/{table}.parquet")
    for table, cols in SHIFT.items():
        src = spark.read.parquet(f"{src_dir}/{table}.parquet")
        parts = []
        for i in range(replicas):
            rep = _perturb(table, src, i)
            for c in cols:
                rep = rep.withColumn(
                    c,
                    (F.col(c) + F.lit(i * strides[f"{table}.{c}"])).cast(
                        src.schema[c].dataType
                    ),
                )
            parts.append(rep)
        allr = parts[0]
        for p in parts[1:]:
            allr = allr.unionByName(p)
        allr.repartition(partitions).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )
    Path(marker).touch()
    return out


def main() -> None:
    from streams_prototyping_spark.session import get_spark

    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    out = build(spark, force="--force" in sys.argv)
    for t in list(SHIFT) + COPY_ONLY:
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n:,}")
    spark.stop()


if __name__ == "__main__":
    main()
