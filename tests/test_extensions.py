"""Behavioral tests for the LLM-pipeline extensions on PLANTED data —
the testdata has no exact duplicates, so oracle parity alone would not
prove the dedup operators detect anything. Here we synthesize known
duplicates and assert detection."""

import pyspark.sql.functions as F
import pytest

from streams_prototyping_spark.functions import dedup, similarity
from streams_prototyping_spark.functions.portable_hash import portable_hash64_py


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun"
)
NEAR = BASE.replace("lazy", "sleepy")  # one word differs
OTHER = "completely different content about spark shuffles and parquet row groups and columnar compression"


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    """A mini documents table with an exact dup pair, a near-dup pair,
    and an unrelated doc, written as parquet so the queries' load path
    is exercised."""
    d = tmp_path_factory.mktemp("planted")
    df = _docs_df(
        spark,
        [
            (1, BASE),
            (2, BASE),        # exact dup of 1
            (3, NEAR),        # near dup of 1/2
            (4, OTHER),
            (5, "tiny doc"),  # < 3 words: shingle fallback path
        ],
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return str(d)


def test_dedup_exact_collapses_planted(spark, planted):
    out = dedup.dedup_exact(spark, planted).collect()
    assert len(out) == 4  # 5 docs, one exact-dup collapsed
    by_copies = {r.doc_id: r.n_copies for r in out}
    assert by_copies[1] == 2  # survivor is min(doc_id) with 2 copies


def test_minhash_finds_planted_pairs(spark, planted):
    pairs = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs_df(spark, planted).collect()
    }
    assert pairs[(1, 2)] == 1.0  # exact dup: identical signature
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.25  # near dup collides
    assert not any({a, b} & {4} for a, b in pairs)  # unrelated doc never pairs


def test_ngram_jaccard_exact_values(spark, planted):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(spark, planted).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0.3 < pairs[(1, 3)] < 1.0  # one-word edit -> high-but-not-1


def test_simhash_hamming_close_for_near_dups(spark, planted):
    fp = {r.doc_id: r.simhash for r in dedup.simhash_fingerprint(spark, planted).collect()}
    assert fp[1] == fp[2]
    ham_near = bin(fp[1] ^ fp[3]).count("1")
    ham_far = bin(fp[1] ^ fp[4]).count("1")
    assert ham_near < ham_far  # near-dup closer than unrelated doc


def test_portable_hash_matches_python(spark, sf_dir):
    """Spark's portable hash == Python's reference implementation,
    anchoring the cross-engine contract from the third side."""
    from streams_prototyping_spark.functions.text import doc_fingerprint

    row = doc_fingerprint(spark, sf_dir).orderBy("doc_id").first()
    from streams_prototyping_spark.data import load_table

    text = load_table(spark, sf_dir, "documents").orderBy("doc_id").first().text
    assert row.content_hash == portable_hash64_py(text)


def test_ann_is_subset_quality(spark, sf_dir):
    """ANN's top-1 neighbor cosine should be within the exact top-5 set
    for queries whose bucket contains candidates (sanity of recall)."""
    exact = {
        (r.query_id, r.vec_id) for r in similarity.cosine_topk(spark, sf_dir).collect()
    }
    ann = [
        r for r in similarity.ann_lsh_topk(spark, sf_dir).collect() if r.rnk == 1
    ]
    assert ann, "every query should have at least one same-bucket candidate or none"
    # each ANN hit is a real vector with positive-ish similarity; at
    # least one query's ANN top-1 should coincide with an exact top-5 hit
    assert any((r.query_id, r.vec_id) in exact for r in ann)


def test_multimodal_decode_plumbing(spark, planted):
    from streams_prototyping_spark.functions.multimodal import (
        decode_image_fake,
        decode_image_real,
        multimodal_decode,
    )

    with pytest.raises(NotImplementedError):
        decode_image_real(b"bytes")

    out = {r.doc_id: r for r in multimodal_decode(spark, planted).collect()}
    assert len(out) == 5
    expect = decode_image_fake(BASE.encode())
    assert out[1].width == expect["width"]
    assert out[1].height == expect["height"]
    assert out[1].n_bytes == len(BASE)
