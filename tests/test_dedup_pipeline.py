"""Behavioral invariants for the dedup-pipeline completion operators
(clusters / canonical / incremental / winnowing) and the text-transform
family. Exactness vs DuckDB is covered by test_oracle_parity; these
tests pin the *semantic* properties a value-hash can't express."""

import pytest
from pyspark.sql import functions as F

from streams_prototyping_spark import registry

registry.load_all()


@pytest.fixture(scope="module")
def clusters(spark, sf_dir):
    return {
        r["doc_id"]: r["cluster_id"]
        for r in registry.QUERIES["dedup_clusters"](spark, sf_dir).collect()
    }


def test_clusters_cover_all_docs_and_use_min_id(spark, sf_dir, clusters):
    from streams_prototyping_spark.data import load_table

    docs = {r[0] for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()}
    assert set(clusters) == docs
    # cluster id is the smallest member id -> every cluster contains its own id
    for doc, cid in clusters.items():
        assert cid <= doc
        assert clusters[cid] == cid


def test_clusters_respect_candidate_edges(spark, sf_dir, clusters):
    """Every LSH candidate pair above the estimate threshold must land
    in one cluster (edge contraction), including transitively."""
    pairs = registry.QUERIES["minhash_lsh_pairs"](spark, sf_dir).collect()
    for r in pairs:
        assert clusters[r["doc_a"]] == clusters[r["doc_b"]], (
            f"edge ({r['doc_a']},{r['doc_b']}) split across clusters"
        )


def test_canonical_one_per_cluster_max_quality(spark, sf_dir, clusters):
    canon = registry.QUERIES["dedup_canonical"](spark, sf_dir).collect()
    assert len(canon) == len(set(clusters.values()))
    assert {r["cluster_id"] for r in canon} == set(clusters.values())
    quality = {
        r["doc_id"]: r["quality_score"]
        for r in registry.QUERIES["quality_score"](spark, sf_dir).collect()
    }
    by_cluster: dict[int, list[int]] = {}
    for doc, cid in clusters.items():
        by_cluster.setdefault(cid, []).append(doc)
    for r in canon:
        members = by_cluster[r["cluster_id"]]
        assert r["cluster_size"] == len(members)
        best = max(quality[m] for m in members)
        assert quality[r["canonical_doc_id"]] == pytest.approx(best)


def test_incremental_returns_only_novel_arrivals(spark, sf_dir):
    from streams_prototyping_spark.data import load_table

    out = {r["doc_id"] for r in registry.QUERIES["dedup_incremental"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    corpus_texts = {r["text"] for r in docs if r["doc_id"] % 10 != 0}
    for r in docs:
        if r["doc_id"] % 10 == 0:
            expected_kept = r["text"] not in corpus_texts
            assert (r["doc_id"] in out) == expected_kept


def test_winnowing_shared_run_guarantee(spark, sf_dir):
    """Winnowing's core guarantee: identical documents select identical
    fingerprint sets (any shared run of w+k-1 words shares at least one
    selected hash; byte-identical docs share all of them)."""
    df = registry.QUERIES["winnowing_fingerprint"](spark, sf_dir)
    fps = df.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("fingerprint")).alias("fps")
    )
    from streams_prototyping_spark.data import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = docs.join(fps, "doc_id").collect()
    by_text: dict[str, list] = {}
    for r in joined:
        by_text.setdefault(r["text"], []).append(r["fps"])
    dup_groups = [v for v in by_text.values() if len(v) > 1]
    for group in dup_groups:
        assert all(g == group[0] for g in group)
    # fingerprints are a subset of trigram count (selection, not expansion)
    for r in joined:
        n_words = len(r["text"].split(" "))
        assert len(r["fps"]) <= max(n_words - 2, 1)


def test_text_normalize_is_canonical(spark, sf_dir):
    rows = registry.QUERIES["text_normalize"](spark, sf_dir).collect()
    for r in rows[:200]:
        t = r["norm_text"]
        assert t == t.lower()
        assert "  " not in t
        assert t == t.strip()
        assert all(c.isalnum() or c == " " for c in t)
        assert r["norm_chars"] == len(t)


def test_repetition_stats_bounds(spark, sf_dir):
    rows = registry.QUERIES["repetition_stats"](spark, sf_dir).collect()
    token_rows = {
        r["doc_id"]: r["n_words"]
        for r in registry.QUERIES["token_stats"](spark, sf_dir).collect()
    }
    for r in rows:
        assert 0.0 < r["top_trigram_frac"] <= 1.0
        assert 0.0 <= r["dup_trigram_frac"] <= 1.0
        # a trigram counted in top_trigram_frac with n>1 also counts as dup
        n_words = token_rows[r["doc_id"]]
        assert r["n_trigrams"] == max(n_words - 2, 1)


def test_pii_masking_leaks_nothing(spark, sf_dir):
    rows = registry.QUERIES["pii_masking"](spark, sf_dir).collect()
    from streams_prototyping_spark.data import load_table

    n_customers = load_table(spark, sf_dir, "customer").count()
    assert len(rows) == n_customers
    surrogates = {r["surrogate_id"] for r in rows}
    assert len(surrogates) == n_customers  # stable AND collision-free here
    for r in rows[:200]:
        assert not any(ch.isdigit() for ch in r["name_masked"])


def test_decontamination_pairs_cross_eval_boundary(spark, sf_dir):
    from streams_prototyping_spark.functions.curation import EVAL_SOURCE, MIN_SHARED_FPS

    docs = {
        r["doc_id"]: r["source"]
        for r in registry.QUERIES["winnowing_fingerprint"](spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    rows = registry.QUERIES["decontamination_overlap"](spark, sf_dir).collect()
    assert rows, "synthetic corpus should produce at least one overlap pair"
    for r in rows:
        assert docs[r["train_doc_id"]] != EVAL_SOURCE
        assert docs[r["eval_doc_id"]] == EVAL_SOURCE
        assert r["n_shared_fps"] >= MIN_SHARED_FPS


def test_mixture_weights_form_a_distribution(spark, sf_dir):
    rows = registry.QUERIES["domain_mixture_weights"](spark, sf_dir).collect()
    assert len(rows) > 1
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["mixture_weight"] for r in rows) - 1.0) < 1e-4
    # temperature < 1 flattens: the head domain is down-weighted
    # relative to its share, the tail domain up-weighted
    head = max(rows, key=lambda r: r["token_share"])
    tail = min(rows, key=lambda r: r["token_share"])
    assert head["mixture_weight"] <= head["token_share"] + 1e-9
    assert tail["mixture_weight"] >= tail["token_share"] - 1e-9


def test_sequence_packing_invariants(spark, sf_dir):
    from streams_prototyping_spark.functions.packing import CTX_TOKENS

    rows = sorted(
        registry.QUERIES["sequence_packing"](spark, sf_dir).collect(),
        key=lambda r: r["doc_id"],
    )
    cum = 0
    for r in rows:
        assert r["offset_in_bin"] == cum % CTX_TOKENS
        assert r["bin_id"] == cum // CTX_TOKENS
        cum += r["n_tokens"]
    # bins are contiguous from 0
    bins = {r["bin_id"] for r in rows}
    assert bins == set(range(max(bins) + 1))


def test_token_budget_is_tight_and_quality_ordered(spark, sf_dir):
    from streams_prototyping_spark.functions.packing import TOKEN_BUDGET

    kept = registry.QUERIES["token_budget_select"](spark, sf_dir).collect()
    assert kept, "budget should admit at least one doc"
    total = sum(r["n_tokens"] for r in kept)
    assert total <= TOKEN_BUDGET
    # every kept doc has quality >= every dropped doc (prefix property)
    all_q = {
        r["doc_id"]: r["quality_score"]
        for r in registry.QUERIES["quality_score"](spark, sf_dir).collect()
    }
    kept_ids = {r["doc_id"] for r in kept}
    min_kept_q = min(r["q"] for r in kept)
    dropped_better = [
        d for d, q in all_q.items() if d not in kept_ids and q > min_kept_q
    ]
    assert not dropped_better, f"higher-quality docs dropped: {dropped_better[:5]}"
