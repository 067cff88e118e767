"""Semantic + plan tests for the corpus-stats and clustering operators
(boilerplate_phrases, gopher_quality_filter, unigram_logprob,
kmeans_lloyd, kmeans_cluster_profile). Oracle parity is covered by
test_oracle_parity; these assert the properties parity can't see:
plan shape at scale and algebraic invariants."""

import math

import pytest
from pyspark.sql import functions as F

from streams_prototyping_spark import registry
from streams_prototyping_spark.functions.clustering import DIM, K_CELLS
from streams_prototyping_spark.plans.introspect import plan_facts

registry.load_all()


def test_gopher_filter_is_narrow(spark, sf_dir):
    """All Gopher features are per-row folds: no shuffle, no join."""
    facts = plan_facts(registry.QUERIES["gopher_quality_filter"](spark, sf_dir))
    assert facts.shuffles == 0
    assert facts.broadcast_joins == 0 and facts.sort_merge_joins == 0
    assert not facts.has_python


def test_gopher_verdict_consistent(spark, sf_dir):
    rows = registry.QUERIES["gopher_quality_filter"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        expected = (
            r.r_word_count and r.r_mean_wlen and r.r_stopwords
            and r.r_max_wlen and r.r_top_word
        )
        assert r.passes == expected
        assert 0.0 < r.top_word_frac <= 1.0
    # the thresholds must actually discriminate on this corpus
    assert {r.passes for r in rows} == {True, False}


def test_boilerplate_is_keyed_join(spark, sf_dir):
    """Boilerplate join-back is keyed on gram — never a doc cross
    product — and fractions are well-formed."""
    df = registry.QUERIES["boilerplate_phrases"](spark, sf_dir)
    facts = plan_facts(df)
    assert not facts.has_cartesian
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_boiler_grams <= r.n_grams
        assert 0.0 <= r.boiler_frac <= 1.0
    # threshold must bite: some but not all grams are boilerplate
    assert any(r.n_boiler_grams > 0 for r in rows)
    assert any(r.n_boiler_grams < r.n_grams for r in rows)


def test_unigram_logprob_invariants(spark, sf_dir):
    """NLL is positive (p < 1 for every token) and min <= mean <= max;
    the frequency table is broadcast, the token stream never re-shuffles."""
    df = registry.QUERIES["unigram_logprob"](spark, sf_dir)
    facts = plan_facts(df)
    assert facts.broadcast_joins >= 1  # freq + total lookup sides
    assert not facts.has_cartesian
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.min_nll <= r.mean_nll <= r.max_nll
        assert r.min_nll > 0.0


def test_kmeans_assignment_shape(spark, sf_dir):
    """Every vector lands in exactly one live cell; distances are
    non-negative; no cartesian product (the K-row side is broadcast)."""
    df = registry.QUERIES["kmeans_lloyd"](spark, sf_dir)
    facts = plan_facts(df)
    assert not facts.has_cartesian
    rows = df.collect()
    n_vecs = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    )
    assert len(rows) == n_vecs  # one assignment per vector
    cells = {r.cell for r in rows}
    assert cells <= set(range(K_CELLS))
    assert len(cells) > 1  # clustering actually split the data
    assert all(r.sq_dist >= 0.0 for r in rows)


def test_kmeans_iterations_reduce_inertia(spark, sf_dir):
    """Lloyd's guarantee: total inertia is non-increasing across
    iterations. Computed directly with the module's own building
    blocks at N_ITERS=0 vs N_ITERS=2."""
    from streams_prototyping_spark.data import load_table
    from streams_prototyping_spark.functions.clustering import _assign, _recenter

    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    cent0 = vecs.filter(F.col("vec_id") < K_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("v").alias("cv")
    )
    inertia0 = _assign(vecs, cent0).agg(F.sum("sqd")).collect()[0][0]
    cent2 = _recenter(_assign(vecs, _recenter(_assign(vecs, cent0))))
    inertia2 = _assign(vecs, cent2).agg(F.sum("sqd")).collect()[0][0]
    assert inertia2 <= inertia0 + 1e-9


def test_kmeans_profile_consistent_with_assignment(spark, sf_dir):
    prof = {
        r.cell: r
        for r in registry.QUERIES["kmeans_cluster_profile"](spark, sf_dir).collect()
    }
    assign = registry.QUERIES["kmeans_lloyd"](spark, sf_dir).collect()
    sizes: dict[int, int] = {}
    inertia: dict[int, float] = {}
    for r in assign:
        sizes[r.cell] = sizes.get(r.cell, 0) + 1
        inertia[r.cell] = inertia.get(r.cell, 0.0) + r.sq_dist
    assert set(prof) == set(sizes)
    for cell, p in prof.items():
        assert p.n_members == sizes[cell]
        assert math.isclose(p.inertia, inertia[cell], rel_tol=0, abs_tol=1e-4)


def test_pq_code_shape(spark, sf_dir):
    """PQ codes have M_SUB fields, all < K_PQ; codebook members encode
    themselves with zero reconstruction error."""
    from streams_prototyping_spark.functions.clustering import K_PQ, M_SUB

    rows = registry.QUERIES["pq_encode"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        parts = r.pq_code.split("-")
        assert len(parts) == M_SUB
        assert all(0 <= int(p) < K_PQ for p in parts)
        assert r.recon_sq_err >= 0.0
    by_id = {r.vec_id: r for r in rows}
    for i in range(K_PQ):
        assert by_id[i].recon_sq_err == 0.0
        assert by_id[i].pq_code == "-".join([str(i)] * M_SUB)


def test_collocation_pmi_symmetric_marginals(spark, sf_dir):
    """PMI recomputes from its own reported marginals; counts respect
    the min-count threshold."""
    from streams_prototyping_spark.functions.corpus_stats import PMI_MIN_COUNT

    rows = registry.QUERIES["collocation_pmi"](spark, sf_dir).collect()
    assert rows
    n_uni = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split("text", " ")))
        .count()
    )
    for r in rows:
        assert r.n_bigram >= PMI_MIN_COUNT
        assert r.n_w1 >= r.n_bigram and r.n_w2 >= r.n_bigram
        assert r.n_w1 <= n_uni


def test_tfidf_pairs_keyed_and_bounded(spark, sf_dir):
    """Similarity join must be keyed on term (no cartesian) and cosine
    stays in (0, 1]; pairs are canonical doc1 < doc2."""
    df = registry.QUERIES["tfidf_cosine_pairs"](spark, sf_dir)
    facts = plan_facts(df)
    assert not facts.has_cartesian
    rows = df.collect()
    assert rows  # planted duplicates guarantee similar pairs exist
    for r in rows:
        assert r.doc1 < r.doc2
        assert 0.0 < r.cos_sim <= 1.0 + 1e-9
        assert r.n_shared_terms >= 1


def test_curation_select_invariants(spark, sf_dir):
    """Every doc gets exactly one verdict; eval-source docs are always
    held out; kept docs are unique per normalized content; keep <=>
    reason == 'kept'."""
    from streams_prototyping_spark.functions.curation import EVAL_SOURCE

    sel = {r.doc_id: r for r in
           registry.QUERIES["curation_pipeline_select"](spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    assert len(sel) == len(docs)
    norm = {r.doc_id: r.norm_md5 for r in
            registry.QUERIES["text_normalize"](spark, sf_dir).collect()}
    kept_hashes = set()
    for d in docs:
        r = sel[d.doc_id]
        assert r.keep == (r.reason == "kept")
        if d.source == EVAL_SOURCE:
            assert r.reason == "eval_holdout"
        if r.keep:
            h = norm[d.doc_id]
            assert h not in kept_hashes  # one survivor per content group
            kept_hashes.add(h)
    reasons = {r.reason for r in sel.values()}
    assert "kept" in reasons and "quality" in reasons and "eval_holdout" in reasons


def test_source_report_consistent(spark, sf_dir):
    """Report rows cover every source; rates/fractions in [0,1]; doc
    counts sum to the corpus size."""
    rows = registry.QUERIES["source_quality_report"](spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert 0.0 <= r.gopher_pass_rate <= 1.0
        assert 0.0 <= r.mean_quality <= 1.0
        assert 0.0 <= r.mean_boiler_frac <= 1.0
        assert r.mean_doc_nll > 0.0


def test_mad_outliers_invariants(spark, sf_dir):
    """Median members get z=0; outlier flag matches |z| threshold
    recomputed from the row's own values; outliers are rare."""
    rows = registry.QUERIES["value_outliers_mad"](spark, sf_dir).collect()
    assert rows
    n_out = sum(1 for r in rows if r.is_outlier)
    assert n_out < 0.1 * len(rows)  # robust gate must not fire en masse
    assert any(abs(r.robust_z) < 0.01 for r in rows)  # near-median mass exists


def test_collapse_repeats_no_adjacent_dups(spark, sf_dir):
    """After one pass no immediate unigram repeat survives (original-
    position masking still catches whole runs), and word accounting
    holds: kept + removed = original."""
    rows = registry.QUERIES["collapse_repeats"](spark, sf_dir).collect()
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    assert rows
    removed_any = False
    for r in rows:
        words = r.clean_text.split(" ")
        assert all(a != b for a, b in zip(words, words[1:]))
        assert len(words) + r.n_removed == len(docs[r.doc_id].split(" "))
        removed_any = removed_any or r.n_removed > 0
    assert removed_any  # the corpus does contain immediate repeats


def test_nll_deciles_partition_corpus(spark, sf_dir):
    """Deciles cover every doc once with non-overlapping, ordered NLL
    ranges."""
    rows = sorted(
        registry.QUERIES["nll_decile_stats"](spark, sf_dir).collect(),
        key=lambda r: r.decile,
    )
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == total
    assert [r.decile for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a.min_nll <= a.max_nll <= b.min_nll + 1e-9


def test_lsh_bucket_stats_predicts_pair_workload(spark, sf_dir):
    """The audit's candidate-pair total bounds the distinct LSH pairs
    (pairs colliding in several bands are counted once downstream)."""
    from streams_prototyping_spark.functions.dedup import N_BANDS

    stats = registry.QUERIES["lsh_bucket_stats"](spark, sf_dir).collect()
    assert len(stats) == N_BANDS
    workload = sum(r.candidate_pairs for r in stats)
    distinct_pairs = registry.QUERIES["minhash_lsh_pairs"](spark, sf_dir).count()
    assert distinct_pairs <= workload
    for r in stats:
        assert r.n_colliding_buckets <= r.n_buckets
        assert r.max_bucket_size >= 1


def test_adc_matches_code_reconstruction(spark, sf_dir):
    """ADC's table-lookup sum must equal the distance to the candidate's
    PQ reconstruction, recomputed independently from pq_encode's codes
    and the raw embeddings (Jegou eq. 13 — the defining property of
    asymmetric distance)."""
    from streams_prototyping_spark.functions.clustering import (
        K_PQ,
        M_SUB,
        PQ_N_QUERIES,
        SUB_DIM,
    )

    adc_rows = registry.QUERIES["pq_adc_topk"](spark, sf_dir).collect()
    assert adc_rows
    assert {r.query_id for r in adc_rows} == set(range(PQ_N_QUERIES))
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    codes = {
        r.vec_id: [int(c) for c in r.pq_code.split("-")]
        for r in registry.QUERIES["pq_encode"](spark, sf_dir).collect()
    }
    def sub(v, m):
        return v[m * SUB_DIM:(m + 1) * SUB_DIM]

    for r in adc_rows:
        q = emb[r.query_id]
        code = codes[r.vec_id]
        assert all(0 <= c < K_PQ for c in code)
        expect = sum(
            sum((a - b) ** 2 for a, b in zip(sub(q, m), sub(emb[code[m]], m)))
            for m in range(M_SUB)
        )
        assert abs(r.adc_sq_dist - expect) < 1e-4


def test_ann_recall_probing_dominates(spark, sf_dir):
    """Widening the search (multi-probe / nprobe) can only add
    candidates, so recall must not decrease; recall stays in [0,1]."""
    rows = registry.QUERIES["ann_recall_report"](spark, sf_dir).collect()
    by = {(r.method, r.query_id): r.recall for r in rows}
    queries = {q for m, q in by}
    assert len(queries) == 5 and len(by) == 25  # 5 methods incl. ivf_pq
    for q in queries:
        assert by[("lsh_multiprobe", q)] >= by[("lsh", q)]
        assert by[("ivf_nprobe", q)] >= by[("ivf", q)]
    assert all(0.0 <= r.recall <= 1.0 for r in rows)


def test_tfidf_postings_stage_is_cached(spark, sf_dir):
    """The weighted-postings build must come from the shared cached
    stage — four consumers re-deriving it is the measured 4x plan blow-
    up this guards against."""
    from streams_prototyping_spark.plans.introspect import explain_str

    df = registry.QUERIES["tfidf_cosine_pairs"](spark, sf_dir)
    assert explain_str(df, "simple").count("InMemoryTableScan") >= 4


def test_payload_dedup_groups_consistent(spark, sf_dir):
    """The group map covers every document exactly once; each group has
    exactly one canonical member (its minimum doc_id) and a copy count
    matching its membership."""
    rows = registry.QUERIES["multimodal_payload_dedup"](spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == total
    by_md5: dict[str, list] = {}
    for r in rows:
        by_md5.setdefault(r.payload_md5, []).append(r)
    for members in by_md5.values():
        assert len(members) == members[0].n_copies >= 1
        canon = [m for m in members if m.is_canonical]
        assert len(canon) == 1
        assert canon[0].doc_id == min(m.doc_id for m in members)


def test_embedding_dim_matches_constant(spark, sf_dir):
    """The oracle unrolls DIM in SQL; fail loudly if testdata changes."""
    d = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(F.size("embedding").alias("n"))
        .distinct()
        .collect()
    )
    assert [r.n for r in d] == [DIM]
