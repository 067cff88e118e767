"""Corpus-mining operator tests: RAKE scoring identities, overlap
matrix symmetry bounds, Heaps-curve monotonicity, plan shapes."""

from streams_prototyping_spark import registry
from streams_prototyping_spark.functions.text import EN_STOPWORDS
from streams_prototyping_spark.plans.introspect import plan_facts

registry.load_all()


def test_rake_scores_and_no_stopwords(spark, sf_dir):
    rows = registry.QUERIES["rake_keywords"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.word not in EN_STOPWORDS
        assert r.degree >= r.freq  # phrase length >= 1
        assert abs(r.rake_score - r.degree / r.freq) < 1e-5
    # ranked by score descending
    scores = [r.rake_score for r in sorted(rows, key=lambda r: r.rnk)]
    assert all(a >= b - 1e-9 for a, b in zip(scores, scores[1:]))


def test_vocab_overlap_bounds(spark, sf_dir):
    rows = registry.QUERIES["source_vocab_overlap"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.source_a < r.source_b
        assert r.inter <= min(r.vocab_a, r.vocab_b)
        assert 0.0 < r.jaccard <= 1.0
        assert r.jaccard <= r.overlap_coef <= 1.0  # Jaccard <= Simpson


def test_heaps_curve_sane(spark, sf_dir):
    row = registry.QUERIES["heaps_law_fit"](spark, sf_dir).collect()[0]
    assert row.total_vocab <= row.total_tokens
    assert row.n_points > 0
    # sublinear vocabulary growth: 0 < beta < 1 for natural-ish corpora
    assert 0.0 < row.heaps_beta < 1.0


def test_text_mining_plans_jvm_side(spark, sf_dir):
    for name in ("rake_keywords", "source_vocab_overlap", "heaps_law_fit"):
        facts = plan_facts(registry.QUERIES[name](spark, sf_dir))
        assert not facts.has_python, name
        assert not facts.has_cartesian, name
