"""Round-5b operator tests: SQ8 scalar quantization invariants,
positional phrase-search semantics, MMR rerank properties, snapshot
diff composition, JSON codec losslessness — plus the plan-shape pins
(no cartesians; broadcast where the design says broadcast; TakeOrdered
instead of a global single-partition window for the phrase pick)."""

import pyspark.sql.functions as F

from streams_prototyping_spark import registry
from streams_prototyping_spark.data import load_table
from streams_prototyping_spark.plans.introspect import plan_facts

registry.load_all()


# ------------------------------------------------------------- SQ8

def test_sq8_codes_bound_and_mse_small(spark, sf_dir):
    rows = registry.QUERIES["sq8_encode"](spark, sf_dir).collect()
    assert rows
    d = 64
    for r in rows:
        # 64 dims x code<=255
        assert 0 <= r.code_sum <= 255 * d, r
        assert r.mse is not None and r.mse >= 0
    # 8-bit over per-dim min/max: quantization step is (mx-mn)/255, so
    # per-dim squared error <= (step/2)^2 — tiny relative to unit-ish
    # embeddings. Guard against a broken scale with a loose bound.
    assert max(r.mse for r in rows) < 1e-3


def test_sq8_adc_recall_vs_exact(spark, sf_dir):
    """Asymmetric SQ8 search must agree with the exact ranking almost
    everywhere — 8-bit quantization should cost little recall@5."""
    exact = registry.QUERIES["cosine_topk"](spark, sf_dir).collect()
    sq = registry.QUERIES["sq8_adc_topk"](spark, sf_dir).collect()
    by_q_exact = {}
    for r in exact:
        by_q_exact.setdefault(r.query_id, set()).add(r.vec_id)
    by_q_sq = {}
    for r in sq:
        by_q_sq.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(by_q_sq) == set(by_q_exact)
    total = hits = 0
    for q, want in by_q_exact.items():
        got = by_q_sq[q]
        total += len(want)
        hits += len(want & got)
    assert hits / total >= 0.8, f"SQ8 recall@5 collapsed: {hits}/{total}"


def test_sq8_plan_broadcasts_and_no_cartesian(spark, sf_dir):
    from streams_prototyping_spark.plans.introspect import explain_str

    df = registry.QUERIES["sq8_adc_topk"](spark, sf_dir)
    facts = plan_facts(df)
    assert not facts.has_cartesian
    # the non-equi self-exclusion join must ship the QUERY side as the
    # broadcast build (BroadcastNestedLoopJoin BuildRight), never a
    # cartesian over candidates
    assert "BroadcastNestedLoopJoin BuildRight" in explain_str(df, "simple")


# ----------------------------------------------------- phrase search

def test_phrase_search_matches_python_reference(spark, sf_dir):
    """Independent Python recount: for every reported (phrase, doc),
    the occurrence count equals a sliding-window scan of the raw text;
    and the phrases really are the top bigrams."""
    rows = registry.QUERIES["phrase_search_positional"](spark, sf_dir).collect()
    assert rows
    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    from collections import Counter

    bigrams = Counter()
    for words in docs.values():
        for i in range(len(words) - 1):
            bigrams[(words[i], words[i + 1])] += 1
    top = sorted(bigrams.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    want_phrases = {" ".join(k) for k, _ in top}
    assert {r.phrase for r in rows} == want_phrases
    for r in rows:
        w1, w2 = r.phrase.split(" ")
        words = docs[r.doc_id]
        n = sum(
            1
            for i in range(len(words) - 1)
            if words[i] == w1 and words[i + 1] == w2
        )
        assert n == r.n_occ, (r.phrase, r.doc_id, n, r.n_occ)
    # rank is dense 1..k per phrase, by n_occ desc
    by_phrase = {}
    for r in rows:
        by_phrase.setdefault(r.phrase, []).append(r)
    for ph, rs in by_phrase.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        occs = [r.n_occ for r in rs]
        assert occs == sorted(occs, reverse=True)


def test_phrase_search_plan_no_global_window(spark, sf_dir):
    """The top-N phrase pick must plan as TakeOrdered, not a
    single-partition global Window (the scale trap the implementation
    deliberately avoids)."""
    from streams_prototyping_spark.plans.introspect import explain_str

    df = registry.QUERIES["phrase_search_positional"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in plan
    facts = plan_facts(df)
    assert not facts.has_cartesian


# ------------------------------------------------------------- MMR

def test_mmr_rerank_greedy_property(spark, sf_dir):
    """Python re-simulation of the greedy loop over the same candidate
    pool and similarities — the DataFrame unroll must pick identical
    vectors in identical order for every query."""
    rows = registry.QUERIES["mmr_rerank"](spark, sf_dir).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)

    # rebuild rel + sims from the exact embeddings
    vecs = {
        r.vec_id: r.embedding
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def cos(a, b):
        av = [float(x) for x in a]
        bv = [float(x) for x in b]
        dot = sum(x * y for x, y in zip(av, bv))
        na = sum(x * x for x in av) ** 0.5
        nb = sum(x * x for x in bv) ** 0.5
        return round(dot / (na * nb), 6)

    from streams_prototyping_spark.functions.retrieval_eval import MMR_CAND, MMR_K
    from streams_prototyping_spark.functions.similarity import N_QUERIES

    for q in range(N_QUERIES):
        rel = {
            v: cos(vecs[q], vec) for v, vec in vecs.items() if v != q
        }
        cand = sorted(rel, key=lambda v: (-rel[v], v))[:MMR_CAND]
        sel = []
        # seed: argmax rel
        sel.append(min(cand, key=lambda v: (-rel[v], v)))
        while len(sel) < MMR_K:
            rem = [v for v in cand if v not in sel]
            best = min(
                rem,
                key=lambda v: (
                    -round(
                        0.7 * rel[v]
                        - 0.3 * max(cos(vecs[v], vecs[s]) for s in sel),
                        6,
                    ),
                    v,
                ),
            )
            sel.append(best)
        got = [r.vec_id for r in sorted(by_q[q], key=lambda r: r.mmr_rank)]
        assert got == sel, (q, got, sel)


def test_mmr_is_more_diverse_than_topk(spark, sf_dir):
    """The point of MMR: average pairwise similarity among its picks
    must not exceed that of the plain top-k picks (same k)."""
    from streams_prototyping_spark.functions.retrieval_eval import MMR_K

    mmr = registry.QUERIES["mmr_rerank"](spark, sf_dir).collect()
    exact = registry.QUERIES["cosine_topk"](spark, sf_dir).collect()
    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb)

    def avg_pair_sim(ids):
        sims = [
            cos(vecs[a], vecs[b]) for a in ids for b in ids if a < b
        ]
        return sum(sims) / len(sims)

    by_q_mmr, by_q_top = {}, {}
    for r in mmr:
        by_q_mmr.setdefault(r.query_id, []).append(r.vec_id)
    for r in exact:
        if r.rnk <= MMR_K:
            by_q_top.setdefault(r.query_id, []).append(r.vec_id)
    worse = 0
    for q in by_q_mmr:
        if avg_pair_sim(by_q_mmr[q]) > avg_pair_sim(by_q_top[q]) + 1e-9:
            worse += 1
    assert worse == 0, f"MMR picks less diverse than top-k for {worse} queries"


# ----------------------------------------------------- snapshot diff

def test_table_diff_composition(spark, sf_dir):
    """The synthesized version-B rules imply exact expected counts —
    recompute them independently from the hash rules and match."""
    import hashlib

    rows = {
        r.status: r
        for r in registry.QUERIES["table_diff_audit"](spark, sf_dir).collect()
    }
    keys = [
        r.o_orderkey
        for r in load_table(spark, sf_dir, "orders").select("o_orderkey").collect()
    ]

    def h(k):
        return int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)

    removed = sum(1 for k in keys if h(k) % 100 == 0)
    changed = sum(1 for k in keys if h(k) % 100 in (1, 2))
    added = sum(1 for k in keys if h(k) % 97 == 3)
    unchanged = len(keys) - removed - changed
    assert rows["removed"].n_rows == removed
    assert rows["changed"].n_rows == changed
    assert rows["added"].n_rows == added
    assert rows["unchanged"].n_rows == unchanged
    # changed checksum reflects the +100-cent mutation exactly
    assert set(rows) == {"added", "removed", "changed", "unchanged"}


# ------------------------------------------------------- JSON codec

def test_json_roundtrip_lossless(spark, sf_dir):
    got = registry.QUERIES["json_roundtrip"](spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    want = orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
    )
    assert got.schema == want.schema
    diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    assert diff == 0
