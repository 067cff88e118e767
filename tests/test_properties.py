"""Property-based invariants (SURVEY §5.4) with hypothesis. Each
example round-trips through a real Spark job, so example counts are
kept small; the properties target the contracts other tests assume:
the portable hash, the CSV codec, window-partition completeness, and
CTR bounds."""

import math

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from streams_prototyping_spark.functions.portable_hash import (
    portable_hash64,
    portable_hash64_py,
)

_slow = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)

# printable, comma-free, non-empty (the delimited codec's documented domain)
_word = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters=","),
    min_size=1,
    max_size=24,
)


@_slow
@given(st.lists(_word, min_size=1, max_size=20, unique=True))
def test_portable_hash_spark_equals_python(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = {r.s: r.h for r in df.select("s", portable_hash64(F.col("s")).alias("h")).collect()}
    for t in texts:
        assert got[t] == portable_hash64_py(t)


@_slow
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10_000_000),          # epoch seconds
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_window_partition_is_complete(spark, rows):
    """Tumbling windows partition the stream: per-window counts/sums
    re-aggregate to the global count/sum (no row lost or duplicated)."""
    df = spark.createDataFrame(
        [(e, float(v)) for e, v in rows], "epoch long, value double"
    ).select(F.timestamp_seconds("epoch").alias("ts"), "value")
    per_window = df.groupBy(F.window("ts", "30 seconds")).agg(
        F.count(F.lit(1)).alias("n")
    )
    total = per_window.agg(F.sum("n")).first()[0]
    assert total == len(rows)


@_slow
@given(
    st.lists(st.tuples(st.integers(0, 5), st.booleans()), min_size=1, max_size=60)
)
def test_ctr_bounds(spark, rows):
    """Declared-semantics CTR is always within [0, 1]."""
    df = spark.createDataFrame(
        [(a, c) for a, c in rows], "ad_id int, was_clicked boolean"
    )
    ctr = df.groupBy("ad_id").agg(
        (
            F.count(F.when(F.col("was_clicked"), 1)).cast("double")
            / F.count(F.lit(1))
        ).alias("ctr")
    )
    for r in ctr.collect():
        assert 0.0 <= r.ctr <= 1.0 and not math.isnan(r.ctr)


@_slow
@given(
    st.lists(
        st.tuples(
            st.integers(-(2**40), 2**40),
            _word,
            st.floats(-1e9, 1e9, allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_delimited_codec_roundtrip(spark, rows):
    """encode -> decode is lossless for longs, comma-free strings and
    doubles (Java shortest-repr double strings parse back exactly)."""
    from pyspark.sql import types as T

    from streams_prototyping_spark.streaming.sources import (
        decode_delimited,
        encode_delimited,
    )

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame([(k, s, float(v)) for k, s, v in rows], schema)
    back = decode_delimited(encode_delimited(df), schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


_doc_text = st.lists(
    st.text(
        # include \t and \n: normalization must COLLAPSE non-space
        # whitespace, not delete it (deleting glues words together)
        alphabet=st.characters(
            min_codepoint=32, max_codepoint=126, include_characters="\t\n"
        ),
        min_size=0,
        max_size=12,
    ),
    min_size=1,
    max_size=30,
).map(" ".join)


@_slow
@given(st.lists(_doc_text, min_size=1, max_size=12))
def test_text_normalize_is_idempotent(spark, texts):
    """normalize(normalize(x)) == normalize(x) — the canonical form is
    a fixpoint, so re-ingesting already-normalized docs can't fork the
    dedup key."""
    from streams_prototyping_spark.functions.text_transform import norm_text_col

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    once = df.select(norm_text_col("text").alias("text"))
    twice = once.select(norm_text_col("text").alias("n2"), "text")
    for r in twice.collect():
        assert r["n2"] == r["text"]


@_slow
@given(st.lists(_doc_text, min_size=1, max_size=8))
def test_quality_score_bounds(spark, texts):
    from pyspark.sql import functions as F

    from streams_prototyping_spark.functions.text_transform import quality_score_col

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for r in df.select(quality_score_col("text").alias("q")).collect():
        assert r["q"] is None or 0.0 <= r["q"] <= 1.0


# three-way check: the collapse_repeats mask has a plain-Python
# reference; DuckDB must agree with it on arbitrary word lists (Spark
# agrees with DuckDB via the oracle-parity suite, closing the triangle).
_repeat_words = st.lists(
    st.sampled_from(["a", "b", "c", "ab"]), min_size=1, max_size=14
)


def _collapse_ref(words: list[str]) -> list[str]:
    out = []
    for i, w in enumerate(words):
        drop = (i >= 1 and w == words[i - 1]) or (
            i >= 3 and w == words[i - 2] and words[i - 1] == words[i - 3]
        )
        if not drop:
            out.append(w)
    return out


@given(_repeat_words)
@settings(max_examples=120, deadline=None)
def test_collapse_repeats_duckdb_matches_python_reference(words):
    import duckdb

    from streams_prototyping_spark.functions.text_transform import _CLEAN_DUCK

    text = " ".join(words)
    sql = "SELECT " + _CLEAN_DUCK.replace("text", "t.txt") + " AS clean FROM t"
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t AS SELECT ? AS txt", [text])
        got = con.execute(sql).fetchone()[0]
    finally:
        con.close()
    assert got == " ".join(_collapse_ref(words))


@_slow
@given(st.lists(_doc_text, min_size=1, max_size=10))
def test_span_dedup_matches_python_reference(spark, tmp_path_factory, texts):
    """Differential check of span_dedup against an independent Python
    reference (third implementation besides Spark and the DuckDB
    oracle): span flags, counts and the reassembled clean text must
    agree exactly."""
    from streams_prototyping_spark.functions.span_quality import (
        SPAN_MIN_DOCS,
        SPAN_W,
        span_dedup,
    )

    tmp = tmp_path_factory.mktemp("spans")
    docs = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    # python reference
    def spans_of(t):
        w = t.split(" ")
        n = max(-(-len(w) // SPAN_W), 1)
        return [" ".join(w[i * SPAN_W : i * SPAN_W + SPAN_W]) for i in range(n)]

    span_docs = {}
    for i, t in enumerate(texts):
        for sp in set(spans_of(t)):
            span_docs.setdefault(sp, set()).add(i)
    dup = {sp for sp, ds in span_docs.items() if len(ds) >= SPAN_MIN_DOCS}
    want = {}
    for i, t in enumerate(texts):
        sps = spans_of(t)
        keep = [sp for sp in sps if sp not in dup]
        ndup = sum(1 for sp in sps if sp in dup)
        want[i] = (len(sps), ndup, " ".join(keep))

    got = {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.clean_text)
        for r in span_dedup(spark, str(tmp)).collect()
    }
    assert got == want


@_slow
@given(st.lists(_doc_text, min_size=1, max_size=10))
def test_token_entropy_bounds(spark, tmp_path_factory, texts):
    """0 <= entropy <= ln(n_types) (uniform bound); ttr = types/tokens."""
    from streams_prototyping_spark.functions.span_quality import token_entropy

    tmp = tmp_path_factory.mktemp("entropy")
    docs = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    for r in token_entropy(spark, str(tmp)).collect():
        assert r.n_types <= r.n_tokens
        assert abs(r.ttr - round(r.n_types / r.n_tokens, 6)) < 1e-9
        assert -1e-6 <= r.token_entropy <= math.log(r.n_types) + 1e-4


_dup_doc = st.lists(
    st.sampled_from(["a", "b", "c"]), min_size=1, max_size=40
).map(" ".join)


@_slow
@given(st.lists(_dup_doc, min_size=1, max_size=8))
def test_dup_substring_spans_matches_python_reference(
    spark, tmp_path_factory, texts
):
    """Differential check of dup_substring_spans against an independent
    Python reference (third implementation besides Spark and the DuckDB
    oracle): per-doc span counts, duplicated word totals, longest span
    and fraction must agree exactly. The 3-letter vocabulary makes
    DUP_K-gram collisions common, so both the hit path and the
    interval-union merge (overlapping windows -> one maximal span) are
    genuinely exercised."""
    from decimal import ROUND_HALF_UP, Decimal

    from streams_prototyping_spark.functions.span_quality import (
        DUP_K,
        dup_substring_spans,
    )

    tmp = tmp_path_factory.mktemp("dupspans")
    docs = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    grams: dict = {}
    for i, t in enumerate(texts):
        w = t.split(" ")
        for p in range(len(w) - DUP_K + 1):
            grams.setdefault(tuple(w[p : p + DUP_K]), set()).add(i)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    want = {}
    for i, t in enumerate(texts):
        w = t.split(" ")
        hits = [
            p
            for p in range(max(len(w) - DUP_K + 1, 0))
            if tuple(w[p : p + DUP_K]) in dup
        ]
        spans: list = []
        for p in hits:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + DUP_K - 1)
            else:
                spans.append([p, p + DUP_K - 1])
        dw = sum(e - s + 1 for s, e in spans)
        longest = max((e - s + 1 for s, e in spans), default=0)
        frac = float(
            Decimal(repr(dw / len(w))).quantize(
                Decimal("0.000001"), ROUND_HALF_UP
            )
        )
        want[i] = (len(w), len(spans), dw, longest, frac)

    got = {
        r.doc_id: (r.n_words, r.n_dup_spans, r.dup_words, r.longest_dup_span, r.dup_frac)
        for r in dup_substring_spans(spark, str(tmp)).collect()
    }
    assert got == want


@_slow
@given(st.lists(_dup_doc, min_size=1, max_size=8))
def test_dup_span_catalog_matches_python_reference(
    spark, tmp_path_factory, texts
):
    """The catalog's span texts and doc/occurrence counts must equal an
    independent Python reconstruction of the maximal-island texts."""
    from streams_prototyping_spark.functions.span_quality import (
        DUP_K,
        dup_span_catalog,
    )

    tmp = tmp_path_factory.mktemp("dupcat")
    docs = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    grams: dict = {}
    for i, t in enumerate(texts):
        w = t.split(" ")
        for p in range(len(w) - DUP_K + 1):
            grams.setdefault(tuple(w[p : p + DUP_K]), set()).add(i)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    want: dict = {}
    for i, t in enumerate(texts):
        w = t.split(" ")
        hits = [
            p
            for p in range(max(len(w) - DUP_K + 1, 0))
            if tuple(w[p : p + DUP_K]) in dup
        ]
        spans: list = []
        for p in hits:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + DUP_K - 1)
            else:
                spans.append([p, p + DUP_K - 1])
        for s, e in spans:
            text = " ".join(w[s : e + 1])
            n_docs, n_occ = want.get(text, (set(), 0))
            n_docs.add(i)
            want[text] = (n_docs, n_occ + 1)

    got = {
        r.span_text: (r.span_words, r.n_docs, r.n_occurrences)
        for r in dup_span_catalog(spark, str(tmp)).collect()
    }
    assert got == {
        text: (len(text.split(" ")), len(ds), occ)
        for text, (ds, occ) in want.items()
    }
