"""operators/terms.py — TF-IDF salience behavior."""

from entity_resolution_spark.operators.terms import (
    document_frequency,
    term_counts,
    tfidf_top_terms,
)


def _corpus(spark):
    rows = [
        (1, "spark spark spark shuffle join"),
        (2, "the the the the shuffle join common words"),
        (3, "the common words appear everywhere join"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_term_counts_and_df(spark):
    docs = _corpus(spark)
    tf = {(r["id"], r["term"]): r["tf"] for r in term_counts(docs).collect()}
    assert tf[(1, "spark")] == 3 and tf[(2, "the")] == 4
    df = {r["term"]: r["df"] for r in document_frequency(term_counts(docs)).collect()}
    assert df["join"] == 3 and df["spark"] == 1


def test_tfidf_prefers_distinctive_terms(spark):
    docs = _corpus(spark)
    top = tfidf_top_terms(docs, k=1).collect()
    best = {r["doc_id"]: r["term"] for r in top}
    # doc 1's salient term is its unique repeated 'spark', not shared 'join'
    assert best[1] == "spark"
    # corpus-wide 'join' (df=3) is never anyone's most salient term
    assert "join" not in best.values()


def test_tfidf_plan_has_no_python(spark):
    docs = _corpus(spark)
    plan = tfidf_top_terms(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_bm25_hand_computed(spark):
    """Single-term query over a 3-doc corpus: verify the Lucene-idf BM25
    score against a hand-derived value and the (score desc, id asc) order."""
    import math

    from entity_resolution_spark.operators.terms import bm25_topk

    docs = _corpus(spark)
    out = bm25_topk(docs, [("q", "spark")], k=10).collect()
    # only doc 1 contains 'spark'
    assert [(r["query_id"], r["doc_id"], r["rank"]) for r in out] == [("q", 1, 1)]
    # hand computation: N=3, df=1, tf=3, dl=5, avgdl=(5+8+6)/3
    idf = math.log(1.0 + (3 - 1 + 0.5) / (1 + 0.5))
    denom = 3 + 1.2 * (1 - 0.75 + 0.75 * 5 / (19 / 3))
    expected = round(round(idf * 3 * 2.2 / denom * 1e6) / 1e6, 6)
    assert abs(out[0]["score"] - expected) < 1e-9


def test_bm25_multi_term_ranking_and_ties(spark):
    """Multi-term query: docs matching more/rarer terms rank first; the
    shared-term-only doc still appears; ranks are dense 1..n."""
    from entity_resolution_spark.operators.terms import bm25_topk

    docs = _corpus(spark)
    out = bm25_topk(docs, [("q", "spark shuffle")], k=10).collect()
    got = {r["doc_id"]: r["rank"] for r in out}
    assert set(got) == {1, 2}  # doc 3 has neither term
    assert got[1] == 1  # doc 1 matches both terms (incl. rare 'spark')
    assert sorted(r["rank"] for r in out) == [1, 2]


def test_bm25_term_shared_across_queries_df_not_doubled(spark):
    """A term appearing in two queries must not double its df: both queries
    see the same single-query score for the same doc."""
    from entity_resolution_spark.operators.terms import bm25_topk

    docs = _corpus(spark)
    one = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_topk(docs, [("a", "spark")], k=10).collect()
    }
    two = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_topk(docs, [("a", "spark"), ("b", "spark words")], k=10).collect()
    }
    assert two[("a", 1)] == one[("a", 1)]


def test_bm25_partition_invariance(spark):
    """Quantized contributions make the score independent of partitioning."""
    from entity_resolution_spark.operators.terms import bm25_topk

    docs = _corpus(spark)
    a = sorted(map(tuple, bm25_topk(docs, [("q", "the join words")], k=10).collect()))
    b = sorted(
        map(tuple, bm25_topk(docs.repartition(7), [("q", "the join words")], k=10).collect())
    )
    assert a == b


def test_tfidf_query_topk_ranks_matching_docs(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.terms import tfidf_query_topk

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="apple banana apple"),
            Row(doc_id=2, text="banana cherry"),
            Row(doc_id=3, text="dog emu ferret grouse heron"),
            Row(doc_id=4, text="apple dog"),
        ]
    )
    out = tfidf_query_topk(docs, [("qa", "apple"), ("qd", "dog heron")], k=3)
    got = {
        (r["query_id"], r["rank"]): r["doc_id"] for r in out.collect()
    }
    # 'apple': doc1 (2 of 3 tokens) beats doc4 (1 of 2 but lower tf share?)
    assert set(k[0] for k in got) == {"qa", "qd"}
    assert got[("qa", 1)] in (1, 4)
    ranked_qa = [got[("qa", i)] for i in sorted(i for q, i in got if q == "qa")]
    assert set(ranked_qa) == {1, 4}  # only apple-bearing docs retrieved
    ranked_qd = [got[("qd", i)] for i in sorted(i for q, i in got if q == "qd")]
    assert ranked_qd[0] == 3  # matches both 'dog' and 'heron'


def test_rrf_fuse_hand_values(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.fusion import rrf_fuse

    a = spark.createDataFrame(
        [Row(query_id="q", doc_id=1, rank=1), Row(query_id="q", doc_id=2, rank=2)]
    )
    b = spark.createDataFrame(
        [Row(query_id="q", doc_id=2, rank=1), Row(query_id="q", doc_id=3, rank=2)]
    )
    got = {
        r["doc_id"]: (r["rrf_score"], r["rank"])
        for r in rrf_fuse([a, b], k=60).collect()
    }
    assert got[2] == (round(1 / 62 + 1 / 61, 6), 1)  # in both lists -> wins
    assert got[1] == (round(1 / 61, 6), 2)  # rank tie vs doc3 broken by id
    assert got[3] == (round(1 / 62, 6), 3)
    import pytest

    with pytest.raises(ValueError):
        rrf_fuse([], k=60)
    with pytest.raises(ValueError):
        rrf_fuse([a], k=0)


def test_pmi_collocations_hand_values(spark):
    import math

    from pyspark.sql import Row

    from entity_resolution_spark.operators.terms import pmi_collocations

    # 'new york' always adjacent; 'the cat' common words rarely adjacent
    docs = [Row(doc_id=i, text="new york " + "the cat " * 2) for i in range(5)]
    df = spark.createDataFrame(docs)
    got = {
        (r["w1"], r["w2"]): (r["pair_count"], r["pmi"])
        for r in pmi_collocations(df, min_count=5, k=10).collect()
    }
    # unigrams: new 5, york 5, the 10, cat 10; N = 30
    # bigrams: (new,york) 5, (york,the) 5, (the,cat) 10, (cat,the) 5
    assert got[("new", "york")] == (5, round(math.log(5 * 30 / (5 * 5)), 6))
    assert got[("the", "cat")] == (10, round(math.log(10 * 30 / (10 * 10)), 6))
    assert got[("new", "york")][1] > got[("the", "cat")][1]
    import pytest

    with pytest.raises(ValueError):
        pmi_collocations(df, min_count=0)
