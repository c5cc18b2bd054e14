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
