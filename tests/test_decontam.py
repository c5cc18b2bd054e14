"""Test-set decontamination operator (operators/decontam.py)."""

from pyspark.sql import functions as F

from entity_resolution_spark.operators.decontam import ngram_contamination


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_fractions(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox went home"),  # 2 of 4 grams hit
            (2, "completely unrelated words entirely different text"),
            (3, "the quick brown fox jumps over the lazy dog"),  # fully contained
            (4, "too short"),  # < n tokens -> excluded
        ],
    )
    out = {r.doc_id: r for r in ngram_contamination(docs, bench, n=3).collect()}
    assert set(out) == {1, 2, 3}
    # "the quick brown" and "quick brown fox" are both benchmark grams
    assert out[1].total_grams == 4 and out[1].hit_grams == 2
    assert out[2].hit_grams == 0 and out[2].contamination == 0.0
    assert out[3].contamination == 1.0


def test_repeated_phrase_counts_once(spark):
    """Distinct-before-explode: a doc repeating one benchmark phrase 50x
    reports ONE hit gram, not 50 — the linearity guarantee at scale."""
    bench = _docs(spark, [(100, "stack overflow copy paste")])
    docs = _docs(spark, [(1, " ".join(["stack overflow copy paste"] * 50))])
    row = ngram_contamination(docs, bench, n=4).collect()[0]
    # grams of the repetition: the 4-gram cycle has 4 distinct rotations
    assert row.hit_grams == 1  # only the exact benchmark gram itself
    assert row.total_grams == 4
    assert row.contamination == 0.25


def test_empty_benchmark_gives_zero(spark):
    bench = _docs(spark, []).filter(F.lit(False))
    docs = _docs(spark, [(1, "a b c d e f")])
    row = ngram_contamination(docs, bench, n=3).collect()[0]
    assert row.hit_grams == 0 and row.contamination == 0.0


def test_plan_broadcasts_benchmark_and_stays_jvm(spark):
    """The corpus side must never shuffle for the probe: benchmark grams
    broadcast, and the whole plan is JVM expressions (no Python)."""
    bench = _docs(spark, [(100, "a b c d")])
    docs = _docs(spark, [(1, "a b c d e")])
    plan = (
        ngram_contamination(docs, bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan
