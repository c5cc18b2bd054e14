"""Unit semantics for operators/cross_corpus.py."""

from pyspark.sql import Row

from entity_resolution_spark.operators.cross_corpus import (
    cross_corpus_minhash_pairs,
    novel_documents,
)

_BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "a slow waltz in the evening light and the crowd watches quietly "
    "from the wooden benches near the river bank under the old bridge"
)


def _frames(spark):
    new = spark.createDataFrame(
        [
            Row(doc_id=100, text=_BASE),                      # dup of ref 1
            Row(doc_id=101, text=_BASE + " extra tail"),      # near-dup of ref 1
            Row(doc_id=102, text="completely different content about "
                                 "distributed query engines and shuffle "
                                 "partitioning strategies at petabyte scale "
                                 "with adaptive execution and skew handling"),
            Row(doc_id=103, text=_BASE),                      # dup of 100 (new-vs-new: must NOT pair)
        ]
    )
    ref = spark.createDataFrame(
        [
            Row(doc_id=1, text=_BASE),
            Row(doc_id=2, text="unrelated reference text talking about "
                               "gardening tips for tomato plants in clay "
                               "soil with drip irrigation and mulching "
                               "schedules through the summer months"),
        ]
    )
    return new, ref


def test_cross_pairs_find_dups_and_never_pair_within_a_side(spark):
    new, ref = _frames(spark)
    pairs = cross_corpus_minhash_pairs(new, ref, min_jaccard=0.7).collect()
    got = {(r.new_id, r.ref_id) for r in pairs}
    assert (100, 1) in got
    assert (101, 1) in got
    # new-vs-new (100 vs 103 are identical) and ref-vs-ref never pair
    assert all(r.new_id >= 100 and r.ref_id < 100 for r in pairs)
    # exact dup estimates full agreement
    est = {(r.new_id, r.ref_id): r.est_jaccard for r in pairs}
    assert est[(100, 1)] == 1.0


def test_novel_documents_keeps_only_unmatched(spark):
    new, ref = _frames(spark)
    novel = sorted(r.doc_id for r in novel_documents(new, ref, min_jaccard=0.7).collect())
    assert novel == [102]


def test_empty_new_side(spark):
    new, ref = _frames(spark)
    out = cross_corpus_minhash_pairs(new.limit(0), ref).collect()
    assert out == []


def test_hot_band_salting_preserves_pairs(spark):
    # Force salting: many identical ref docs share every band; tiny
    # max_band_size splits them into salt groups and the new-side row must
    # still reach each group.
    new = spark.createDataFrame([Row(doc_id=100, text=_BASE)])
    ref = spark.createDataFrame([Row(doc_id=i, text=_BASE) for i in range(20)])
    pairs = cross_corpus_minhash_pairs(
        new, ref, min_jaccard=0.7, max_band_size=3, max_salt_groups=8
    ).collect()
    assert {r.ref_id for r in pairs} == set(range(20))
    assert all(r.est_jaccard == 1.0 for r in pairs)
