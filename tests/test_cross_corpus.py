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


def test_source_sketch_identical_sources_estimate_one(spark):
    """Two sources with byte-identical content: union sketches are equal
    in every slot -> est_jaccard = 1.0."""
    from entity_resolution_spark.operators.cross_corpus import source_sketch_similarity

    text = "the quick brown fox jumps over the lazy dog and keeps running far"
    rows = [(1, text, "a"), (2, text, "b")]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = source_sketch_similarity(d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["src_a"], r["src_b"]) == ("a", "b") and r["est_jaccard"] == 1.0


def test_source_sketch_disjoint_vs_overlapping(spark):
    """A source sharing content with another estimates higher than a
    disjoint one; all C(3,2) pairs are emitted."""
    from entity_resolution_spark.operators.cross_corpus import source_sketch_similarity

    shared = "distributed query engines shuffle partition and aggregate data "
    rows = (
        [(i, shared + f"tail {i}", "a") for i in range(5)]
        + [(10 + i, shared + f"tail {10 + i}", "b") for i in range(5)]
        + [(20 + i, f"totally different corpus about {i} cooking recipes and gardens", "c") for i in range(5)]
    )
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["src_a"], r["src_b"]): r["est_jaccard"]
        for r in source_sketch_similarity(d).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert got[("a", "b")] > got[("a", "c")]
    assert got[("a", "b")] > got[("b", "c")]


def test_source_sketch_partition_invariance(spark):
    from entity_resolution_spark.operators.cross_corpus import source_sketch_similarity

    rows = [(i, f"some document body number {i} with words", f"s{i % 4}") for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = sorted(map(tuple, source_sketch_similarity(d).collect()))
    b = sorted(map(tuple, source_sketch_similarity(d.repartition(7)).collect()))
    assert a == b and len(a) == 6
