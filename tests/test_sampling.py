"""operators/sampling.py + duplicate_span_stats behavioral tests."""

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.sampling import (
    deterministic_split,
    per_source_cap,
    split_thresholds,
)


def test_split_thresholds_reject_bad_fractions():
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.4})


def test_split_is_deterministic_and_roughly_proportional(spark):
    df = spark.range(0, 20_000).withColumnRenamed("id", "k")
    out = deterministic_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01
    # partitioning-independent: same assignment under a different layout
    out2 = deterministic_split(df.repartition(17), "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    a = dict(out.select("k", "split").collect())
    b = dict(out2.select("k", "split").collect())
    assert a == b


def test_split_never_moves_rows_when_corpus_grows(spark):
    """Content-addressing property: adding rows can't reassign old rows."""
    small = spark.range(0, 1_000).withColumnRenamed("id", "k")
    big = spark.range(0, 5_000).withColumnRenamed("id", "k")
    a = dict(deterministic_split(small, "k").select("k", "split").collect())
    b = dict(deterministic_split(big, "k").select("k", "split").collect())
    assert all(b[k] == v for k, v in a.items())


def _skewed_sources(spark):
    # one giant source (hot key) + many small ones
    giant = spark.range(0, 5_000).select(
        F.lit("giant").alias("source"), F.col("id").alias("k")
    )
    small = spark.range(5_000, 5_400).select(
        F.concat(F.lit("s"), (F.col("id") % 40).cast("string")).alias("source"),
        F.col("id").alias("k"),
    )
    return giant.unionByName(small)


def test_per_source_cap_exact_counts(spark):
    df = _skewed_sources(spark)
    out = per_source_cap(df, "source", "k", cap=25)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["giant"] == 25
    for s, n in counts.items():
        if s != "giant":
            assert n == 10  # 400 rows over 40 sources, all under the cap


def test_per_source_cap_prefilter_matches_exact(spark):
    df = _skewed_sources(spark)
    exact = sorted(map(tuple, per_source_cap(df, "source", "k", cap=25).select("source", "k").collect()))
    pre = sorted(map(tuple, per_source_cap(df, "source", "k", cap=25, prefilter_margin=4.0).select("source", "k").collect()))
    assert exact == pre


def test_per_source_cap_repair_path_matches_exact(spark):
    """A deliberately starved margin forces the undershoot-repair pass;
    the result must still equal the exact plan."""
    df = _skewed_sources(spark)
    exact = sorted(map(tuple, per_source_cap(df, "source", "k", cap=25).select("source", "k").collect()))
    starved = sorted(map(tuple, per_source_cap(df, "source", "k", cap=25, prefilter_margin=0.2).select("source", "k").collect()))
    assert exact == starved


def test_duplicate_span_stats_flags_shared_boilerplate(spark):
    from entity_resolution_spark.operators.dedup import duplicate_span_stats

    header = "copyright acme corporation all rights reserved " * 4
    rows = [
        (1, header + "alpha beta gamma delta epsilon zeta eta theta " * 6),
        (2, header + "one two three four five six seven eight nine ten " * 6),
        (3, "completely different text with nothing shared at all qqq " * 8),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in duplicate_span_stats(docs).collect()}
    assert out[1]["n_dup_fp"] > 0 and out[2]["n_dup_fp"] > 0
    assert out[3]["n_dup_fp"] == 0 and out[3]["dup_frac"] == 0.0
    assert 0 < out[1]["dup_frac"] < 1


def test_token_budget_met_not_undershot(spark):
    """The kept set's token sum reaches the budget (first crossing row
    included) and removing its last hash-ordered row would drop below."""
    from entity_resolution_spark.functions.text import whitespace_token_count_col
    from entity_resolution_spark.operators.sampling import sample_to_token_budget

    docs = spark.createDataFrame(
        [(i, "web", "tok " * (10 + i)) for i in range(30)],
        "doc_id long, source string, text string",
    )
    budget = 150
    kept = sample_to_token_budget(docs, budget)
    toks = kept.select(
        whitespace_token_count_col(F.col("text")).cast("long").alias("n")
    ).collect()
    total = sum(r.n for r in toks)
    assert total >= budget
    assert total - max(r.n for r in toks) < budget  # minimal overshoot
    # determinism under different partitioning
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(
        r.doc_id for r in sample_to_token_budget(docs.repartition(13), budget).collect()
    )
    assert a == b


def test_sequence_packing_contiguous(spark):
    """Offsets tile each source's token stream exactly: sorted by
    (seq_id, seq_offset), every doc starts where the previous ended."""
    from entity_resolution_spark.operators.sampling import pack_into_sequences

    docs = spark.createDataFrame(
        [(i, "s%d" % (i % 2), "w " * (5 + 3 * i)) for i in range(20)],
        "doc_id long, source string, text string",
    )
    out = pack_into_sequences(docs, seq_len=64).collect()
    by_source = {}
    for r in out:
        by_source.setdefault(r.source, []).append(r)
    for rows in by_source.values():
        rows.sort(key=lambda r: (r.seq_id, r.seq_offset))
        pos = 0
        for r in rows:
            assert r.seq_id * 64 + r.seq_offset == pos, (r, pos)
            pos += r.n_tokens


def test_leakage_safe_split_keeps_near_dups_together(spark):
    """Near-duplicate docs (one-word edits of a shared base) must land in
    the same split; plain deterministic_split on doc_id scatters them."""
    from entity_resolution_spark.operators.sampling import leakage_safe_split

    rows = []
    for g in range(8):
        # distinct vocabulary per group so groups don't merge across
        text = (f"word{g}a word{g}b word{g}c word{g}d word{g}e word{g}f " * 12)
        for v in range(3):  # 3 near-identical variants per group
            rows.append((g * 10 + v, text + (" tail" if v else "")))
    for i in range(40):  # unrelated singletons
        rows.append((1000 + i, f"completely different text number {i} " + "xyz " * (i % 7 + 3)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(docs, min_jaccard=0.5).collect()
    assert len(out) == len(rows)
    by_canon = {}
    for r in out:
        by_canon.setdefault(r.canonical_id, set()).add(r.split)
    # every component is assigned exactly one split label
    assert all(len(s) == 1 for s in by_canon.values())
    # the variant groups actually formed components (test isn't vacuous)
    grouped = [c for c, _ in by_canon.items() if sum(1 for r in out if r.canonical_id == c) >= 3]
    assert len(grouped) >= 8


def test_dsir_ranks_target_like_docs_higher(spark):
    """Docs sharing the target's vocabulary must outscore disjoint ones,
    and exactly top_k rows are kept."""
    from entity_resolution_spark.operators.sampling import dsir_importance_sample

    target_vocab = "alpha beta gamma delta epsilon zeta eta theta "
    other_vocab = "one two three four five six seven eight "
    rows = [(i, target_vocab * 4) for i in range(10)]  # target-like
    rows += [(100 + i, other_vocab * 4) for i in range(10)]  # off-target
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.filter(F.col("doc_id") < 5)  # a subset of the target-like docs
    out = {r.doc_id: r for r in dsir_importance_sample(docs, target, top_k=10).collect()}
    assert len(out) == 20
    assert sum(r.kept for r in out.values()) == 10
    worst_target_like = min(out[i].score_micro_nats for i in range(10))
    best_off_target = max(out[100 + i].score_micro_nats for i in range(10))
    assert worst_target_like > best_off_target
    assert all(out[i].kept == 1 for i in range(10))


def test_dsir_empty_and_short_docs_score_zero(spark):
    from entity_resolution_spark.operators.sampling import dsir_importance_sample

    docs = spark.createDataFrame(
        [(0, "abc"), (1, ""), (2, None), (3, "a proper document with text " * 3)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dsir_importance_sample(docs, docs.limit(1), top_k=2).collect()}
    assert len(out) == 4
    assert out[0].score_micro_nats == 0  # shorter than shingle_k
    assert out[1].score_micro_nats == 0
    assert out[2].score_micro_nats == 0


def test_shuffle_shards_layout(spark):
    from entity_resolution_spark.operators.sampling import shuffle_shards

    docs = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    out = shuffle_shards(docs, n_shards=4, seed=42)
    rows = out.collect()
    assert len(rows) == 1000
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    # every shard's positions tile 0..size-1 exactly
    assert set(by_shard) == {0, 1, 2, 3}
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    # ~uniform shard sizes (hash balance; 1000/4 = 250 +- 20%)
    sizes = sorted(len(v) for v in by_shard.values())
    assert sizes[0] > 200 and sizes[-1] < 300, sizes
    # deterministic under repartitioning
    again = {
        (r.doc_id): (r.shard, r.pos)
        for r in shuffle_shards(docs.repartition(13), n_shards=4, seed=42).collect()
    }
    assert again == {r.doc_id: (r.shard, r.pos) for r in rows}
    # a different seed is a different permutation
    other = {
        r.doc_id: (r.shard, r.pos)
        for r in shuffle_shards(docs, n_shards=4, seed=7).collect()
    }
    assert other != again


# --- balanced_shards --------------------------------------------------------------


def test_balanced_shards_serpentine_assignment(spark):
    from entity_resolution_spark.operators.sampling import balanced_shards

    # weights 16..1 over 16 docs, 4 shards: snake order means shard sums
    # are exactly equal (16+9+8+1 = 15+10+7+2 = ...)
    rows = [(i, 16 - i) for i in range(16)]
    d = spark.createDataFrame(rows, "doc_id long, w long")
    out = balanced_shards(d, weight_col="w", n_shards=4).collect()
    sums = {}
    for r in out:
        sums[r["shard"]] = sums.get(r["shard"], 0) + r["weight"]
    assert set(sums) == {0, 1, 2, 3}
    assert len(set(sums.values())) == 1  # perfectly balanced for 16..1
    # each shard got one row per deal round
    rounds = {}
    for r in out:
        rounds.setdefault(r["pos"], set()).add(r["shard"])
    assert all(s == {0, 1, 2, 3} for s in rounds.values())


def test_balanced_shards_partition_invariant(spark):
    from entity_resolution_spark.operators.sampling import balanced_shards

    rows = [(i, (i * 37) % 101 + 1) for i in range(60)]
    d = spark.createDataFrame(rows, "doc_id long, w long")
    a = sorted(map(tuple, balanced_shards(d, "w", n_shards=8).collect()))
    b = sorted(map(tuple, balanced_shards(d.repartition(13), "w", n_shards=8).collect()))
    assert a == b


def test_balanced_shards_ties_break_by_id(spark):
    from entity_resolution_spark.operators.sampling import balanced_shards

    d = spark.createDataFrame([(i, 5) for i in range(6)], "doc_id long, w long")
    out = {r["doc_id"]: (r["shard"], r["pos"]) for r in balanced_shards(d, "w", n_shards=3).collect()}
    # all-equal weights: global order is doc_id asc -> snake 0,1,2,2,1,0
    assert [out[i][0] for i in range(6)] == [0, 1, 2, 2, 1, 0]


def test_weighted_sample_prefers_heavy_rows(spark):
    """A-ES inclusion is weight-proportional: with one row carrying ~99%
    of total weight, k=1 picks it for the large majority of seeds."""
    from entity_resolution_spark.operators.sampling import weighted_sample

    rows = [(0, 2000)] + [(i, 2) for i in range(1, 11)]
    d = spark.createDataFrame(rows, "doc_id long, w long")
    wins = sum(
        weighted_sample(d, k=1, weight_col="w", seed=s).collect()[0]["doc_id"] == 0
        for s in range(20)
    )
    assert wins >= 15  # p(row0) ~ 0.99 per draw


def test_weighted_sample_excludes_nonpositive_and_null_weights(spark):
    from entity_resolution_spark.operators.sampling import weighted_sample

    d = spark.createDataFrame(
        [(1, 10), (2, 0), (3, -5), (4, None), (5, 7)], "doc_id long, w long"
    )
    got = {r["doc_id"] for r in weighted_sample(d, k=10, weight_col="w").collect()}
    assert got == {1, 5}


def test_weighted_sample_deterministic_and_partition_invariant(spark):
    from entity_resolution_spark.operators.sampling import weighted_sample

    d = spark.createDataFrame([(i, 1 + i % 7) for i in range(200)], "doc_id long, w long")
    a = [tuple(r) for r in weighted_sample(d, k=25, weight_col="w").collect()]
    b = [tuple(r) for r in weighted_sample(d.repartition(9), k=25, weight_col="w").collect()]
    assert a == b and len(a) == 25
    assert [r[3] for r in a] == list(range(1, 26))  # dense ranks in key order
    # different seed -> different sample (overwhelmingly)
    c = [tuple(r) for r in weighted_sample(d, k=25, weight_col="w", seed=7).collect()]
    assert c != a


def test_batch_by_length_hand_layout(spark):
    """7 docs, batch_size=3: sorted desc by length, chunked into 3/3/1;
    the short final batch holds the shortest rows."""
    from entity_resolution_spark.operators.sampling import batch_by_length

    rows = [(i, ln) for i, ln in enumerate([50, 10, 40, 30, 20, 60, 5])]
    d = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {
        r["doc_id"]: (r["batch_id"], r["slot"], r["length"])
        for r in batch_by_length(d, batch_size=3).collect()
    }
    # desc order: 60(5) 50(0) 40(2) | 30(3) 20(4) 10(1) | 5(6)
    assert got[5] == (0, 0, 60) and got[0] == (0, 1, 50) and got[2] == (0, 2, 40)
    assert got[3] == (1, 0, 30) and got[4] == (1, 1, 20) and got[1] == (1, 2, 10)
    assert got[6] == (2, 0, 5)


def test_batch_by_length_partition_invariant_and_beats_random(spark):
    from entity_resolution_spark.operators.sampling import batch_by_length, padding_stats

    rows = [(i, 10 + (i * 37) % 490) for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, n_chars long")
    a = sorted(map(tuple, batch_by_length(d, batch_size=16).collect()))
    b = sorted(map(tuple, batch_by_length(d.repartition(9), batch_size=16).collect()))
    assert a == b
    eff = padding_stats(batch_by_length(d, batch_size=16)).collect()[0]
    assert eff["n_batches"] == 13 and eff["real_tokens"] <= eff["padded_tokens"]
    # id-ordered (effectively random-length) batching pads far more
    from pyspark.sql import functions as F

    naive = d.select(
        "doc_id",
        F.col("n_chars").alias("length"),
        F.floor(F.col("doc_id") / 16).alias("batch_id"),
    )
    naive_eff = padding_stats(naive).collect()[0]
    assert eff["efficiency"] > naive_eff["efficiency"]
