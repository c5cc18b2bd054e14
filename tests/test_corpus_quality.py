"""Unit semantics for operators/boilerplate.py and operators/lm.py."""

import math

from pyspark.sql import Row

from entity_resolution_spark.operators.boilerplate import (
    boilerplate_segments,
    remove_boilerplate_segments,
)
from entity_resolution_spark.operators.lm import (
    bigram_lm_cross_entropy,
    fit_bigram_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


# --- boilerplate -----------------------------------------------------------


def test_boilerplate_census_finds_cross_doc_segments(spark):
    # 'cookie banner' (2 words/segment) appears in docs 0 and 1; unique text
    # does not survive the census.
    d = _docs(
        spark,
        [
            (0, "cookie banner alpha beta"),
            (1, "cookie banner gamma delta"),
            (2, "epsilon zeta eta theta"),
        ],
    )
    bp = boilerplate_segments(d, seg_words=2, max_doc_freq=1).collect()
    assert {(r.segment, r.doc_freq) for r in bp} == {("cookie banner", 2)}


def test_boilerplate_removal_preserves_order_and_counts(spark):
    d = _docs(
        spark,
        [
            (0, "cookie banner keep one keep two"),
            (1, "keep three cookie banner keep four"),
            (2, "cookie banner cookie banner"),  # fully boilerplate
        ],
    )
    out = {
        r.doc_id: r
        for r in remove_boilerplate_segments(d, seg_words=2, max_doc_freq=1).collect()
    }
    assert out[0].clean_text == "keep one keep two"
    assert (out[0].n_segments, out[0].n_removed) == (3, 1)
    # removal keeps the surviving segments in original position order
    assert out[1].clean_text == "keep three keep four"
    assert out[1].n_removed == 1
    # everything removed -> empty text, all segments counted
    assert out[2].clean_text == ""
    assert (out[2].n_segments, out[2].n_removed) == (2, 2)


def test_boilerplate_null_and_empty_text_total(spark):
    d = spark.createDataFrame(
        [Row(doc_id=0, text=None), Row(doc_id=1, text="")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_boilerplate_segments(d).collect()}
    # NULL and '' both degrade to the single '' segment, which the census
    # then flags (2 docs share it) -> removed, clean_text ''.
    for i in (0, 1):
        assert out[i].n_segments == 1
        assert out[i].clean_text == ""


def test_boilerplate_plan_has_no_python(spark):
    d = _docs(spark, [(0, "a b"), (1, "a b")])
    plan = remove_boilerplate_segments(d)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


# --- bigram LM -------------------------------------------------------------


def test_fit_bigram_lm_counts(spark):
    d = _docs(spark, [(0, "a b a b"), (1, "b c")])
    bi, ctx, vocab = fit_bigram_lm(d)
    counts = {(r.w1, r.w2): r.c12 for r in bi.collect()}
    assert counts == {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1}
    assert {r.w1: r.c1 for r in ctx.collect()} == {"a": 2, "b": 2}
    assert vocab.collect()[0].v == 3


def test_cross_entropy_hand_computed(spark):
    # Corpus: one doc "a b a b". Bigrams: (a,b)x2, (b,a)x1.
    # V=2, alpha=1. P(b|a)=(2+1)/(2+2)=0.75, P(a|b)=(1+1)/(1+2)=2/3.
    d = _docs(spark, [(0, "a b a b")])
    r = bigram_lm_cross_entropy(d).collect()[0]
    expected_h = -(2 * math.log2(0.75) + math.log2(2 / 3)) / 3
    assert r.n_bigrams == 3
    assert abs(r.cross_entropy - round(expected_h, 4)) < 1e-9
    assert abs(r.perplexity - round(2**expected_h, 4)) < 1e-9


def test_lm_short_and_null_docs_get_null_entropy(spark):
    d = spark.createDataFrame(
        [Row(doc_id=0, text="solo"), Row(doc_id=1, text=None), Row(doc_id=2, text="a b")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_lm_cross_entropy(d).collect()}
    assert out[0].n_bigrams == 0 and out[0].cross_entropy is None
    assert out[1].n_bigrams == 0 and out[1].perplexity is None
    assert out[2].n_bigrams == 1 and out[2].cross_entropy is not None


def test_lm_unseen_bigram_backoff(spark):
    # Model fit on doc A only; score doc B containing an unseen bigram.
    model = _docs(spark, [(0, "a b a b")])
    score = _docs(spark, [(1, "c d")])  # neither context nor bigram seen
    r = bigram_lm_cross_entropy(score, model_docs=model).collect()[0]
    # backoff: P = alpha / (0 + alpha*V) = 1/2 -> H = 1 bit
    assert r.n_bigrams == 1
    assert abs(r.cross_entropy - 1.0) < 1e-9
    assert abs(r.perplexity - 2.0) < 1e-9


def test_lm_min_count_prunes_to_backoff(spark):
    # (b,a) has c12=1 and is pruned at min_count=2; its probability falls
    # back to alpha/(c1 + alpha*V) with the PRE-pruning context mass of
    # 'b' as a LEFT context: c1 = 1 (only bigram (b,a)), V = 2.
    model = _docs(spark, [(0, "a b a b")])
    score = _docs(spark, [(1, "b a")])
    r = bigram_lm_cross_entropy(score, model_docs=model, min_count=2).collect()[0]
    expected_h = -math.log2(1.0 / (1 + 2))
    assert abs(r.cross_entropy - round(expected_h, 4)) < 1e-9


def test_lm_plan_has_no_python(spark):
    d = _docs(spark, [(0, "a b c"), (1, "b c d")])
    plan = bigram_lm_cross_entropy(d)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


# --- BPE pair mining ---------------------------------------------------------


def test_bpe_pair_counts_hand_computed(spark):
    from entity_resolution_spark.operators.tokenize import bpe_pair_counts

    # words: "abab" x2, "ab" x1, "z" (no pair) -> ab:2*2+1=5, ba:2*1=2
    d = _docs(spark, [(0, "abab ab z"), (1, "abab")])
    got = [(r.pair, r.cnt) for r in bpe_pair_counts(d, k=10).collect()]
    assert got == [("ab", 5), ("ba", 2)]


def test_bpe_tiebreak_is_lexicographic(spark):
    from entity_resolution_spark.operators.tokenize import bpe_pair_counts

    d = _docs(spark, [(0, "xy qr")])  # both pairs count 1
    got = [r.pair for r in bpe_pair_counts(d, k=10).collect()]
    assert got == ["qr", "xy"]


# --- source overlap matrix ---------------------------------------------------


def test_source_overlap_matrix_counts_cross_and_within(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.dedup import source_overlap_matrix

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz in the evening light and the crowd watches quietly "
        "from the wooden benches near the river bank under the old bridge"
    )
    other = (
        "distributed query engines shuffle partitions across executors "
        "with adaptive execution and broadcast joins for small dimension "
        "tables while large fact tables stay hash partitioned on the key"
    )
    d = spark.createDataFrame(
        [
            Row(doc_id=0, source="crawl_a", text=base),
            Row(doc_id=1, source="crawl_b", text=base),          # cross-source dup
            Row(doc_id=2, source="crawl_a", text=base + " tail"),  # near-dup, a-vs-a and a-vs-b
            Row(doc_id=3, source="crawl_b", text=other),          # unrelated
        ]
    )
    got = {
        (r.src_a, r.src_b): r.n_pairs
        for r in source_overlap_matrix(d, min_jaccard=0.7).collect()
    }
    # pairs: (0,1) a-b, (0,2) a-a, (1,2) a-b
    assert got == {("crawl_a", "crawl_b"): 2, ("crawl_a", "crawl_a"): 1}


# --- encode_documents -------------------------------------------------------------


def test_encode_documents_ids_by_frequency_rank(spark):
    from entity_resolution_spark.operators.tokenize import encode_documents

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog"),
    ]
    out = encode_documents(_docs(spark, rows), vocab_size=100).collect()
    enc = {}
    for r in out:
        enc.setdefault(r["doc_id"], {})[r["pos"]] = r["token_id"]
    # 'the' appears 3x -> id 0; everything else 1x, lexicographic:
    # cat=1, dog=2, mat=3, on=4, sat=5
    assert [enc[1][p] for p in range(6)] == [0, 1, 5, 4, 0, 3]
    assert [enc[2][p] for p in range(2)] == [0, 2]


def test_encode_documents_oov_maps_to_unk(spark):
    from entity_resolution_spark.operators.tokenize import encode_documents

    corpus = _docs(spark, [(1, "alpha beta gamma")])
    vocab = spark.createDataFrame([("alpha",), ("beta",)], "term string")
    out = {r["pos"]: r["token_id"] for r in encode_documents(corpus, vocab_size=2, vocab=vocab).collect()}
    # vocab without counts ranks lexicographically: alpha=0, beta=1; gamma OOV -> 2
    assert out == {0: 0, 1: 1, 2: 2}


def test_encode_documents_roundtrip_stream(spark):
    from pyspark.sql import functions as F

    from entity_resolution_spark.operators.tokenize import encode_documents

    rows = [(i, "w%d x y z" % (i % 3)) for i in range(6)]
    enc = encode_documents(_docs(spark, rows), vocab_size=50)
    # every doc's positions tile 0..n-1 exactly
    per_doc = enc.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi")
    ).collect()
    assert all(r["lo"] == 0 and r["hi"] == r["n"] - 1 for r in per_doc)


def test_pack_token_ids_tiles_sequences(spark):
    from pyspark.sql import Row, functions as F

    from entity_resolution_spark.operators.tokenize import pack_token_ids

    rows = [
        Row(doc_id=i, text=" ".join("tok%d" % j for j in range(7)), source="s%d" % (i % 2))
        for i in range(8)
    ]
    out = pack_token_ids(spark.createDataFrame(rows), seq_len=5, vocab_size=100)
    df = out.collect()
    # per source: token offsets tile 0..total-1 with no gaps
    per_source = {}
    for r in df:
        per_source.setdefault(r["source"], []).append(r["seq_id"] * 5 + r["seq_pos"])
    for offs in per_source.values():
        assert sorted(offs) == list(range(len(offs)))
    # each doc's 7 tokens are contiguous in the stream
    per_doc = {}
    for r in df:
        per_doc.setdefault(r["doc_id"], []).append(r["seq_id"] * 5 + r["seq_pos"])
    for offs in per_doc.values():
        assert sorted(offs) == list(range(min(offs), min(offs) + 7))


def test_pack_token_ids_partition_invariant(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.tokenize import pack_token_ids

    rows = [Row(doc_id=i, text="a b c d e", source="s") for i in range(10)]
    d = spark.createDataFrame(rows)
    a = sorted(map(tuple, pack_token_ids(d, seq_len=4, vocab_size=10).collect()))
    b = sorted(map(tuple, pack_token_ids(d.repartition(7), seq_len=4, vocab_size=10).collect()))
    assert a == b


def test_bpe_train_hand_computed(spark):
    """Two merge rounds over a corpus where the counts are hand-derivable,
    including a rank-2 merge that consumes the rank-1 merged symbol."""
    from entity_resolution_spark.operators.tokenize import bpe_train

    # 'abab' x3, 'ab' x2: pairs round 1 -> (a,b): 3*2+2=8, (b,a): 3
    d = spark.createDataFrame(
        [(1, "abab abab abab ab ab")], "doc_id long, text string"
    )
    out = [tuple(r) for r in bpe_train(d, n_merges=2).collect()]
    assert out[0] == (1, "a", "b", "ab", 8)
    # after merge 1: 'abab' -> [ab, ab] x3, 'ab' -> [ab] x2 -> (ab,ab): 3
    assert out[1] == (2, "ab", "ab", "abab", 3)


def test_bpe_train_repeated_symbol_run_merges_every_other(spark):
    """'aaaa' + merge (a,a) must become [aa, aa] (greedy left-to-right),
    feeding an (aa,aa) pair into round 2 — the overlap case a plain string
    replace gets wrong."""
    from entity_resolution_spark.operators.tokenize import bpe_train

    d = spark.createDataFrame([(1, "aaaa aaaa aaaa")], "doc_id long, text string")
    out = [tuple(r) for r in bpe_train(d, n_merges=2).collect()]
    # round 1: (a,a) count = 3 per word * 3 words = 9
    assert out[0] == (1, "a", "a", "aa", 9)
    # round 2 sees [aa, aa] per word -> (aa,aa) = 3, NOT (aa,a)
    assert out[1] == (2, "aa", "aa", "aaaa", 3)


def test_bpe_train_early_stop_no_pairs(spark):
    """Single-character words carry no adjacent pairs: training stops
    before n_merges and returns the empty merge table."""
    from entity_resolution_spark.operators.tokenize import bpe_train

    d = spark.createDataFrame([(1, "a b c a b")], "doc_id long, text string")
    assert bpe_train(d, n_merges=5).count() == 0


def test_bpe_train_partition_invariance(spark):
    from entity_resolution_spark.operators.tokenize import bpe_train

    rows = [(i, "stream streams streaming sort sorted") for i in range(8)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    a = [tuple(r) for r in bpe_train(d, n_merges=4).collect()]
    b = [tuple(r) for r in bpe_train(d.repartition(7), n_merges=4).collect()]
    assert a == b and len(a) == 4


def test_readability_cols_hand_values(spark):
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from entity_resolution_spark.functions.text import readability_cols

    rows = [
        Row(t="The quick brown foxhound jumped. Over lazy dogs!"),  # 2 sentences
        Row(t="short"),                                   # 1 word, no punctuation
        Row(t="   "),                                     # blank -> NULL lix
        Row(t=None),
    ]
    df = spark.createDataFrame(rows)
    c = readability_cols(F.col("t"))
    out = df.select(
        c["n_words"].alias("w"), c["n_sentences"].alias("s"),
        c["n_long_words"].alias("l"), c["lix"].alias("lix"),
    ).collect()
    r0 = out[0]
    # words: The quick brown foxhound jumped. Over lazy dogs! -> 8 tokens;
    # long (>6 chars): foxhound, "jumped." (7 incl. dot) -> 2
    assert r0["w"] == 8 and r0["s"] == 2 and r0["l"] == 2
    assert r0["lix"] == round(8 / 2 + 100.0 * 2 / 8, 4)
    assert out[1]["w"] == 1 and out[1]["s"] == 1 and out[1]["lix"] == 1.0
    assert out[2]["lix"] is None and out[3]["lix"] is None


def test_threshold_sweep_monotone_and_edges(spark):
    from pyspark.sql import Row

    from entity_resolution_spark.operators.curation import threshold_sweep

    rows = [
        Row(text="The quick brown fox jumps over the lazy dog near the bank. " * 10),
        Row(text="x"),          # low quality
        Row(text=None),         # NULL fails every threshold
    ]
    df = spark.createDataFrame(rows)
    out = {r["threshold"]: r for r in threshold_sweep(df, [0.0, 0.5, 1.1]).collect()}
    # kept counts are monotone non-increasing in the threshold
    assert out[0.0]["kept_docs"] >= out[0.5]["kept_docs"] >= out[1.1]["kept_docs"]
    assert out[1.1]["kept_docs"] == 0 and out[1.1]["kept_tokens"] == 0
    assert out[0.0]["kept_docs"] == 2  # NULL text excluded even at 0.0
    assert out[0.5]["kept_fraction"] == round(out[0.5]["kept_docs"] / 3, 6)
    import pytest

    with pytest.raises(ValueError):
        threshold_sweep(df, [])
