"""Tokenizer-training support: corpus-wide BPE merge-candidate mining.

The first (and every) BPE training iteration (Sennrich et al. 2016) is a
corpus-scale count: weight each distinct word by its frequency, count
adjacent symbol pairs inside words, rank by count. The counting pass is
the distributed-heavy part — the merge loop itself runs over the
word-frequency table, which is vocabulary-sized, not corpus-sized.

All exact integer arithmetic, all built-in JVM expressions:

  words   regexp explode -> groupBy word        (corpus shuffle, once)
  pairs   char 2-grams inside each word x freq  (vocab-sized, narrow)
  rank    groupBy pair -> top-k                 (tiny aggregate)

Scale: after the first groupBy the frame is one row per DISTINCT word —
Zipf-bounded, orders of magnitude smaller than the corpus — so the pair
explosion and every later BPE iteration are cheap regardless of corpus
size. Deterministic: ties rank by pair string ascending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) — lowercase alphabetic word counts over the corpus."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", k: int = 50
) -> DataFrame:
    """Top-k BPE merge candidates: (pair, cnt) of adjacent character pairs
    inside words, weighted by word frequency, ordered (cnt desc, pair asc).

    Words of length 1 carry no pair (filtered BEFORE sequence(): Spark's
    sequence(1, 0) infers step -1 and would yield [1, 0], not empty)."""
    wc = word_frequencies(docs, text_col).filter(F.length("word") >= 2)
    pairs = wc.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                "          i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "n",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(k)
    )


def _merge_fold(a: str, b: str):
    """Column expr: apply merge (a, b) to the space-joined symbol string
    ``sym`` with greedy left-to-right BPE semantics, as a string-accumulator
    fold over the token list.

    The accumulator is the rebuilt symbol string; a step merges the incoming
    token ``t`` into the accumulator's LAST token iff that token is exactly
    ``a`` and ``t = b``. Because the merged token (``ab``) is never equal to
    ``a``'s boundary form again within the same pass, runs of a repeated
    symbol merge every-other-pair — exactly Sennrich et al. 2016's
    non-overlapping left-to-right application ("a a a a" + (a,a) -> "aa aa").
    Map-only, all built-in JVM expressions, no shuffle.
    """
    # token strings are [a-z]+ so no escaping concerns
    return F.expr(
        "aggregate(split(sym, ' '), '', (acc, t) -> "
        " CASE WHEN acc = '' THEN t "
        f"      WHEN (acc = '{a}' OR endswith(acc, ' {a}')) AND t = '{b}' "
        f"      THEN concat(substring(acc, 1, length(acc) - {len(a)}), '{a}', '{b}') "
        "       ELSE concat(acc, ' ', t) END)"
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    vocab_limit: int = 100_000,
    text_col: str = "text",
) -> DataFrame:
    """Train a BPE tokenizer: the full iterative merge loop of Sennrich et
    al. 2016, returning the learned merge table
    (merge_rank, lhs, rhs, merged, pair_count) — the artifact a tokenizer ships.

    Each word starts as its character sequence; every round counts adjacent
    symbol pairs weighted by word frequency, picks the most frequent pair
    (ties: lhs asc, rhs asc — engine-independent), and rewrites the symbol
    sequences with the greedy left-to-right fold (`_merge_fold`). Stops
    early when no pairs remain.

    Scale shape: the corpus is shuffled ONCE into the distinct-word census
    (Zipf-bounded; capped at ``vocab_limit`` most-frequent words by a
    bounded TakeOrdered for determinism under the cap). Every training
    round then runs over that bounded frame — one narrow pair explosion +
    map-side-combined count + 1-row TakeOrdered, and a map-only rewrite.
    The census is localCheckpoint'ed so round r's plan does not replay
    rounds 1..r-1; per-round driver work is one 1-row collect (a decision
    scalar, same convention as tfidf's n_docs).
    """
    wc = word_frequencies(docs, text_col)
    census = wc.orderBy(F.desc("n"), F.asc("word")).limit(int(vocab_limit))
    w = census.select(
        "word",
        F.col("n").alias("freq"),
        F.array_join(F.split("word", ""), " ").alias("sym"),
    ).localCheckpoint()

    pair_expr = F.expr(
        "CASE WHEN size(t) < 2 THEN array() "
        "ELSE transform(sequence(1, size(t) - 1), "
        "               i -> struct(t[i-1] AS a, t[i] AS b)) END"
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, int(n_merges) + 1):
        counts = (
            w.select("freq", F.split("sym", " ").alias("t"))
            .select("freq", F.explode(pair_expr).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = counts.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((rank, a, b, a + b, cnt))
        w = w.select("word", "freq", _merge_fold(a, b).alias("sym")).localCheckpoint()

    return docs.sparkSession.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, merged string, pair_count long"
    )


def encode_documents(
    docs: DataFrame,
    vocab_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """(id_col, pos, token_id) — the pretokenization pass: every document
    encoded to a dense integer id stream (the materialized form training
    shards actually store). Tokens are the lowercase alphabetic words the
    rest of the vocabulary tooling uses; ids are the frequency rank in the
    vocabulary (0 = most frequent, ties lexicographic — the conventional
    BPE id order), OOV tokens map to ``vocab_size`` (the <unk> slot).

    ``vocab`` defaults to the corpus's own top-``vocab_size`` tokens
    (`terms.top_vocabulary`); pass a (term[, n]) frame to encode against a
    fixed tokenizer vocabulary instead. ``pos`` is the 0-based token
    position within the document, so ``collect_list`` over pos (or the
    sequence packer downstream) reconstructs the stream.

    Scale shape: the vocabulary is bounded and broadcast (its rank window
    runs over vocab_size rows, never the corpus); the corpus side is one
    posexplode + broadcast left join — linear, no corpus shuffle, all JVM.
    """
    from .terms import top_vocabulary

    from pyspark.sql import Window

    if vocab is None:
        vocab = top_vocabulary(docs, vocab_size, id_col, text_col)
    if "n" not in vocab.columns:
        vocab = vocab.withColumn("n", F.lit(1))
    w = Window.orderBy(F.desc("n"), F.asc("term"))
    ids = vocab.select(
        "term", (F.row_number().over(w) - 1).cast("int").alias("__tid")
    )
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
    exploded = docs.select(F.col(id_col), F.posexplode(toks).alias("pos", "term"))
    return exploded.join(F.broadcast(ids), "term", "left").select(
        id_col,
        "pos",
        F.coalesce("__tid", F.lit(int(vocab_size))).cast("int").alias("token_id"),
    )


def pack_token_ids(
    docs: DataFrame,
    seq_len: int = 512,
    vocab_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    salt: str = "pack",
) -> DataFrame:
    """(source, id_col, seq_id, seq_pos, token_id) — the fully materialized
    training stream: `encode_documents`' id stream laid end-to-end per
    source in the same content-address order as
    `sampling.pack_into_sequences`, with every token placed into its
    fixed-length training sequence (``seq_id``) at offset ``seq_pos``.
    This is the end of the pipeline: what a data loader reads back as
    ``collect_list(token_id) OVER (seq_id ORDER BY seq_pos)``.

    Deterministic for any partitioning (content-address order, exact
    integer arithmetic). Scale shape: token counts come from the encoding
    itself (one per-doc aggregate), the per-source cumsum window matches
    pack_into_sequences (hot-source caveat documented there), and the
    token stream joins its doc start offset on the doc key — co-keyed
    shuffle join, all JVM.
    """
    from pyspark.sql import Window

    from .sampling import _hash_hex

    enc = encode_documents(docs, vocab_size, id_col=id_col, text_col=text_col)
    counts = enc.groupBy(id_col).agg(F.count("*").alias("__tok"))
    w = Window.partitionBy(source_col).orderBy("__hx", id_col)
    cum = F.sum("__tok").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    starts = (
        docs.select(source_col, id_col)
        .join(counts, id_col, "inner")
        .withColumn("__hx", _hash_hex(F.col(id_col), salt))
        .withColumn("__start", cum - F.col("__tok"))
        .select(source_col, id_col, "__start")
    )
    offset = (F.col("__start") + F.col("pos")).alias("__off")
    return (
        enc.join(starts, id_col)
        .select(source_col, id_col, "token_id", offset)
        .select(
            source_col,
            id_col,
            F.floor(F.col("__off") / F.lit(int(seq_len))).cast("long").alias("seq_id"),
            F.pmod(F.col("__off"), F.lit(int(seq_len))).cast("long").alias("seq_pos"),
            "token_id",
        )
    )
