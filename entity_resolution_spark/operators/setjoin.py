"""Prefix-filtered exact set-similarity self-join (PPJoin-style).

Chaudhuri/Ganti/Kaushik (ICDE 2006) prefix filtering, as used by PPJoin
(Xiao et al., WWW 2008): for Jaccard threshold t, two token sets can only
reach jaccard(x, y) >= t if they share a token among each side's FIRST
``|s| - ceil(t*|s|) + 1`` tokens under one global canonical order
(rarest-first).  So instead of indexing EVERY token (what
dedup.ngram_jaccard_pairs does — sound, but the posting list of a common
token is quadratic in its document frequency), only the short rare-token
prefix is indexed; candidates that share a prefix token are then verified
with the EXACT jaccard over the full sets.  Same output as the brute-force
inverted index, far fewer intermediate pairs — the standard scale path for
corpus-wide similarity joins.

Plan shape (all JVM, no UDF):
  1. token frequency census (one hash aggregate);
  2. canonical per-doc token array: explode + census join + re-aggregate
     sorted by (freq ASC, token ASC) — rarest first, fully deterministic;
  3. prefix slice + explode -> posting index over PREFIX tokens only;
  4. equi-self-join on the prefix token, ``left < right``, distinct —
     a pair may share several prefix tokens;
  5. length filter ``t * |x| <= |y|`` (a match is impossible otherwise),
     then exact verification: ``array_intersect`` on the full sorted
     arrays, jaccard >= t.

Completeness: any pair with jaccard >= t has overlap >= ceil(t*max(|x|,|y|))
>= ceil(t*|s|) per side, and the prefix theorem guarantees a shared token
within both prefixes; the final verification makes the operator EXACT
regardless, so the prefix only governs efficiency (pinned by pytest
equality against the brute-force index plus a candidate-count reduction
assertion).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _canonical_token_arrays(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, toks) — distinct whitespace tokens sorted rarest-first."""
    tok = F.explode(
        F.array_distinct(
            F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
        )
    )
    e = docs.select(F.col(id_col).alias("id"), tok.alias("token")).where(
        F.col("token") != ""
    )
    freq = e.groupBy("token").agg(F.count(F.lit(1)).alias("__f"))
    return (
        e.join(freq.hint("shuffle_hash"), "token")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__f").alias("f"), F.col("token").alias("t")))
                ),
                lambda s: s["t"],
            ).alias("toks")
        )
    )


def ppjoin_token_jaccard(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact token-set jaccard >= threshold via prefix filtering ->
    (left_id, right_id, jaccard rounded at 6)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    d = _canonical_token_arrays(docs, id_col, text_col).localCheckpoint(eager=True)
    # the 1e-9 slack keeps FP rounding of t*|s| from ever SHORTENING the
    # prefix below the sound minimum (longer prefixes stay complete)
    prefix_len = F.size("toks") - F.ceil(F.size("toks") * F.lit(threshold) - 1e-9) + 1
    pre = d.select(
        "id",
        F.size("toks").alias("n"),
        F.explode(F.slice("toks", 1, prefix_len.cast("int"))).alias("token"),
    )
    a = pre.select("token", F.col("id").alias("left_id"), F.col("n").alias("__nl"))
    b = pre.select("token", F.col("id").alias("right_id"), F.col("n").alias("__nr"))
    cand = (
        a.join(b, "token")
        .where(
            (F.col("left_id") < F.col("right_id"))
            # length filter: jaccard >= t forces t*|x| <= |y| both ways
            # (1e-9 slack: FP must never drop an exact-boundary pair)
            & (F.col("__nl") * threshold - 1e-9 <= F.col("__nr"))
            & (F.col("__nr") * threshold - 1e-9 <= F.col("__nl"))
        )
        .select("left_id", "right_id")
        .distinct()
    )
    lt = d.select(F.col("id").alias("left_id"), F.col("toks").alias("__lt"))
    rt = d.select(F.col("id").alias("right_id"), F.col("toks").alias("__rt"))
    verified = (
        cand.join(lt.hint("shuffle_hash"), "left_id")
        .join(rt.hint("shuffle_hash"), "right_id")
        .withColumn("__ov", F.size(F.array_intersect("__lt", "__rt")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("__ov")
                / (F.size("__lt") + F.size("__rt") - F.col("__ov")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", "jaccard")
    )
    return verified


def _tfidf_postings(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, token, wn) — L2-normalized tf-idf postings.

    tf = raw in-doc multiplicity of the whitespace token, idf = ln(N/df);
    tokens with df == N carry weight 0 and are dropped (they cannot move a
    cosine, and keeping them would divide empty-signal docs by a zero norm).
    """
    from pyspark.sql import Window

    tok = F.explode(
        F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    )
    e = (
        docs.select(F.col(id_col).alias("id"), tok.alias("token"))
        .where(F.col("token") != "")
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    n_docs = docs.select(F.count(F.lit(1)).alias("__n"))
    # df and the per-doc norm come from two WINDOW passes (one shuffle on
    # token, one on id) instead of census joins — same values, shorter plan
    w = (
        e.withColumn("__df", F.count(F.lit(1)).over(Window.partitionBy("token")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn("__w", F.col("__tf") * F.log(F.col("__n") / F.col("__df")))
        .where(F.col("__w") > 0)
        .select("id", "token", "__w", "__df")
    )
    # __df rides along so prefix builders can order features rarest-first
    nrm = F.sqrt(F.sum(F.col("__w") * F.col("__w")).over(Window.partitionBy("id")))
    return w.select(
        "id", "token", (F.col("__w") / nrm).alias("wn"), "__df"
    )


def _verify_cosine_pairs(v: DataFrame, cand: DataFrame, threshold: float) -> DataFrame:
    """Exact verification of (left_id, right_id) candidates against the
    postings frame ``v`` -> (left_id, right_id, cosine round-6) >= threshold.

    Runs over PACKED vectors: one row per candidate pair, the dot product
    computed in-row by codegen over token-sorted entries (deterministic sum
    order) with map lookups into the partner — joining exploded postings
    instead multiplies the candidate frame by tokens-per-doc before the
    aggregate. Both the sparse-prefix and dense-matmul candidate paths end
    here, so reported cosines are bit-identical regardless of path.
    """
    packed = v.groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("token", "wn"))).alias("__e")
    )
    lv = packed.select(F.col("id").alias("left_id"), F.col("__e").alias("__el"))
    rv = packed.select(
        F.col("id").alias("right_id"), F.map_from_entries("__e").alias("__mr")
    )
    dot = F.aggregate(
        F.col("__el"),
        F.lit(0.0),
        lambda acc, e: acc
        + F.coalesce(F.element_at(F.col("__mr"), e["token"]), F.lit(0.0)) * e["wn"],
    )
    return (
        cand.join(lv.hint("shuffle_hash"), "left_id")
        .join(rv.hint("shuffle_hash"), "right_id")
        .select("left_id", "right_id", F.round(dot, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def _dense_cosine_candidates(
    v: DataFrame, threshold: float, dim: int, chunk_rows: int | None = None
) -> DataFrame:
    """Candidate (left_id, right_id) pairs via chunked dense matmul.

    When the vocabulary is SMALL, tf-idf vectors are effectively dense and
    prefix filtering is structurally hopeless (every doc shares nearly
    every token with every other doc — at sf0.1 the documents corpus has a
    31-token vocabulary and the prefix join emits 10.7M of the 12.5M
    possible pairs). Any exact algorithm must then look at Ω(n²) pair
    interactions, so the fastest shape is the vectorized one: densify each
    doc's weights into a dim-length vector, hash-chunk the corpus, and
    score each of the C(n_chunks+1, 2) chunk pairs with ONE float64
    (chunk × dim)·(dim × chunk) matmul inside an Arrow batch. Each
    unordered doc pair lives in exactly one chunk pair (hash partition),
    so no distinct is needed. The 1e-6 slack keeps BLAS summation-order
    ulps from dropping a boundary pair — final cosines are recomputed
    exactly by `_verify_cosine_pairs`, so the matmul only PRUNES.

    Chunk rows are sized so a chunk's dense matrix stays ~16 MB
    (executor-memory-safe at any dim); chunk pairs grow as (n/chunk)², the
    intrinsic cost of an exact join on a dense corpus — for approximate
    scale paths over embeddings use dedup.embedding_cosine_pairs (LSH).
    """
    import math

    import numpy as np

    spark = v.sparkSession
    if chunk_rows is None:
        chunk_rows = max(256, int(16e6 / (8 * max(dim, 1))))
    toks = [r["token"] for r in v.select("token").distinct().orderBy("token").collect()]
    idx_df = spark.createDataFrame(
        [(t, i) for i, t in enumerate(toks)], "token string, __ix int"
    )
    # per-doc entries as PARALLEL primitive arrays (not array<struct>): Arrow
    # hands the Python side numpy int/double arrays directly, so the matrix
    # fill is two vectorized scatter assignments per doc instead of a
    # per-entry dict walk
    entries = (
        v.join(F.broadcast(idx_df), "token")
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("__ix", "wn"))).alias("__e"))
        .select(
            "id",
            F.col("__e.__ix").alias("__ixs"),
            F.col("__e.wn").alias("__wns"),
        )
    )
    n = entries.count()
    # two lower bounds on chunk count: chunk matrices must fit memory, and
    # C(n_chunks+1, 2) tasks should cover the cluster (~2x parallelism)
    par_chunks = math.ceil(math.sqrt(4 * spark.sparkContext.defaultParallelism))
    n_chunks = max(1, min(n, max(math.ceil(n / chunk_rows), par_chunks)))
    packed = (
        entries.withColumn(
            "__c", F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(n_chunks)).cast("int")
        )
        .groupBy("__c")
        .agg(F.collect_list(F.struct("id", "__ixs", "__wns")).alias("__m"))
    )
    keys = spark.createDataFrame(
        [(i, j) for i in range(n_chunks) for j in range(i, n_chunks)],
        "__ca int, __cb int",
    )
    joined = (
        keys.join(packed.select(F.col("__c").alias("__ca"), F.col("__m").alias("__ma")), "__ca")
        .join(packed.select(F.col("__c").alias("__cb"), F.col("__m").alias("__mb")), "__cb")
        .repartition(max(n_chunks * (n_chunks + 1) // 2, 1))
    )
    id_type = v.schema["id"].dataType
    out_schema = T.StructType(
        [T.StructField("left_id", id_type), T.StructField("right_id", id_type)]
    )
    thr = float(threshold) - 1e-6

    def _mat(members):
        ids, mat = [], np.zeros((len(members), dim), dtype="float64")
        for r, m in enumerate(members):
            ids.append(m["id"])
            mat[r, np.asarray(m["__ixs"], dtype="int64")] = np.asarray(
                m["__wns"], dtype="float64"
            )
        return ids, mat

    def gen(batches):
        for pdf in batches:
            out_l, out_r = [], []
            for ca, cb, ma, mb in zip(
                pdf["__ca"], pdf["__cb"], pdf["__ma"], pdf["__mb"]
            ):
                ids_a, A = _mat(ma)
                if ca == cb:
                    ids_b, B = ids_a, A
                else:
                    ids_b, B = _mat(mb)
                S = A @ B.T
                if ca == cb:
                    # one index cell per unordered pair; kills the diagonal
                    S = np.triu(S, k=1)
                ii, jj = np.nonzero(S >= thr)
                for i, j in zip(ii.tolist(), jj.tolist()):
                    ia, ib = ids_a[i], ids_b[j]
                    if ia < ib:
                        out_l.append(ia)
                        out_r.append(ib)
                    else:
                        out_l.append(ib)
                        out_r.append(ia)
            yield pd.DataFrame({"left_id": out_l, "right_id": out_r})

    return joined.mapInPandas(gen, out_schema)


def tfidf_cosine_join(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    dense_vocab_max: int = 4096,
) -> DataFrame:
    """Exact tf-idf cosine similarity self-join >= threshold.

    Two candidate-generation paths behind one exact verifier, selected by
    the corpus's measured vocabulary size:

    SPARSE (vocab > dense_vocab_max — real text): AllPairs-style
    (Bayardo/Ma/Srikant, WWW 2007) suffix-norm prefix filtering over
    L2-normalized tf-idf vectors: sort each doc's features RAREST-first
    (corpus df ASC — the bound below is sound for ANY feature order, and
    rare-first keeps high-tf COMMON tokens out of prefixes, whose posting
    lists would otherwise quadratically flood the candidate join) and
    index a feature only while the L2 norm of the REMAINING suffix is
    still >= t. Because the order is GLOBAL, prefixes are downward-closed
    in it, so for any pair with cosine >= t the globally-first shared
    feature lies in BOTH prefixes (if it were past either side's prefix,
    every shared feature would be too, and cos <= ||suffix|| < t — the
    PPJoin prefix argument transplanted to the weighted case); the
    candidate join therefore runs prefix x prefix, never prefix x full
    index.

    DENSE (vocab <= dense_vocab_max — templated/categorical corpora,
    within-block joins): prefix filtering cannot prune when every doc
    shares nearly every token (measured at sf0.1: 31-token vocabulary,
    10.7M of 12.5M possible pairs survive the prefix filter), so
    candidates come from `_dense_cosine_candidates` — chunked float64
    matmuls over densified vectors, the vectorized shape for an
    intrinsically Ω(n²) exact join.

    Either way, `_verify_cosine_pairs` recomputes the dot product exactly
    (deterministic token-sorted sum, JVM codegen) — candidates only prune,
    so the operator is EXACT and both paths return bit-identical values.

    Weighted complement of ppjoin_token_jaccard (reference semantics:
    content-similarity joins in /root/reference/src/similarity.py scope;
    the weighting follows the standard IR formulation, not the reference's
    unweighted ratio). Returns (left_id, right_id, cosine rounded at 6).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    from pyspark.sql import Window

    v = _tfidf_postings(docs, id_col, text_col).localCheckpoint(eager=True)
    vocab = v.select("token").distinct().count()
    if vocab <= dense_vocab_max:
        cand = _dense_cosine_candidates(v, threshold, dim=vocab)
        return _verify_cosine_pairs(v, cand, threshold)
    # reverse-inclusive sum of squares: a feature is in the prefix while the
    # norm mass from it to the end is >= t^2 (1e-9 slack only ever LENGTHENS
    # the prefix, keeping the filter complete under FP rounding)
    rev = (
        Window.partitionBy("id")
        .orderBy(F.col("__df").asc(), F.col("token"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pre = v.withColumn("__rest", F.sum(F.col("wn") * F.col("wn")).over(rev)).where(
        F.col("__rest") >= threshold * threshold - 1e-9
    )
    cand = (
        pre.select("token", F.col("id").alias("__ql"))
        .join(pre.select("token", F.col("id").alias("__pr")), "token")
        .where(F.col("__ql") < F.col("__pr"))
        .select(
            F.col("__ql").alias("left_id"),
            F.col("__pr").alias("right_id"),
        )
        .distinct()
    )
    return _verify_cosine_pairs(v, cand, threshold)


def tfidf_cosine_candidate_count(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Diagnostic: distinct prefix-filtered candidate pairs (pre-verification)."""
    from pyspark.sql import Window

    v = _tfidf_postings(docs, id_col, text_col)
    rev = (
        Window.partitionBy("id")
        .orderBy(F.col("__df").asc(), F.col("token"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pre = v.withColumn("__rest", F.sum(F.col("wn") * F.col("wn")).over(rev)).where(
        F.col("__rest") >= threshold * threshold - 1e-9
    )
    return (
        pre.select("token", F.col("id").alias("l"))
        .join(pre.select("token", F.col("id").alias("r")), "token")
        .where(F.col("l") < F.col("r"))
        .select("l", "r")
        .distinct()
        .count()
    )


def ppjoin_candidate_count(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Diagnostic: number of distinct prefix candidates (pre-verification)."""
    d = _canonical_token_arrays(docs, id_col, text_col)
    prefix_len = F.size("toks") - F.ceil(F.size("toks") * F.lit(threshold) - 1e-9) + 1
    pre = d.select(
        "id", F.explode(F.slice("toks", 1, prefix_len.cast("int"))).alias("token")
    )
    a = pre.select("token", F.col("id").alias("l"))
    b = pre.select("token", F.col("id").alias("r"))
    return (
        a.join(b, "token").where(F.col("l") < F.col("r")).select("l", "r").distinct().count()
    )


def _vocab_jw_table(
    vocab: DataFrame, jw_udf, theta: float, vocab_max: int = 2000
) -> DataFrame | None:
    """Precomputed Jaro-Winkler over vocab x vocab, filtered at theta —
    or None when the vocabulary is too large for the quadratic table.

    Returns (__tl, __tr, __jw) with __jw >= theta, localCheckpointed so the
    Python kernel runs exactly once. |V| <= vocab_max keeps the cross at
    <= 4M Arrow rows — one vectorized kernel call, broadcastable result
    (theta prunes it to the near-match fringe, typically a few hundred
    rows). For larger vocabularies the caller falls back to the per-row
    kernel, which costs |pairs| x tokens² but never materializes V².
    """
    n = vocab.count()
    if n > vocab_max:
        return None
    a = vocab.select(F.col("token").alias("__tl"))
    b = vocab.select(F.col("token").alias("__tr"))
    return (
        a.crossJoin(b)
        .withColumn("__jw", jw_udf(F.col("__tl"), F.col("__tr")))
        .where(F.col("__jw") >= theta)
        .localCheckpoint(eager=True)
    )


def soft_tfidf_score(
    records: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.0,
    theta: float = 0.9,
    id_col: str = "id",
    text_col: str = "text",
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """Soft-TF-IDF similarity (Cohen/Ravikumar/Fienberg, IIWeb 2003) over a
    candidate pair set — the classic hybrid metric: tf-idf token weighting
    with Jaro-Winkler "soft" token matching, so 'jon smith' ~ 'john smyth'
    scores high even though no token matches exactly.

    For direction S->T: CLOSE(theta) = tokens w in S whose best JW against
    T's tokens is >= theta; score = sum over CLOSE of
    V(w,S) * V(argmax_v JW(w,v), T) * max_v JW(w,v), with V the
    L2-normalized tf-idf weight over the full ``records`` corpus. The
    returned ``soft_tfidf`` is the mean of both directions (the metric is
    asymmetric; argmax ties break deterministically on partner token ASC).

    Scale shape: weights come from one corpus census (shared
    ``_tfidf_postings`` plan); the token cross-product exists only WITHIN
    supplied candidate pairs (bounded by blocking, never corpus-wide), and
    JW runs through the Arrow-batched kernel
    (functions/similarity.py batch_jaro_winkler — bit-equal to DuckDB's
    jaro_winkler_similarity, pinned by the f_jw_levenshtein contract row).
    When the corpus vocabulary is bounded (names/titles domains — the
    metric's habitat), JW is evaluated ONCE per vocab x vocab token pair
    and broadcast-joined into the pair-token frame, so the Python kernel
    sees |V|² rows instead of |pairs| x tokens² (~8.5k vs ~200M on the
    sf0.1 part table); the theta filter rides the broadcast join, so
    non-matching token rows die inside the probe stage.
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T
    from pyspark.sql.pandas.functions import pandas_udf

    if not 0.0 < theta <= 1.0:
        raise ValueError("theta must be in (0, 1]")

    @pandas_udf(T.DoubleType())
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        from ..functions.similarity import batch_jaro_winkler

        return pd.Series(batch_jaro_winkler(a, b))

    v = _tfidf_postings(records, id_col, text_col).localCheckpoint(eager=True)
    lp = v.select(
        F.col("id").alias(left_col), F.col("token").alias("__tl"), F.col("wn").alias("__wl")
    )
    rp = v.select(
        F.col("id").alias(right_col), F.col("token").alias("__tr"), F.col("wn").alias("__wr")
    )
    jw_tab = _vocab_jw_table(v.select("token").distinct(), _jw, theta)
    if jw_tab is not None:
        # join ORDER matters: expanding the left postings by their
        # theta-matching partner tokens BEFORE touching the right postings
        # keeps the intermediate at |pairs| x tokens x matches-per-token
        # (~1.05x after theta) instead of |pairs| x tokens² — the right
        # join then runs on the composite (right_id, __tr) key and only
        # token-compatible rows ever materialize
        tok_pairs = (
            pairs.select(left_col, right_col)
            .join(lp.hint("shuffle_hash"), left_col)
            .join(F.broadcast(jw_tab), "__tl")
            .join(rp.hint("shuffle_hash"), [right_col, "__tr"])
        )
    else:
        tok_pairs = (
            pairs.select(left_col, right_col)
            .join(lp.hint("shuffle_hash"), left_col)
            .join(rp.hint("shuffle_hash"), right_col)
            .withColumn("__jw", _jw(F.col("__tl"), F.col("__tr")))
            .where(F.col("__jw") >= theta)
        )
    w_l = Window.partitionBy(left_col, right_col, "__tl").orderBy(
        F.col("__jw").desc(), F.col("__tr")
    )
    s_lr = (
        tok_pairs.withColumn("__rn", F.row_number().over(w_l))
        .where(F.col("__rn") == 1)
        .groupBy(left_col, right_col)
        .agg(F.sum(F.col("__wl") * F.col("__wr") * F.col("__jw")).alias("__s_lr"))
    )
    w_r = Window.partitionBy(left_col, right_col, "__tr").orderBy(
        F.col("__jw").desc(), F.col("__tl")
    )
    s_rl = (
        tok_pairs.withColumn("__rn", F.row_number().over(w_r))
        .where(F.col("__rn") == 1)
        .groupBy(left_col, right_col)
        .agg(F.sum(F.col("__wl") * F.col("__wr") * F.col("__jw")).alias("__s_rl"))
    )
    return (
        s_lr.join(s_rl, [left_col, right_col])
        .select(
            left_col,
            right_col,
            F.round((F.col("__s_lr") + F.col("__s_rl")) / 2.0, 6).alias("soft_tfidf"),
        )
        .where(F.col("soft_tfidf") >= threshold)
    )


def monge_elkan_score(
    records: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    left_col: str = "left_id",
    right_col: str = "right_id",
) -> DataFrame:
    """Monge-Elkan similarity (Monge & Elkan, KDD 1996) over candidate
    pairs: for direction S->T, the mean over S's DISTINCT tokens of the
    best Jaro-Winkler match in T; returned ``monge_elkan`` is the mean of
    both directions (round-6). The classic unweighted companion to
    soft_tfidf_score — no corpus statistics, so it works on a single pair
    in isolation; same Arrow-batched JW kernel, same bounded-by-blocking
    token cross-product shape."""
    from pyspark.sql import types as T
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(T.DoubleType())
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        from ..functions.similarity import batch_jaro_winkler

        return pd.Series(batch_jaro_winkler(a, b))

    tok = F.explode(
        F.array_distinct(
            F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
        )
    )
    t = records.select(F.col(id_col).alias("id"), tok.alias("token")).where(
        F.col("token") != ""
    )
    lp = t.select(F.col("id").alias(left_col), F.col("token").alias("__tl"))
    rp = t.select(F.col("id").alias(right_col), F.col("token").alias("__tr"))
    tok_raw = (
        pairs.select(left_col, right_col)
        .join(lp.hint("shuffle_hash"), left_col)
        .join(rp.hint("shuffle_hash"), right_col)
    )
    # no theta here (the max needs every value), so the precomputed table
    # keeps all V² rows — gate it at a vocab size whose full cross still
    # broadcasts comfortably
    jw_tab = _vocab_jw_table(t.select("token").distinct(), _jw, 0.0, vocab_max=512)
    if jw_tab is not None:
        tok_pairs = tok_raw.join(F.broadcast(jw_tab), ["__tl", "__tr"])
    else:
        tok_pairs = tok_raw.withColumn("__jw", _jw(F.col("__tl"), F.col("__tr")))
    s_lr = tok_pairs.groupBy(left_col, right_col, "__tl").agg(
        F.max("__jw").alias("__best")
    ).groupBy(left_col, right_col).agg(F.avg("__best").alias("__s_lr"))
    s_rl = tok_pairs.groupBy(left_col, right_col, "__tr").agg(
        F.max("__jw").alias("__best")
    ).groupBy(left_col, right_col).agg(F.avg("__best").alias("__s_rl"))
    return s_lr.join(s_rl, [left_col, right_col]).select(
        left_col,
        right_col,
        F.round((F.col("__s_lr") + F.col("__s_rl")) / 2.0, 6).alias("monge_elkan"),
    )


def smith_waterman_score(
    records: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    left_col: str = "left_id",
    right_col: str = "right_id",
    match: int = 2,
    mismatch: int = -1,
    gap: int = 1,
) -> DataFrame:
    """Smith-Waterman local-alignment similarity over candidate pairs ->
    (left_col, right_col, sw_score, sw_sim round-6), where sw_sim =
    sw_score / (match * min(len_l, len_r)) — 1.0 when the shorter string
    aligns perfectly inside the longer one, the property whole-string
    ratios lack (functions/alignment.py; Smith & Waterman 1981).

    Text is normalized lower(trim(...)) on the JVM side; the kernel runs
    once per Arrow batch with anti-diagonal vectorization ACROSS the
    batch, and the normalization divide happens back in JVM integer/
    double arithmetic so the oracle replica is bit-equal. Plan shape:
    two key joins to attach strings + one pandas UDF projection — the
    pair volume is whatever blocking produced, never corpus x corpus.
    """
    from pyspark.sql import types as T
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf(T.LongType())
    def _sw(a: pd.Series, b: pd.Series) -> pd.Series:
        from ..functions.alignment import batch_smith_waterman

        return pd.Series(batch_smith_waterman(a, b, match, mismatch, gap))

    norm = lambda c: F.lower(F.trim(F.coalesce(c, F.lit(""))))  # noqa: E731
    recs = records.select(F.col(id_col).alias("__id"), norm(F.col(text_col)).alias("__s"))
    j = (
        pairs.select(left_col, right_col)
        .join(
            recs.select(F.col("__id").alias(left_col), F.col("__s").alias("__sl")).hint(
                "shuffle_hash"
            ),
            left_col,
        )
        .join(
            recs.select(F.col("__id").alias(right_col), F.col("__s").alias("__sr")).hint(
                "shuffle_hash"
            ),
            right_col,
        )
    )
    min_len = F.least(F.length("__sl"), F.length("__sr"))
    scored = j.withColumn("sw_score", _sw(F.col("__sl"), F.col("__sr")))
    return scored.select(
        left_col,
        right_col,
        "sw_score",
        F.when(
            min_len > 0,
            F.round(F.col("sw_score") / (F.lit(float(match)) * min_len), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("sw_sim"),
    )


def weighted_token_jaccard(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int = 1_000_000_000,
) -> DataFrame:
    """Weighted Jaccard similarity join with global IDF token weights:
    wj(a, b) = sum_{t in a∩b} idf(t) / (W(a) + W(b) - sum_{a∩b} idf(t)),
    idf(t) = ln(1 + N/df(t)) — rare tokens count more, boilerplate tokens
    barely count. The third member of the token-similarity-join family
    next to the unweighted ppjoin and the tf-idf cosine join.

    Because the weight is global per token, the shared-token mass is just
    the sum of idf over the intersection — so the pair aggregation runs
    directly on the inverted-index join (one shuffle on token, one on the
    pair key) plus two broadcast-shaped joins for the per-doc totals.
    ``max_doc_freq`` drops postings of tokens appearing in more rows
    (stop-token skew guard for corpus scale — pairs sharing ONLY such
    tokens are then missed, so leave it inert when exactness is required).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
                    lambda x: x != "",
                )
            )
        ).alias("token"),
    )
    n_docs = docs.select(F.count("*").alias("_n"))
    dfreq = toks.groupBy("token").agg(F.count("*").alias("_df"))
    w = (
        toks.join(F.broadcast(dfreq.where(F.col("_df") <= max_doc_freq)), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "token",
            F.log(F.lit(1.0) + F.col("_n") / F.col("_df")).alias("_idf"),
        )
    )
    totals = w.groupBy("id").agg(F.sum("_idf").alias("_tw"))
    left, right = w.alias("a"), w.alias("b")
    shared = (
        left.join(right, "token")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("left_id"), F.col("b.id").alias("right_id"))
        .agg(F.sum(F.col("a._idf")).alias("_s"))
    )
    ta = totals.select(F.col("id").alias("left_id"), F.col("_tw").alias("_ta"))
    tb = totals.select(F.col("id").alias("right_id"), F.col("_tw").alias("_tb"))
    wj = F.round(
        F.col("_s") / (F.col("_ta") + F.col("_tb") - F.col("_s")), 6
    ).alias("weighted_jaccard")
    return (
        shared.join(ta, "left_id")
        .join(tb, "right_id")
        .select("left_id", "right_id", wj)
        .where(F.col("weighted_jaccard") >= threshold)
    )
