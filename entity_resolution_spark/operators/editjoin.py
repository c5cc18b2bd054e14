"""Edit-distance similarity self-join with q-gram prefix filtering (Ed-Join).

Classic string-similarity join (Xiao, Wang, Lin — VLDB 2008 "Ed-Join"; the
reference engine exposes edit-ratio scoring only pairwise, entity_resolution
``similarity.py`` — this operator gives the JOIN form a record-linkage
pipeline needs: all pairs within edit distance tau, without the O(n^2)
cross-compare).

Filtering theory (soundness of the candidate set):

* one edit operation (insert / delete / substitute) destroys at most ``q``
  of a string's q-grams, so ``ed(x, y) <= tau`` implies the q-gram SETS
  overlap in at least ``max(|Gx|, |Gy|) - q*tau`` grams;
* by the prefix-filtering principle, sets with overlap ``>= |G| - q*tau``
  must share a token within each side's first ``q*tau + 1`` grams under
  ONE global order (we use rarest-first, ties by gram text — deterministic);
* a length filter ``abs(len(x) - len(y)) <= tau`` is applied on the
  candidates (tau edits change length by at most tau).

Strings are padded with ``q-1`` sentinel chars on each side so every
non-empty string owns at least one gram (and boundary characters gain
discriminating grams — the standard positional-padding trick).  Candidates
are then verified EXACTLY with the built-in ``levenshtein`` (JVM,
whole-stage codegen) — so the prefix/length filters govern efficiency
only, never correctness; pytest pins equality against the un-filtered
brute-force join and asserts the candidate count actually shrank.

Scale shape: the only shuffles are the gram-frequency census, the
prefix-posting equi-join (rarest-first prefixes keep posting lists short
— the whole point), and the verify join back to the strings.  No UDF,
no crossJoin, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sentinels outside any real text alphabet (control chars)
_PAD_L = "\x01"
_PAD_R = "\x02"


def _grams(col, q: int):
    """All q-grams of the padded string as a distinct array (JVM-only)."""
    padded = F.concat(
        F.lit(_PAD_L * (q - 1)), col, F.lit(_PAD_R * (q - 1))
    )
    # sequence over start offsets, substring per offset
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(padded) - (q - 1)),
            lambda i: padded.substr(i, F.lit(q)),
        )
    )


def edit_distance_join(
    strings: DataFrame,
    tau: int,
    q: int = 2,
    id_col: str = "id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs with levenshtein(x, y) <= tau -> (left_id, right_id, distance).

    Exact (verification with the built-in levenshtein); the q-gram prefix
    filter only prunes candidates.  ``left_id < right_id`` de-dups the
    symmetric pair.
    """
    if tau < 0:
        raise ValueError("tau must be >= 0")
    if q < 2:
        raise ValueError("q must be >= 2")
    s = strings.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col).cast("string"), F.lit("")).alias("txt"),
    )
    g = s.select("id", "txt", F.explode(_grams(F.col("txt"), q)).alias("gram"))
    freq = g.groupBy("gram").agg(F.count(F.lit(1)).alias("__f"))
    # rarest-first canonical order, deterministic tie-break on gram text
    canon = (
        g.join(freq.hint("shuffle_hash"), "gram")
        .groupBy("id", "txt")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__f").alias("f"), F.col("gram").alias("g")))
                ),
                lambda x: x["g"],
            ).alias("grams")
        )
        .localCheckpoint(eager=True)
    )
    prefix_len = q * tau + 1
    pre = canon.select(
        "id",
        F.length("txt").alias("n"),
        F.explode(F.slice("grams", 1, prefix_len)).alias("gram"),
    )
    a = pre.select("gram", F.col("id").alias("left_id"), F.col("n").alias("__nl"))
    b = pre.select("gram", F.col("id").alias("right_id"), F.col("n").alias("__nr"))
    cand = (
        a.join(b, "gram")
        .where(
            (F.col("left_id") < F.col("right_id"))
            & (F.abs(F.col("__nl") - F.col("__nr")) <= tau)
        )
        .select("left_id", "right_id")
    )
    # SHORT-STRING FALLBACK: the prefix guarantee needs |G| - q*tau >= 1;
    # a string with <= q*tau distinct grams (len roughly <= q*tau) can lose
    # its entire gram set to tau edits, so pair it unconditionally with every
    # string in its length band.  The short set is tiny by construction
    # (bounded string length), so it broadcasts; a corpus dominated by
    # <= q*tau-char strings would degrade this to a band join — documented,
    # and the band filter still bounds each short row's partners.
    sizes = canon.select("id", F.length("txt").alias("n"), F.size("grams").alias("ng"))
    shorts = sizes.where(F.col("ng") <= q * tau)
    cand_short = (
        F.broadcast(shorts.select(F.col("id").alias("__sid"), F.col("n").alias("__sn")))
        .join(
            sizes.select(F.col("id").alias("__oid"), F.col("n").alias("__on")),
            F.abs(F.col("__sn") - F.col("__on")) <= tau,
        )
        .where(F.col("__sid") != F.col("__oid"))
        .select(
            F.least("__sid", "__oid").alias("left_id"),
            F.greatest("__sid", "__oid").alias("right_id"),
        )
    )
    cand = cand.union(cand_short).distinct()
    lt = canon.select(F.col("id").alias("left_id"), F.col("txt").alias("__lx"))
    rt = canon.select(F.col("id").alias("right_id"), F.col("txt").alias("__rx"))
    return (
        cand.join(lt.hint("shuffle_hash"), "left_id")
        .join(rt.hint("shuffle_hash"), "right_id")
        .withColumn("distance", F.levenshtein("__lx", "__rx"))
        .where(F.col("distance") <= tau)
        .select("left_id", "right_id", "distance")
    )


def edit_join_candidate_count(
    strings: DataFrame,
    tau: int,
    q: int = 2,
    id_col: str = "id",
    text_col: str = "text",
) -> int:
    """Diagnostic: distinct candidate pairs before levenshtein verification."""
    s = strings.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col).cast("string"), F.lit("")).alias("txt"),
    )
    g = s.select("id", F.explode(_grams(F.col("txt"), q)).alias("gram"))
    freq = g.groupBy("gram").agg(F.count(F.lit(1)).alias("__f"))
    canon = (
        g.join(freq, "gram")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__f").alias("f"), F.col("gram").alias("g")))
                ),
                lambda x: x["g"],
            ).alias("grams")
        )
    )
    pre = canon.select("id", F.explode(F.slice("grams", 1, q * tau + 1)).alias("gram"))
    a = pre.select("gram", F.col("id").alias("l"))
    b = pre.select("gram", F.col("id").alias("r"))
    return (
        a.join(b, "gram").where(F.col("l") < F.col("r")).select("l", "r").distinct().count()
    )
