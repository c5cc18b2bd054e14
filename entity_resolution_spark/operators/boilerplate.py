"""Corpus-level boilerplate removal (RefinedWeb / CCNet-style line dedup).

Web crawls repeat navigation chrome, cookie banners, and footer text across
thousands of pages; removing *corpus-frequent* segments (not just
within-document repeats — that is `functions.text.line_dedup_cols`) is a
standard step before LLM training (Penedo et al. 2023 "The RefinedWeb
Dataset", §3.2; Wenzek et al. 2020 CCNet paragraph-hash dedup).

Reference scope note: the reference engine (entity_resolution.py) has no
corpus-level text op at all — this is an engine-added training-data
operator, same family as `operators/dedup.py`.

Shape (all built-in JVM expressions, no Python in the plan):

  segment   split text into fixed-width word segments        (narrow)
  census    distinct-doc frequency per segment               (one shuffle)
  remove    anti-join exploded segments vs frequent set      (one join)
  rebuild   re-assemble kept segments in position order      (one groupBy)

Scale: the frequent-segment set is the census output filtered to
`doc_freq > max_doc_freq` — tiny relative to the corpus by construction
(only text repeated across documents survives the filter), so it
broadcasts; the explode/rebuild shuffle is O(corpus tokens), the same
cost class as any tokenizing pass and embarrassingly parallel. No
quadratic blocks anywhere: the census is a plain groupBy and the rebuild
partitions by doc id (naturally uniform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments(text_col: str, seg_words: int):
    """Fixed-width word segments of ``text_col``, as an array<string>.

    Empty / NULL text degrades to the single segment '' (split of '' on
    \\s+ is ['']), which keeps the arithmetic total — n_segments >= 1 for
    every row — and matches DuckDB string_split_regex semantics exactly.
    """
    w = f"split(trim(coalesce({text_col}, '')), '\\\\s+')"
    return F.expr(
        f"transform(sequence(1, size({w}), {seg_words}),"
        f"          i -> array_join(slice({w}, i, {seg_words}), ' '))"
    )


def boilerplate_segments(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 8,
    max_doc_freq: int = 1,
) -> DataFrame:
    """(segment, doc_freq) for segments appearing in more than
    ``max_doc_freq`` distinct documents — the corpus boilerplate set."""
    e = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(_segments(text_col, seg_words)).alias("segment"),
    )
    return (
        e.groupBy("segment")
        .agg(F.countDistinct("__id").alias("doc_freq"))
        .filter(F.col("doc_freq") > max_doc_freq)
    )


def remove_boilerplate_segments(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 8,
    max_doc_freq: int = 1,
) -> DataFrame:
    """Strip corpus-frequent segments from every document.

    Returns one row per input document:
      (id_col, clean_text, n_segments int, n_removed int)

    ``clean_text`` is the surviving segments re-joined in their original
    order ('' when everything was boilerplate). Deterministic: position
    order is carried through the rebuild, no sampling, no hashing.
    """
    segs = _segments(text_col, seg_words)
    base = docs.select(F.col(id_col), segs.alias("__segs"))

    exploded = base.select(
        id_col, F.posexplode("__segs").alias("__pos", "segment")
    )
    frequent = boilerplate_segments(docs, id_col, text_col, seg_words, max_doc_freq)

    # The frequent set is small by construction (cross-document repeats
    # only) — broadcast the anti-join probe; the corpus side never shuffles.
    kept = exploded.join(F.broadcast(frequent.select("segment")), "segment", "left_anti")

    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "segment"))),
                lambda s: s["segment"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("__n_kept"),
    )

    return (
        base.select(id_col, F.size("__segs").alias("n_segments"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("n_segments").cast("int").alias("n_segments"),
            (F.col("n_segments") - F.coalesce("__n_kept", F.lit(0)))
            .cast("int")
            .alias("n_removed"),
        )
    )
