"""Text-analysis kernels for the training-data pipeline operators.

All are deterministic, dependency-free, and shipped both as plain-Python
kernels (unit-testable) and as Spark Column expressions / pandas batches.
The Column-expression variants are preferred (JVM-side, codegen'd); the
pandas batches exist only where an expression can't express the semantics.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Normalization / tokenization (blocking-key building blocks)
# ---------------------------------------------------------------------------

_WS_RE = re.compile(r"\s+")
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
# BPE-ish word/punct splitter: words, numbers, or single non-space symbols
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def normalize_content(text: str | None) -> str:
    """Collapse whitespace runs to single spaces and strip — so
    whitespace-only variants hash identically in MinHash space."""
    if not text:
        return ""
    return _WS_RE.sub(" ", text).strip()


def normalize_basename(path: str | None) -> str:
    """Blocking-key path normalization: basename, lowercased, extension and
    digits and version markers stripped. 'src/Parser_v2.PY' -> 'parser'."""
    if not path:
        return ""
    base = path.rsplit("/", 1)[-1]
    base = base.rsplit(".", 1)[0].lower()
    base = re.sub(r"(_v?\d+|\d+)", "", base)
    return base.strip("_-. ")


def identifier_tokens(text: str | None) -> list[str]:
    """Distinct identifier-like tokens, sorted (deterministic)."""
    if not text:
        return []
    return sorted(set(_IDENT_RE.findall(text)))


# Spark Column versions (JVM-side; used in the hot path) --------------------

def norm_content_col(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def norm_basename_col(path: Column) -> Column:
    base = F.element_at(F.split(path, "/"), -1)
    no_ext = F.regexp_replace(base, r"\.[^.]*$", "")
    stripped = F.regexp_replace(F.lower(no_ext), r"(_v?\d+|\d+)", "")
    return F.regexp_replace(stripped, r"^[-_. ]+|[-_. ]+$", "")


def whitespace_token_count_col(c: Column) -> Column:
    """Whitespace token count; empty/blank string counts 0 (split('') gives
    [''] — filter empties so Spark and the SQL oracle agree)."""
    return F.size(F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != F.lit("")))


def bpe_token_count_col(c: Column) -> Column:
    """BPE-ish token count: words + numbers + individual symbols."""
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0))


# ---------------------------------------------------------------------------
# Language identification (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

# tiny per-language stopword marker sets — heuristic, deterministic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "sich", "auf"},
    "fr": {"le", "la", "les", "et", "est", "pas", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "de", "que", "y", "en", "un", "es", "por"},
}


def detect_language(text: str | None) -> str:
    """Argmax of stopword hits; ties broken by language-code order; no hits
    -> 'unknown'."""
    if not text:
        return "unknown"
    words = set(re.findall(r"[a-zA-Z]+", text.lower()))
    best_lang, best_hits = "unknown", 0
    for lang in sorted(_LANG_MARKERS):
        hits = len(words & _LANG_MARKERS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


def batch_detect_language(texts: pd.Series) -> pd.Series:
    return pd.Series([detect_language(t) for t in texts.to_numpy(dtype=object)])


# ---------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword ratios)
# ---------------------------------------------------------------------------

def quality_score_col(text: Column) -> Column:
    """Deterministic quality score in [0,1] from cheap JVM-side signals:
    length band, alpha ratio, mean word length sanity. Expressed entirely
    with builtin functions so it survives whole-stage codegen."""
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    n_tokens = whitespace_token_count_col(text)
    mean_word = F.when(n_tokens > 0, n / n_tokens).otherwise(F.lit(0.0))
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))  # saturate at 500 chars
    word_score = F.when((mean_word >= 3) & (mean_word <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    score = F.round(
        F.lit(0.4) * len_score + F.lit(0.4) * alpha_ratio + F.lit(0.2) * word_score, 4
    )
    # NULL text scores NULL, not 0.5: F.least SKIPS nulls, so without the
    # guard len_score silently becomes 1.0 for content-less rows and they
    # pass quality gates they never saw
    return F.when(text.isNotNull(), score)


def repetition_stats_cols(text: Column) -> dict[str, Column]:
    """Gopher-style repetition/quality signals (Rae et al. 2021 §A1.1) as
    pure Column expressions — per-document constants, fully codegen'd, no
    shuffle, no Python. The per-token count scans are O(words^2) within a
    document: constant work per row (docs are bounded), the right trade
    against an explode+groupBy+join-back that would shuffle the corpus
    twice per statistic.

    Returns columns keyed: n_words, frac_dup_words, top_word_share,
    top_bigram_share, mean_word_len, passes_repetition_filter. All
    fractions rounded to 6; the filter flag is computed FROM the rounded
    values so any engine replicating the arithmetic agrees exactly.
    """
    words = F.split(F.lower(F.trim(text)), r"\s+")
    n = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    counts = F.transform(words, lambda w: F.size(F.filter(words, lambda x: x == w)))
    top_word = F.when(n > 0, F.array_max(counts) / n).otherwise(F.lit(0.0))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.element_at(words, i), F.element_at(words, i + 1)),
    )
    bcounts = F.transform(bigrams, lambda b: F.size(F.filter(bigrams, lambda x: x == b)))
    top_bigram = F.when(n >= 2, F.array_max(bcounts) / (n - 1)).otherwise(F.lit(0.0))
    nb = F.size(bigrams)
    nb_distinct = F.size(F.array_distinct(bigrams))
    # duplicate-2-gram fraction (the actual Gopher repetition signal: a
    # top-share test penalizes SHORT distinct docs, where every unique
    # bigram already has share 1/(n-1))
    dup_bigram = F.when(nb > 0, (nb - nb_distinct) / nb).otherwise(F.lit(0.0))
    total_len = F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w))
    mean_word = F.when(n > 0, total_len / n).otherwise(F.lit(0.0))

    frac_dup = F.round(F.when(n > 0, (n - n_distinct) / n).otherwise(F.lit(0.0)), 6)
    top_word_r = F.round(top_word, 6)
    top_bigram_r = F.round(top_bigram, 6)
    dup_bigram_r = F.round(dup_bigram, 6)
    mean_word_r = F.round(mean_word, 6)
    return {
        "n_words": n.cast("long"),
        "frac_dup_words": frac_dup,
        "top_word_share": top_word_r,
        "top_bigram_share": top_bigram_r,
        "frac_dup_bigrams": dup_bigram_r,
        "mean_word_len": mean_word_r,
        # Gopher-flavored acceptance: mostly-distinct words, low repeated-
        # bigram mass, sane word lengths
        "passes_repetition_filter": (
            (frac_dup <= 0.85)
            & (dup_bigram_r <= 0.18)
            & (mean_word_r >= 2)
            & (mean_word_r <= 12)
        ),
    }


def redact_pii_col(c: Column) -> Column:
    """Deterministic PII masking for free-text columns: email-shaped spans
    collapse to <EMAIL>, then every remaining digit becomes '#'. Patterns
    restricted to syntax with identical semantics in Java regex and RE2 so
    an external SQL engine can replicate the result byte-for-byte."""
    no_email = F.regexp_replace(c, r"[A-Za-z0-9_.]+@[A-Za-z0-9_.]+", "<EMAIL>")
    return F.regexp_replace(no_email, r"[0-9]", "#")


_CC_CANDIDATE_RE = r"\d(?:[ -]?\d){11,18}"
_CC_MASK = "<CC_REDACTED>"


def luhn_valid_expr(digits: Column) -> Column:
    """Luhn mod-10 checksum over a pure-digit string column (ISO/IEC
    7812): from the RIGHT, odd positions count as-is, even positions
    double (minus 9 when > 9); valid iff the sum is 0 mod 10. Pure JVM
    higher-order expression (sequence + aggregate), syntax chosen for
    term-for-term replication in an external SQL engine."""
    L = F.length(digits)
    d = lambda i: F.substring(digits, i, 1).cast("int")  # noqa: E731
    # aggregate over 1..L; empty string -> sum 0 -> "valid" guarded by
    # the caller's length check
    return (
        F.aggregate(
            F.sequence(F.lit(1), F.greatest(L, F.lit(1))),
            F.lit(0),
            lambda acc, i: acc
            + F.when(
                i <= L,
                F.when(
                    ((L - i) % 2) == 1,
                    F.when(d(i) * 2 > 9, d(i) * 2 - 9).otherwise(d(i) * 2),
                ).otherwise(d(i)),
            ).otherwise(F.lit(0)),
        )
        % 10
        == 0
    )


def cc_redact_cols(c: Column) -> dict[str, Column]:
    """Credit-card detection with Luhn VALIDATION before redaction: digit
    runs (optional single space/dash separators, 12-19 digits) are
    candidates; only runs whose separator-stripped form is 13-19 digits
    AND passes the Luhn checksum are masked — the validation step that
    keeps order ids and timestamps out of the redaction (the classic
    false-positive source of digit-pattern PII scrubbers). Returns
    {'cc_candidates', 'cc_valid', 'redacted'} columns, all JVM
    higher-order expressions over one regexp_extract_all pass; patterns
    restricted to syntax with identical semantics in Java regex and RE2.
    """
    cands = F.regexp_extract_all(c, F.lit(_CC_CANDIDATE_RE), 0)
    digits_of = lambda x: F.regexp_replace(x, r"[ -]", "")  # noqa: E731

    def is_valid(x: Column) -> Column:
        dg = digits_of(x)
        return (
            (F.length(dg) >= 13) & (F.length(dg) <= 19) & luhn_valid_expr(dg)
        )

    valid = F.filter(cands, is_valid)
    redacted = F.aggregate(
        valid, c, lambda acc, x: F.replace(acc, x, F.lit(_CC_MASK))
    )
    return {
        "cc_candidates": F.size(cands),
        "cc_valid": F.size(valid),
        "redacted": redacted,
    }


_CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"
_MOJIBAKE_RE = "\u00c3[\u0080-\u00ff]|\u00e2\u20ac."  # Ã+continuation | â€+any (cp1252 artifact family)


def encoding_damage_cols(c: Column) -> dict[str, Column]:
    """Encoding-damage profile for a text column — the crawl-ingest
    triage every corpus pipeline runs before quality scoring:

    * ``n_replacement`` — U+FFFD replacement characters (a decoder
      already gave up on those bytes);
    * ``n_control`` — C0 control characters excluding tab/newline/CR
      (binary-in-text / charset confusion);
    * ``n_mojibake`` — classic UTF-8-read-as-Latin-1 artifacts
      (``Ã`` + continuation-range letter, ``â€`` punctuation family:
      the bytes of é/’/“ re-decoded wrongly);
    * ``damage_ratio`` — their sum over the character length, round-6.

    All JVM regexp counts (patterns restricted to syntax with identical
    Java-regex/RE2 semantics); one projection, no Python.
    """
    n_rep = F.size(F.regexp_extract_all(c, F.lit("\ufffd"), 0))
    n_ctl = F.size(F.regexp_extract_all(c, F.lit(_CONTROL_RE), 0))
    n_moj = F.size(F.regexp_extract_all(c, F.lit(_MOJIBAKE_RE), 0))
    length = F.length(c)
    total = (n_rep + n_ctl + n_moj).cast("double")
    return {
        "n_replacement": n_rep,
        "n_control": n_ctl,
        "n_mojibake": n_moj,
        "damage_ratio": F.when(
            length > 0, F.round(total / length, 6)
        ).otherwise(F.lit(0.0)),
    }


# ---------------------------------------------------------------------------
# Document fingerprinting (winnowed rolling hash)
# ---------------------------------------------------------------------------

def fingerprint(text: str | None, k: int = 8, window: int = 16) -> list[int]:
    """Winnowing fingerprint (Schleimer et al., SIGMOD'03): min rolling-hash
    per sliding window of k-gram hashes; deterministic, order-preserving
    dedup of picks."""
    from .minhash import shingle_hashes  # same rolling-hash field

    h = shingle_hashes(text or "", k)
    # shingle_hashes returns the *distinct sorted* hash set; for winnowing we
    # need positional hashes — recompute positionally here (small docs only;
    # the Spark path uses the vectorized variant below).
    data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if data.size == 0:
        return []
    kk = min(k, data.size)
    P = np.uint64(4294967291)
    powers = np.empty(kk, dtype=np.uint64)
    acc = np.uint64(1)
    for i in range(kk - 1, -1, -1):
        powers[i] = acc
        acc = (acc * np.uint64(257)) % P
    windows = np.lib.stride_tricks.sliding_window_view(data, kk)
    hashes = (windows * powers).sum(axis=1) % P
    if hashes.size <= window:
        return [int(hashes.min())]
    mins = np.lib.stride_tricks.sliding_window_view(hashes, window).min(axis=1)
    picks: list[int] = []
    for v in mins:
        iv = int(v)
        if not picks or picks[-1] != iv:
            picks.append(iv)
    return picks


def batch_fingerprint(texts: pd.Series, k: int = 8, window: int = 16) -> pd.Series:
    return pd.Series([fingerprint(t, k, window) for t in texts.to_numpy(dtype=object)])


def line_dedup_cols(text: Column, min_line_chars: int = 30) -> dict[str, Column]:
    """Within-document duplicate-line removal (crawl-cleaning transform:
    repeated nav/menu/footer lines) as pure Column expressions — no Python,
    no shuffle, single codegen'd projection like repetition_stats_cols.

    A line is kept iff it is shorter than ``min_line_chars`` (blank lines,
    bullets, code braces — document STRUCTURE, never collapsed) or it is
    the line's first occurrence in the document. First-occurrence checks
    are O(lines^2) within a doc — constant per row, the right trade against
    shuffling the corpus through an explode/window/re-agg.

    Returns columns keyed: clean_text, n_lines, n_removed. NULL text maps
    to (NULL, 0, 0)."""
    lines = F.split(text, "\n")
    kept = F.filter(
        lines,
        lambda x, i: (F.length(x) < min_line_chars)
        | (F.array_position(lines, x) == i.cast("long") + 1),
    )
    n = F.size(lines)
    return {
        "clean_text": F.array_join(kept, "\n"),
        "n_lines": F.when(text.isNull(), F.lit(0)).otherwise(n),
        "n_removed": F.when(text.isNull(), F.lit(0)).otherwise(n - F.size(kept)),
    }


def c4_filter_cols(text: Column) -> dict[str, Column]:
    """C4-style page cleaning (Raffel et al. 2020 §2.2) as pure Column
    expressions — single JVM projection, no Python, no shuffle.

    Line rules (a line is RETAINED iff all hold):
      - ends in a terminal punctuation mark (``.``, ``!``, ``?``, ``"``),
      - contains at least 5 whitespace words,
      - does not contain "javascript" (case-insensitive).
    Page rules (the document is KEPT iff all hold, checked in this order so
    ``drop_reason`` is deterministic):
      - does not contain "lorem ipsum" (case-insensitive) → ``lorem_ipsum``,
      - does not contain ``{`` (code/templating on a prose page) → ``brace``,
      - at least 3 retained lines → ``too_few_sentences``.
    NULL text is treated as the empty page. Outputs: clean_text (retained
    lines joined, NULL for dropped pages), n_lines_kept, kept (INT for the
    driver canonicalizer), drop_reason (NULL when kept)."""
    t = F.coalesce(text, F.lit(""))
    lines = F.split(t, "\n")

    def _line_ok(x):
        trimmed = F.trim(x)
        last = F.substring(trimmed, -1, 1)
        n_words = F.size(F.split(trimmed, r"\s+"))
        return (
            last.isin(".", "!", "?", '"')
            & (n_words >= 5)
            & ~F.contains(F.lower(x), F.lit("javascript"))
        )

    kept_lines = F.filter(lines, _line_ok)
    n_kept = F.size(kept_lines)
    lower = F.lower(t)
    reason = (
        F.when(F.contains(lower, F.lit("lorem ipsum")), F.lit("lorem_ipsum"))
        .when(F.contains(lower, F.lit("{")), F.lit("brace"))
        .when(n_kept < 3, F.lit("too_few_sentences"))
    )
    kept = reason.isNull()
    return {
        "clean_text": F.when(kept, F.array_join(kept_lines, "\n")),
        "n_lines_kept": n_kept,
        "kept": kept.cast("int"),
        "drop_reason": reason,
    }


GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_BULLETS = ("•", "‣", "▪", "-", "*")


def gopher_rules_cols(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
) -> dict[str, Column]:
    """The Gopher / MassiveWeb document-quality rules (Rae et al. 2021
    §A1.1) as pure Column expressions — one JVM projection, no Python, no
    shuffle. A document PASSES iff all seven hold:

      1. word count in [min_words, max_words]
      2. mean word length in [3, 10]
      3. symbol-to-word ratio (``#`` / ``...`` / ``…``) <= 0.1
      4. <= 90% of non-empty lines start with a bullet character
      5. <= 30% of non-empty lines end with an ellipsis
      6. >= 80% of words contain an alphabetic character
      7. >= 2 distinct "required" stop words present (GOPHER_STOP_WORDS)

    Fractions are rounded to 6 and every rule flag is computed FROM the
    rounded value (the repetition_stats_cols convention), so any engine
    replicating the arithmetic agrees exactly. NULL text yields NULL
    stats and passes_gopher = 0. Flags are INTs for the driver
    canonicalizer.
    """
    words = F.filter(F.split(text, r"\s+"), lambda x: x != "")
    n = F.size(words)
    sum_len = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    mean_len = F.round(F.when(n > 0, sum_len / n).otherwise(F.lit(0.0)), 6)

    def _count_occurrences(needle: str) -> Column:
        return (F.length(text) - F.length(F.replace(text, F.lit(needle)))) / len(needle)

    n_symbols = _count_occurrences("#") + _count_occurrences("...") + _count_occurrences("…")
    symbol_ratio = F.round(F.when(n > 0, n_symbols / n).otherwise(F.lit(0.0)), 6)

    lines = F.filter(
        F.transform(F.split(text, "\n"), F.trim), lambda x: x != ""
    )
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda x: F.substring(x, 1, 1).isin(*_GOPHER_BULLETS),
        )
    )
    ellipsis = F.size(
        F.filter(lines, lambda x: x.endswith("...") | x.endswith("…"))
    )
    frac_bullet = F.round(F.when(n_lines > 0, bullet / n_lines).otherwise(F.lit(0.0)), 6)
    frac_ellipsis = F.round(F.when(n_lines > 0, ellipsis / n_lines).otherwise(F.lit(0.0)), 6)

    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    frac_alpha = F.round(F.when(n > 0, alpha_words / n).otherwise(F.lit(0.0)), 6)

    words_l = F.transform(words, F.lower)
    n_stop = sum(
        (F.array_contains(words_l, s).cast("int") for s in GOPHER_STOP_WORDS),
        start=F.lit(0),
    )

    passes = (
        (n >= min_words) & (n <= max_words)
        & (mean_len >= 3.0) & (mean_len <= 10.0)
        & (symbol_ratio <= 0.1)
        & (frac_bullet <= 0.9)
        & (frac_ellipsis <= 0.3)
        & (frac_alpha >= 0.8)
        & (n_stop >= 2)
    )
    notnull = text.isNotNull()
    return {
        "n_words": F.when(notnull, n.cast("long")),
        "mean_word_len": F.when(notnull, mean_len),
        "symbol_word_ratio": F.when(notnull, symbol_ratio),
        "frac_bullet_lines": F.when(notnull, frac_bullet),
        "frac_ellipsis_lines": F.when(notnull, frac_ellipsis),
        "frac_alpha_words": F.when(notnull, frac_alpha),
        "n_stop_words": F.when(notnull, n_stop.cast("int")),
        "passes_gopher": F.coalesce(passes.cast("int"), F.lit(0)),
    }


def fingerprint_positions(
    text: str | None, k: int = 8, window: int = 16
) -> list[tuple[int, int]]:
    """Winnowing picks WITH their k-gram start positions: per sliding window
    of k-gram rolling hashes, the first-occurrence minimum; consecutive
    windows re-selecting the same position emit once. Returns
    ``[(pos, fp), ...]`` with 0-based char positions, ascending (window-min
    positions are provably non-decreasing under first-occurrence argmin:
    an earlier equal-or-smaller hash inside the next window would already
    have been this window's pick).

    Unlike :func:`fingerprint` (which dedups by VALUE and shrinks k for
    short docs), this kernel returns [] for docs shorter than k chars —
    the same convention as the DuckDB oracle — and dedups by POSITION,
    because its consumer marks char ranges, not hash sets. ASCII corpora
    only (hashes are over UTF-8 bytes, positions are used as char offsets;
    same guard as the fingerprint oracle)."""
    data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if data.size < k:
        return []
    P = np.uint64(4294967291)
    powers = np.empty(k, dtype=np.uint64)
    acc = np.uint64(1)
    for i in range(k - 1, -1, -1):
        powers[i] = acc
        acc = (acc * np.uint64(257)) % P
    windows = np.lib.stride_tricks.sliding_window_view(data, k)
    hashes = (windows * powers).sum(axis=1) % P
    if hashes.size <= window:
        p = int(hashes.argmin())
        return [(p, int(hashes[p]))]
    sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
    pos = sw.argmin(axis=1) + np.arange(sw.shape[0])
    keep = np.empty(pos.shape[0], dtype=bool)
    keep[0] = True
    keep[1:] = pos[1:] != pos[:-1]
    ps = pos[keep]
    return [(int(p), int(hashes[p])) for p in ps]


def batch_fingerprint_positions(
    texts: pd.Series, k: int = 8, window: int = 16
) -> pd.Series:
    return pd.Series(
        [fingerprint_positions(t, k, window) for t in texts.to_numpy(dtype=object)]
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit) over identifier tokens
# ---------------------------------------------------------------------------

# token hash for SimHash: tokens land in a fixed-width byte matrix (numpy
# 'S' dtype pads/truncates in C), one weighted-sum + splitmix64 finisher
# hashes the whole batch in a single vectorized pass. Tokens are
# distinguished beyond the width by their exact length term.
_SIMHASH_TOKEN_WIDTH = 24
_BIT_IDX = np.arange(64, dtype=np.uint64)


def _splitmix64(h: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = (h + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))


def _token_hashes64(tokens: list[str]) -> np.ndarray:
    """(n_tokens,) uint64 — one numpy pass over the whole token batch.

    The padded fixed-width byte matrix is viewed zero-copy as 3 uint64
    words per token (no column expansion); the hash is a wraparound
    multiply-xor of the words plus an exact-length term (disambiguating
    tokens that collide after width truncation), splitmix64-finished.
    """
    enc = [t.encode("utf-8") for t in tokens]  # 'S' dtype can't hold non-ASCII str
    m = np.array(enc, dtype=f"S{_SIMHASH_TOKEN_WIDTH}")
    w = np.ascontiguousarray(m).view(np.uint64).reshape(len(tokens), 3)
    lens = np.fromiter((len(b) for b in enc), dtype=np.uint64, count=len(enc))
    with np.errstate(over="ignore"):
        raw = (
            w[:, 0] * np.uint64(0x9E3779B97F4A7C15)
            ^ w[:, 1] * np.uint64(0xC2B2AE3D27D4EB4F)
            ^ w[:, 2] * np.uint64(0x165667B19E3779F9)
        ) + lens * np.uint64(0xD6E8FEB86659FD93)
    return _splitmix64(raw.astype(np.uint64))


_REDUCEAT_SEG = 200  # uint8-safe segment length for the bit-vote reduceat


def batch_simhash64(texts: pd.Series) -> pd.Series:
    """Vectorized batch SimHash: tokenize per doc (C-level regex), hash ALL
    tokens of the batch in one numpy pass, unpack hash bits with
    np.unpackbits, and bit-vote per doc with a chunked uint8 add.reduceat
    (segments <= 200 rows can't overflow) — no per-token Python loop
    (round-1 verdict: the FNV per-token loop was the slowest kernel in the
    repo). Bit i of the result is 1 iff a strict majority of token hashes
    set bit i; token-less docs hash to 0."""
    toks_per_doc: list[list[str]] = [
        re.findall(r"\w+", (t or "").lower()) for t in texts.to_numpy(dtype=object)
    ]
    all_counts = np.fromiter(
        (len(ts) for ts in toks_per_doc), dtype=np.int64, count=len(toks_per_doc)
    )
    flat = [tok for ts in toks_per_doc for tok in ts]
    out = np.zeros(len(toks_per_doc), dtype=np.int64)
    if flat:
        h = _token_hashes64(flat)
        bits = np.unpackbits(
            h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        )  # (n_tokens, 64) uint8 in {0,1}
        nonzero = all_counts > 0
        counts = all_counts[nonzero]
        starts = (np.cumsum(all_counts) - all_counts)[nonzero]
        # split each doc's token run into <=_REDUCEAT_SEG segments so the
        # uint8 reduceat can't overflow, then re-aggregate segments in int32
        nseg = (counts + _REDUCEAT_SEG - 1) // _REDUCEAT_SEG
        seg_off = np.arange(int(nseg.sum())) - np.repeat(np.cumsum(nseg) - nseg, nseg)
        sub_starts = np.repeat(starts, nseg) + seg_off * _REDUCEAT_SEG
        sub = np.add.reduceat(bits, sub_starts, axis=0).astype(np.int32)
        seg_starts = (np.cumsum(nseg) - nseg).astype(np.int64)
        ones = np.add.reduceat(sub, seg_starts, axis=0)  # (n_nonzero_docs, 64)
        sh = (2 * ones > counts[:, None]).astype(np.uint64) @ (np.uint64(1) << _BIT_IDX)
        out[nonzero] = sh.astype(np.int64)  # two's-complement reinterpret
    return pd.Series(out, dtype="int64")


def simhash64(text: str | None) -> int:
    """64-bit SimHash over word tokens, signed int64 (Spark LongType
    friendly). Scalar wrapper over the vectorized batch kernel."""
    return int(batch_simhash64(pd.Series([text]))[0])


def simhash_band_keys(sh: int, bands: int = 4) -> list[str]:
    """Split the 64-bit simhash into `bands` chunks — docs within Hamming
    distance (bands-1) share >= 1 chunk key (pigeonhole)."""
    u = sh & 0xFFFFFFFFFFFFFFFF
    width = 64 // bands
    mask = (1 << width) - 1
    return [f"sh:{i}:{(u >> (i * width)) & mask:x}" for i in range(bands)]


def readability_cols(text: Column) -> dict[str, Column]:
    """LIX readability signals (Björnsson 1968) as pure Column expressions
    — per-document constants, fully codegen'd, no UDF: word count
    (whitespace tokens), sentence count (runs of [.!?], min 1), long-word
    count (> 6 chars), and lix = words/sentences + 100*long_words/words
    (rounded to 4). Blank/NULL text yields NULL lix (0 words)."""
    t = F.trim(F.coalesce(text, F.lit("")))
    toks = F.filter(F.split(t, r"\s+"), lambda x: x != "")
    n_words = F.size(toks)
    n_long = F.size(F.filter(toks, lambda x: F.length(x) > 6))
    n_sent = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1))
    lix = F.when(
        n_words > 0,
        F.round(
            n_words / n_sent.cast("double")
            + F.lit(100.0) * n_long / n_words,
            4,
        ),
    )
    return {
        "n_words": n_words.cast("long"),
        "n_sentences": n_sent.cast("long"),
        "n_long_words": n_long.cast("long"),
        "lix": lix,
    }
