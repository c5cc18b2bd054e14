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
    return F.round(
        F.lit(0.4) * len_score + F.lit(0.4) * alpha_ratio + F.lit(0.2) * word_score, 4
    )


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


# ---------------------------------------------------------------------------
# SimHash (64-bit) over identifier tokens
# ---------------------------------------------------------------------------

def simhash64(text: str | None) -> int:
    """64-bit SimHash over word tokens; deterministic FNV-1a token hashes.
    Returned as signed int64 (Spark LongType friendly)."""
    tokens = re.findall(r"\w+", (text or "").lower())
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    with np.errstate(over="ignore"):
        for tok in tokens:
            h = np.uint64(14695981039346656037)
            for byte in tok.encode("utf-8"):
                h = (h ^ np.uint64(byte)) * np.uint64(1099511628211)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits == np.uint64(1), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out


def batch_simhash64(texts: pd.Series) -> pd.Series:
    return pd.Series([simhash64(t) for t in texts.to_numpy(dtype=object)], dtype="int64")


def simhash_band_keys(sh: int, bands: int = 4) -> list[str]:
    """Split the 64-bit simhash into `bands` chunks — docs within Hamming
    distance (bands-1) share >= 1 chunk key (pigeonhole)."""
    u = sh & 0xFFFFFFFFFFFFFFFF
    width = 64 // bands
    mask = (1 << width) - 1
    return [f"sh:{i}:{(u >> (i * width)) & mask:x}" for i in range(bands)]
