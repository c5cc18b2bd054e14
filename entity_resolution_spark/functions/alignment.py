"""Smith-Waterman local-alignment scoring (Smith & Waterman 1981) —
batched, anti-diagonal-vectorized, integer arithmetic.

The local-alignment complement to the engine's global measures
(fuzz.ratio LCS, Jaro-Winkler): it finds the best-scoring ALIGNED REGION
between two strings, so a shared substring scores highly even when the
strings disagree everywhere else — the classic signal for embedded /
transliterated name variants that whole-string ratios dilute
(Bilenko & Mooney 2003 use it as a trainable linkage metric).

Scoring: match +``match``, mismatch ``mismatch``, linear gap -``gap``
per gap character; H(i,j) = max(0, diag + s, up - gap, left - gap); the
score is max over all cells. All integers, so results are exact and the
DuckDB oracle replica (contract/warehouse_ops.py) is bit-equal.

Vectorization: one numpy pass per ANTI-DIAGONAL over the whole Arrow
batch at once — strings are padded into (batch x maxlen) codepoint
matrices and every pair advances together, so the Python-level loop is
O(maxlen_a + maxlen_b) per batch, not per pair. Cells outside a pair's
(la x lb) board are masked to 0, which IS the Smith-Waterman boundary
condition, so shorter pairs simply coast.
"""

from __future__ import annotations

import numpy as np


def _codepoint_matrix(strings, max_len: int) -> np.ndarray:
    """(n x max_len) int64 codepoint matrix, zero-padded. Padded cells are
    never read through a valid-cell mask, so the pad value is arbitrary.
    """
    out = np.zeros((len(strings), max_len), dtype=np.int64)
    for k, s in enumerate(strings):
        if s:
            out[k, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
    return out


def batch_smith_waterman(
    a, b, match: int = 2, mismatch: int = -1, gap: int = 1
) -> np.ndarray:
    """Smith-Waterman scores for aligned sequences of string pairs ->
    int64 array. None is treated as the empty string (score 0).
    """
    if gap < 0:
        raise ValueError("gap is a penalty magnitude; must be >= 0")
    a = ["" if x is None else x for x in a]
    b = ["" if x is None else x for x in b]
    n = len(a)
    scores = np.zeros(n, dtype=np.int64)
    if n == 0:
        return scores
    la = np.array([len(x) for x in a], dtype=np.int64)
    lb = np.array([len(x) for x in b], dtype=np.int64)
    la_max, lb_max = int(la.max()), int(lb.max())
    if la_max == 0 or lb_max == 0:
        return scores
    A = _codepoint_matrix(a, la_max)
    B = _codepoint_matrix(b, lb_max)
    # H over the previous two anti-diagonals, indexed by i = 1..la_max
    # (column 0 is the H(0, j) = 0 boundary)
    prev = np.zeros((n, la_max + 1), dtype=np.int64)
    cur = np.zeros((n, la_max + 1), dtype=np.int64)
    for d in range(2, la_max + lb_max + 1):
        p_lo, p_hi = max(1, d - lb_max), min(la_max, d - 1)
        if p_lo > p_hi:
            continue
        ps = np.arange(p_lo, p_hi + 1)
        s = np.where(A[:, ps - 1] == B[:, d - ps - 1], match, mismatch)
        v = np.maximum(
            0,
            np.maximum(
                prev[:, ps - 1] + s,
                np.maximum(cur[:, ps - 1] - gap, cur[:, ps] - gap),
            ),
        )
        j = d - ps
        valid = (
            (ps[None, :] <= la[:, None])
            & (j[None, :] >= 1)
            & (j[None, :] <= lb[:, None])
        )
        v = np.where(valid, v, 0)
        new = np.zeros_like(cur)
        new[:, ps] = v
        np.maximum(scores, v.max(axis=1), out=scores)
        prev, cur = cur, new
    return scores


def sw_score_ref(a: str, b: str, match: int = 2, mismatch: int = -1, gap: int = 1) -> int:
    """Plain-Python cell-by-cell reference DP (tests pin the vectorized
    kernel against this)."""
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0
    H = [[0] * (lb + 1) for _ in range(la + 1)]
    best = 0
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            s = match if a[i - 1] == b[j - 1] else mismatch
            H[i][j] = max(
                0, H[i - 1][j - 1] + s, H[i - 1][j] - gap, H[i][j - 1] - gap
            )
            best = max(best, H[i][j])
    return best
