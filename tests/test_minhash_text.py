"""MinHash / text-kernel determinism and accuracy tests (SURVEY.md §5.2)."""

import numpy as np

from entity_resolution_spark.config import MinHashConfig
from entity_resolution_spark.functions.minhash import (
    band_keys_from_signature,
    batch_band_keys,
    estimated_jaccard,
    minhash_signature,
    shingle_hashes,
)
from entity_resolution_spark.functions.text import (
    detect_language,
    fingerprint,
    identifier_tokens,
    normalize_basename,
    normalize_content,
    simhash64,
    simhash_band_keys,
)

CFG = MinHashConfig()


def test_shingles_deterministic_and_distinct():
    h1 = shingle_hashes("hello world, hello world", 5)
    h2 = shingle_hashes("hello world, hello world", 5)
    assert (h1 == h2).all()
    assert len(np.unique(h1)) == len(h1)
    assert shingle_hashes("", 5).size == 0
    assert shingle_hashes("ab", 5).size == 1  # shorter than k -> whole text


def test_minhash_estimates_jaccard():
    a = "def foo(x):\n    return x + 1\n" * 30
    b = a.replace("foo", "qux")
    ha, hb = shingle_hashes(a, CFG.shingle_k), shingle_hashes(b, CFG.shingle_k)
    inter = np.intersect1d(ha, hb).size
    true_j = inter / (ha.size + hb.size - inter)
    est = estimated_jaccard(minhash_signature(a, CFG), minhash_signature(b, CFG))
    assert abs(est - true_j) < 0.15  # 128 hashes -> s.e. ~ sqrt(j(1-j)/128)
    assert estimated_jaccard(minhash_signature(a, CFG), minhash_signature(a, CFG)) == 1.0


def test_band_keys_identical_for_identical_text():
    s = minhash_signature("some content here", CFG)
    k1 = band_keys_from_signature(s, CFG)
    assert len(k1) == CFG.bands
    assert len(set(k1)) >= 1
    import pandas as pd

    k2 = batch_band_keys(pd.Series(["some content here"]), CFG)[0]
    assert k1 == k2


def test_high_jaccard_shares_band():
    # varied (non-repetitive) content: the shingle set is large, so a small
    # suffix edit keeps Jaccard near 1 and >=1 LSH band must collide
    a = "\n".join(f"value_{i} = compute_{i}(input_{i}, {i * 7})" for i in range(80))
    b = a + "\n# trailing comment\n"
    ka = set(band_keys_from_signature(minhash_signature(a, CFG), CFG))
    kb = set(band_keys_from_signature(minhash_signature(b, CFG), CFG))
    assert ka & kb  # near-identical docs must collide in >=1 band


def test_normalize():
    assert normalize_content("a   b\n\n  c\t") == "a b c"
    assert normalize_content(None) == ""
    assert normalize_basename("src/core/Parser_v2.PY") == "parser"
    assert normalize_basename("lib/scheduler.go") == "scheduler"
    assert normalize_basename(None) == ""


def test_identifier_tokens_sorted_distinct():
    toks = identifier_tokens("foo bar foo baz_1 123")
    assert toks == ["bar", "baz_1", "foo"]


def test_detect_language():
    assert detect_language("the cat is in the house and that is fine for now") == "en"
    assert detect_language("der hund ist nicht auf der wiese und das ist gut") == "de"
    assert detect_language("") == "unknown"
    assert detect_language("zzz qqq") == "unknown"


def test_fingerprint_deterministic_and_robust():
    t = "def f(x):\n    return x * 2\n" * 20
    f1, f2 = fingerprint(t), fingerprint(t)
    assert f1 == f2 and len(f1) > 0
    assert fingerprint("") == []
    # shared region -> shared picks
    other = t + "completely different tail content 12345\n" * 5
    assert set(f1) & set(fingerprint(other))


def test_simhash_near_duplicates_close():
    a = "the quick brown fox jumps over the lazy dog " * 10
    b = a + " extra token"
    c = "entirely unrelated words about database partitioning strategies " * 10
    ha, hb, hc = simhash64(a), simhash64(b), simhash64(c)
    ham_ab = bin((ha ^ hb) & 0xFFFFFFFFFFFFFFFF).count("1")
    ham_ac = bin((ha ^ hc) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham_ab < ham_ac
    assert ham_ab <= 6
    assert simhash64("") == 0
    keys = simhash_band_keys(ha, 4)
    assert len(keys) == 4
    assert len(set(keys) & set(simhash_band_keys(hb, 4))) >= 1  # hamming<=3 -> shared chunk
