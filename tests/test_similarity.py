"""Kernel parity tests (SURVEY.md §5.2 item 1).

fuzz_ratio must be bit-identical to fuzzywuzzy+python-Levenshtein semantics:
ratio = round(100 * 2*LCS/(len1+len2)), empty -> 0 (SURVEY.md §1.3).
Verified against a plain DP oracle plus known published fuzz.ratio values.
"""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from entity_resolution_spark.functions.similarity import (
    fuzz_ratio,
    indel_distance,
    jaro_winkler,
    lcs_length,
    ratio_upper_bound,
    token_jaccard,
)


def lcs_dp(a: str, b: str) -> int:
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0] * (len(b) + 1)
        for j, cb in enumerate(b):
            cur[j + 1] = prev[j] + 1 if ca == cb else max(prev[j + 1], cur[j])
        prev = cur
    return prev[len(b)]


@given(st.text(alphabet="abcXYZ _\n", max_size=40), st.text(alphabet="abcXYZ _\n", max_size=40))
@settings(max_examples=300, deadline=None)
def test_lcs_matches_dp_oracle(a, b):
    assert lcs_length(a, b) == lcs_dp(a, b)


def test_lcs_random_long():
    rng = random.Random(42)
    for _ in range(20):
        a = "".join(rng.choice("abcdef(){}:\n ") for _ in range(rng.randrange(50, 400)))
        b = "".join(rng.choice("abcdef(){}:\n ") for _ in range(rng.randrange(50, 400)))
        assert lcs_length(a, b) == lcs_dp(a, b)


def test_fuzz_ratio_known_values():
    # published fuzzywuzzy examples
    assert fuzz_ratio("this is a test", "this is a test!") == 97
    assert fuzz_ratio("fuzzy wuzzy was a bear", "wuzzy fuzzy was a bear") == 91
    assert fuzz_ratio("abc", "abc") == 100
    assert fuzz_ratio("abc", "xyz") == 0


def test_fuzz_ratio_empty_guards():
    # fuzzywuzzy's check_empty_string / check_for_none -> 0
    assert fuzz_ratio("", "") == 0
    assert fuzz_ratio("a", "") == 0
    assert fuzz_ratio(None, "a") == 0


@given(st.text(alphabet="abQ ", max_size=25), st.text(alphabet="abQ ", max_size=25))
@settings(max_examples=200, deadline=None)
def test_fuzz_ratio_formula(a, b):
    if not a or not b:
        assert fuzz_ratio(a, b) == 0
    else:
        expected = int(round(200.0 * lcs_dp(a, b) / (len(a) + len(b))))
        assert fuzz_ratio(a, b) == expected
        assert fuzz_ratio(a, b) <= ratio_upper_bound(len(a), len(b)) + 0.51


def test_indel_distance():
    assert indel_distance("abc", "abd") == 2  # substitution costs 2
    assert indel_distance("abc", "abc") == 0
    assert indel_distance("abc", "ab") == 1


def test_jaro_winkler_textbook():
    assert round(jaro_winkler("MARTHA", "MARHTA"), 4) == 0.9611
    assert round(jaro_winkler("DWAYNE", "DUANE"), 4) == 0.84
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("", "") == 1.0  # both empty: identical
    assert jaro_winkler("a", "") == 0.0
    assert jaro_winkler(None, "x") == 0.0


def test_token_jaccard():
    assert token_jaccard(["a", "b"], ["b", "c"]) == 1 / 3
    assert token_jaccard([], []) == 0.0  # reference empty-overlap convention
    assert token_jaccard(["a"], ["a", "a"]) == 1.0


def test_native_lcs_bit_identical_to_python():
    """The compiled kernel (if a C toolchain exists here) must agree with
    the pure-Python big-int kernel on every input class: unicode, empties,
    Nones, equal strings, long near-dups."""
    import random

    import numpy as np

    from entity_resolution_spark.functions._lcs_native import (
        get_lib,
        lcs_batch_native,
    )

    if get_lib() is None:
        import shutil

        import pytest

        # only a host genuinely lacking a C compiler may skip; if `cc`
        # exists, a None lib means the kernel build broke — fail loudly
        cc = shutil.which(__import__("os").environ.get("CC", "cc"))
        assert cc is None, (
            f"C toolchain present at {cc} but the native kernel failed "
            "to build — get_lib() returned None"
        )
        pytest.skip("no C toolchain — pure-Python path is the only path")
    random.seed(13)
    alpha = "abcdef XYZ_09é中🎉"
    cases = [("", ""), ("a", ""), ("", "b"), ("abc", "abc"), ("x" * 64, "x" * 64)]
    for _ in range(400):
        n1, n2 = random.randint(0, 150), random.randint(0, 150)
        cases.append(
            (
                "".join(random.choice(alpha) for _ in range(n1)),
                "".join(random.choice(alpha) for _ in range(n2)),
            )
        )
    for _ in range(20):
        a = "".join(random.choice(alpha) for _ in range(random.randint(500, 2200)))
        b = list(a)
        for _ in range(len(a) // 10):
            b[random.randrange(len(b))] = random.choice(alpha)
        cases.append((a, "".join(b)))
    A = np.array([c[0] for c in cases], dtype=object)
    B = np.array([c[1] for c in cases], dtype=object)
    got = lcs_batch_native(A, B)
    exp = np.array([lcs_length(a, b) for a, b in cases])
    assert (got == exp).all()


def test_native_lcs_hybrid_paths_exact():
    """The hybrid kernel's three paths — affix-strip shortcut, capped
    Myers search, bit-parallel overflow fallback — must all return the
    EXACT LCS. Cases are built to pin each path: long shared affixes with
    tiny middles (Myers at small d), far pairs (cap overflow), pure-affix
    pairs (no middle at all), and edit distances straddling the
    64 + min/16 cap."""
    import random

    import numpy as np
    import pytest

    from entity_resolution_spark.functions._lcs_native import (
        get_lib,
        lcs_batch_native,
    )

    if get_lib() is None:
        pytest.skip("no C toolchain")
    random.seed(7)
    alpha = "abcdefgh"
    cases = []
    # near-dups: shared 5k prefix/suffix, k edits in a 400-char middle
    pre = "".join(random.choice(alpha) for _ in range(5000))
    suf = "".join(random.choice(alpha) for _ in range(5000))
    mid = "".join(random.choice(alpha) for _ in range(400))
    for k in (0, 1, 7, 50, 120, 300, 400):  # straddles the 64+min/16 cap
        m2 = list(mid)
        for _ in range(k):
            m2[random.randrange(len(m2))] = random.choice(alpha)
        cases.append((pre + mid + suf, pre + "".join(m2) + suf))
    # pure-affix: one side is a subsequence cut of the other
    cases.append((pre + suf, pre + "xyz" + suf))
    cases.append((pre, pre + suf))
    # far pairs: independent random long strings (guaranteed overflow)
    for n in (1000, 3000):
        cases.append(
            (
                "".join(random.choice(alpha) for _ in range(n)),
                "".join(random.choice(alpha) for _ in range(n)),
            )
        )
    # asymmetric lengths with shared prefix only
    cases.append((pre + "a" * 2000, pre))
    A = np.array([c[0] for c in cases], dtype=object)
    B = np.array([c[1] for c in cases], dtype=object)
    got = lcs_batch_native(A, B)
    exp = np.array([lcs_length(a, b) for a, b in cases])
    assert (got == exp).all(), list(zip(got, exp))


@given(
    st.lists(
        st.tuples(
            st.text(max_size=300),  # arbitrary unicode, any codepoint
            st.text(max_size=300),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_native_hybrid_property_parity(pairs):
    """Property pin: for ARBITRARY unicode inputs the hybrid native
    kernel (affix strip / capped Myers / bit-parallel fallback — the path
    taken depends on the input shape, so hypothesis explores all three)
    equals the pure-Python big-int kernel exactly."""
    import numpy as np

    from entity_resolution_spark.functions._lcs_native import (
        get_lib,
        lcs_batch_native,
    )

    if get_lib() is None:
        import pytest

        pytest.skip("no C toolchain")
    A = np.array([p[0] for p in pairs], dtype=object)
    B = np.array([p[1] for p in pairs], dtype=object)
    got = lcs_batch_native(A, B)
    exp = [lcs_length(a, b) for a, b in pairs]
    assert list(got) == exp


def test_batch_fuzz_ratio_matches_scalar():
    import random

    import numpy as np
    import pandas as pd

    from entity_resolution_spark.functions.similarity import batch_fuzz_ratio

    random.seed(3)
    alpha = "abcd ef_gh"
    vals = [None, "", "abc"] + [
        "".join(random.choice(alpha) for _ in range(random.randint(1, 300)))
        for _ in range(200)
    ]
    a = [random.choice(vals) for _ in range(500)]
    b = [x if random.random() < 0.3 else random.choice(vals) for x in a]
    got = batch_fuzz_ratio(pd.Series(a, dtype=object), pd.Series(b, dtype=object))
    exp = np.array([fuzz_ratio(x, y) for x, y in zip(a, b)])
    assert (got == exp).all()
