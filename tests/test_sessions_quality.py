"""Unit semantics for the round-2 pipeline additions: gap sessionization,
Gopher-style repetition stats, and PII redaction."""

import datetime as dt

from conftest import SF_DIR

from pyspark.sql import functions as F

from entity_resolution_spark.functions.text import redact_pii_col, repetition_stats_cols
from entity_resolution_spark.operators.sessions import session_summary, sessionize


def _events(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: two sessions split by a 2h gap
        (1, 1, t0),
        (2, 1, t0 + dt.timedelta(minutes=10)),
        (3, 1, t0 + dt.timedelta(hours=2, minutes=15)),
        # user 2: one session, equal-timestamp tie broken by event_id
        (4, 2, t0),
        (5, 2, t0),
        # user 2: exactly-at-gap boundary: 1800s diff is NOT a new session
        (6, 2, t0 + dt.timedelta(seconds=1800)),
        # but 1801s after that IS
        (7, 2, t0 + dt.timedelta(seconds=3601)),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_sessionize_gap_semantics(spark):
    out = {
        r["event_id"]: (r["session_idx"], r["is_session_start"])
        for r in sessionize(_events(spark)).collect()
    }
    assert out[1] == (0, True)
    assert out[2] == (0, False)
    assert out[3] == (1, True)
    assert out[4] == (0, True)
    assert out[5] == (0, False)
    assert out[6] == (0, False)  # 1800s == gap is not > gap
    assert out[7] == (1, True)


def test_session_summary(spark):
    rows = {
        (r["user_id"], r["session_idx"]): r
        for r in session_summary(_events(spark)).collect()
    }
    assert rows[(1, 0)]["n_events"] == 2
    assert rows[(1, 0)]["duration_seconds"] == 600
    assert rows[(2, 0)]["n_events"] == 3
    assert rows[(2, 1)]["n_events"] == 1
    assert rows[(2, 1)]["duration_seconds"] == 0


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),  # fully repeated
            (2, "one two three four"),  # fully distinct
            (3, "go go stop go go stop"),  # dominant bigram "go go"? no: "go go" twice of 5
        ],
        "doc_id long, text string",
    )
    cols = repetition_stats_cols(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select("doc_id", *[c.alias(k) for k, c in cols.items()]).collect()
    }
    assert out[1]["n_words"] == 4
    assert out[1]["frac_dup_words"] == 0.75
    assert out[1]["top_word_share"] == 1.0
    assert out[1]["top_bigram_share"] == 1.0
    assert out[1]["frac_dup_bigrams"] == round(2 / 3, 6)
    assert not out[1]["passes_repetition_filter"]  # dominant bigram
    assert out[2]["frac_dup_words"] == 0.0
    assert out[2]["top_word_share"] == 0.25
    assert out[2]["mean_word_len"] == 3.75
    assert out[2]["passes_repetition_filter"]
    # doc 3: 6 words, bigrams = [go go, go stop, stop go, go go, go stop]
    # top bigram count 2 of 5; 2 of 5 occurrences are repeats
    assert out[3]["top_bigram_share"] == 0.4
    assert out[3]["frac_dup_bigrams"] == 0.4
    assert not out[3]["passes_repetition_filter"]


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(1, "call 555-0199 or mail jane.doe42@example.org now")],
        "id long, s string",
    )
    got = df.select(redact_pii_col(F.col("s")).alias("r")).first()["r"]
    assert got == "call ###-#### or mail <EMAIL> now"


def test_segmented_sessionize_equals_plain(spark):
    """sessionize_segmented == sessionize row-for-row, including sessions
    spanning chunk boundaries and multi-chunk idle-free runs, at a chunk
    width smaller than the gap and at the default."""
    from entity_resolution_spark.operators.sessions import (
        sessionize,
        sessionize_segmented,
    )

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # hot key crossing many chunk boundaries: one event per 10 min for 3 days
    hot = spark.range(432).select(
        F.lit(999_999).alias("user_id"),
        F.lit("hot").alias("event_type"),
        (F.lit(0) + F.col("id")).alias("event_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 600).alias("ts"),
        F.lit(0.0).alias("value"),
    )
    both = events.select("user_id", "event_type", "event_id", "ts", "value").unionByName(hot)
    for chunk in (900, 86_400):
        a = {
            (r.user_id, r.event_id): (r.session_idx, r.is_session_start)
            for r in sessionize_segmented(both, chunk_seconds=chunk).collect()
        }
        b = {
            (r.user_id, r.event_id): (r.session_idx, r.is_session_start)
            for r in sessionize(both).collect()
        }
        assert a == b, chunk


def test_line_dedup(spark):
    from entity_resolution_spark.functions.text import line_dedup_cols

    nav = "Home | Products | About Us | Contact | Careers | Legal Notice"
    body1 = "This paragraph is the actual unique content of the first page."
    body2 = "Different unique content appears on the second page right here."
    doc = "\n".join([nav, "", body1, "", nav, "-", body2, nav])
    rows = [(1, doc), (2, "short\nshort\nshort"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cols = line_dedup_cols(F.col("text"))
    out = {
        r.doc_id: r
        for r in df.select("doc_id", *[c.alias(k) for k, c in cols.items()]).collect()
    }
    # repeated nav line collapses to its first occurrence; blanks and the
    # "-" separator (structure, < 30 chars) survive every occurrence
    assert out[1].n_lines == 8 and out[1].n_removed == 2
    assert out[1].clean_text == "\n".join([nav, "", body1, "", "-", body2])
    # short repeated lines are never deduped
    assert out[2].n_removed == 0 and out[2].clean_text == "short\nshort\nshort"
    # NULL text passes through as (NULL, 0, 0)
    assert out[3].clean_text is None and out[3].n_lines == 0 and out[3].n_removed == 0


def test_c4_page_filter(spark):
    from entity_resolution_spark.functions.text import c4_filter_cols

    good = "\n".join(
        [
            "This is the first real sentence of the page, nicely terminated.",
            "Here is another full sentence with plenty of words in it.",
            "And a third complete sentence so the page clears the bar.",
            "short line",  # dropped: no terminal punctuation / < 5 words
            "Click here to enable JavaScript in your browser settings.",  # dropped
        ]
    )
    rows = [
        (1, good),
        (2, good + "\nlorem ipsum dolor sit amet."),
        (3, good + "\nfunction f() { return 1; }"),
        (4, "One sentence only, which is not enough for a page."),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cols = c4_filter_cols(F.col("text"))
    out = {
        r.doc_id: r
        for r in df.select("doc_id", *[c.alias(k) for k, c in cols.items()]).collect()
    }
    assert out[1].kept == 1 and out[1].drop_reason is None
    assert out[1].n_lines_kept == 3  # short + javascript lines removed
    assert "JavaScript" not in out[1].clean_text and "short line" not in out[1].clean_text
    assert out[2].kept == 0 and out[2].drop_reason == "lorem_ipsum"
    assert out[3].kept == 0 and out[3].drop_reason == "brace"
    assert out[4].kept == 0 and out[4].drop_reason == "too_few_sentences"
    assert out[5].kept == 0 and out[5].clean_text is None


def _gopher(spark, text):
    from pyspark.sql import functions as F

    from entity_resolution_spark.functions.text import gopher_rules_cols

    d = spark.createDataFrame([(1, text)], "doc_id long, text string")
    cols = gopher_rules_cols(F.col("text"))
    return d.select(*[c.alias(k) for k, c in cols.items()]).collect()[0]


def test_gopher_passing_document(spark):
    """A plain prose doc satisfying all seven rules passes."""
    text = " ".join(
        ["the quick brown fox jumps over and over to the side of that lazy dog have with"] * 5
    )
    r = _gopher(spark, text)
    assert r["n_words"] == 85 and r["passes_gopher"] == 1
    assert r["n_stop_words"] >= 2 and r["frac_alpha_words"] == 1.0


def test_gopher_word_count_and_mean_length_rules(spark):
    # under 50 words -> fail
    assert _gopher(spark, "the of short doc")["passes_gopher"] == 0
    # 50 one-char words -> mean length 1 < 3 -> fail even with stop words
    r = _gopher(spark, "the of " + "a " * 60)
    assert r["n_words"] == 62 and r["mean_word_len"] < 3 and r["passes_gopher"] == 0


def test_gopher_symbol_bullet_ellipsis_rules(spark):
    base = "the of " + "word " * 60
    # heavy '#' use -> symbol ratio > 0.1 -> fail
    r = _gopher(spark, base + "#" * 20)
    assert r["symbol_word_ratio"] > 0.1 and r["passes_gopher"] == 0
    # every line a bullet -> frac_bullet_lines = 1 > 0.9 -> fail
    bullets = "\n".join("- " + base for _ in range(3))
    r = _gopher(spark, bullets)
    assert r["frac_bullet_lines"] == 1.0 and r["passes_gopher"] == 0
    # >30% of lines end with ellipsis -> fail; blank lines don't count
    ell = base + "...\n\n" + base + "…\n" + base
    r = _gopher(spark, ell)
    assert abs(r["frac_ellipsis_lines"] - 2 / 3) < 1e-6 and r["passes_gopher"] == 0


def test_gopher_alpha_and_stopword_rules(spark):
    # 60 numeric words out of 62 -> frac_alpha < 0.8 -> fail
    r = _gopher(spark, "the of " + "123 " * 60)
    assert r["frac_alpha_words"] < 0.8 and r["passes_gopher"] == 0
    # no stop words at all -> fail
    r = _gopher(spark, "word " * 60)
    assert r["n_stop_words"] == 0 and r["passes_gopher"] == 0


def test_gopher_null_text(spark):
    r = _gopher(spark, None)
    assert r["n_words"] is None and r["passes_gopher"] == 0


def test_gopher_plan_has_no_python(spark):
    from pyspark.sql import functions as F

    from entity_resolution_spark.functions.text import gopher_rules_cols

    d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    cols = gopher_rules_cols(F.col("text"))
    plan = (
        d.select(*[c.alias(k) for k, c in cols.items()])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "BatchEvalPython" not in plan


class TestLuhnRedaction:
    def test_hand_cases(self, spark):
        from entity_resolution_spark.functions.text import cc_redact_cols

        rows = [
            ("valid16", "card 4539-1488-0343-6467 ok"),
            ("invalid16", "card 4539-1488-0343-6468 ok"),
            ("short12", "ref 123456789012 end"),
            ("amex15", "amex 3782 822463 10005 !"),
            ("none", "no digits here"),
            ("two", "a 4539148803436467 b 6011000990139424 c"),
        ]
        df = spark.createDataFrame(rows, "id string, text string")
        cols = cc_redact_cols(F.col("text"))
        out = {
            r["id"]: r
            for r in df.select(
                "id", *[v.alias(k) for k, v in cols.items()]
            ).collect()
        }
        assert (out["valid16"]["cc_valid"], out["valid16"]["redacted"]) == (
            1, "card <CC_REDACTED> ok",
        )
        # checksum failure and too-short runs are candidates but NOT masked
        assert out["invalid16"]["cc_candidates"] == 1
        assert out["invalid16"]["cc_valid"] == 0
        assert out["invalid16"]["redacted"] == "card 4539-1488-0343-6468 ok"
        assert out["short12"]["cc_valid"] == 0
        assert out["short12"]["redacted"] == "ref 123456789012 end"
        assert out["amex15"]["cc_valid"] == 1  # 15-digit Amex validates
        assert out["none"]["cc_candidates"] == 0
        assert out["two"]["cc_valid"] == 2
        assert out["two"]["redacted"] == "a <CC_REDACTED> b <CC_REDACTED> c"

    def test_plan_is_pure_jvm(self, spark):
        """Candidate extraction, Luhn fold, and redaction fold must stay
        inside whole-stage codegen — no Python node."""
        from entity_resolution_spark.functions.text import cc_redact_cols

        df = spark.createDataFrame([("x", "t 4539148803436467")],
                                   "id string, text string")
        cols = cc_redact_cols(F.col("text"))
        plan = (
            df.select("id", *[v.alias(k) for k, v in cols.items()])
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
