"""Unit tests for Fellegi-Sunter EM linkage (operators/linkage.py) beyond
the full-query oracle row (tests/test_queries_oracle.py::fs_em_linkage).
"""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from entity_resolution_spark.operators.linkage import (
    comparison_vectors,
    fs_em,
    fs_score,
    fs_train,
    round_half_away,
)


def test_round_half_away_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    for x in (0.12345678905, 0.99999999995, 0.0088545099, 0.5488893450001, 1e-11):
        want = con.sql(f"SELECT round({x!r}::DOUBLE, 10)").fetchone()[0]
        assert round_half_away(x, 10) == want, x


def test_fs_em_one_iteration_closed_form():
    # Census: pattern (1,) appears 10 times, (0,) 90 times; k=1, one iter.
    # E-step with lam=.1, m=.9, u=.1:
    #   g=1: wm=.1*.9=.09, wu=.9*.1=.09 -> w=.5
    #   g=0: wm=.1*.1=.01, wu=.9*.9=.81 -> w=.01/.82
    w1, w0 = 0.5, 0.01 / 0.82
    sw = w1 * 10 + w0 * 90
    lam, m, u = fs_em([(1, 10), (0, 90)], k=1, iters=1)
    assert lam == pytest.approx(sw / 100, abs=1e-10)
    assert m[0] == pytest.approx(w1 * 10 / sw, abs=1e-10)
    assert u[0] == pytest.approx((1 - w1) * 10 / ((1 - w1) * 10 + (1 - w0) * 90), abs=1e-10)


def test_fs_em_separates_planted_matches():
    # Two fields; matches agree on both, non-matches on neither.
    census = [(1, 1, 50), (0, 0, 950), (1, 0, 5), (0, 1, 5)]
    lam, m, u = fs_em(census, k=2, iters=30)
    assert m[0] > 0.85 and m[1] > 0.85
    assert u[0] < 0.05 and u[1] < 0.05
    assert 0.03 < lam < 0.08


def test_comparison_vectors_null_safe_and_custom(spark):
    recs = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", n=105),
            Row(doc_id=2, lang="en", n=199),
            Row(doc_id=3, lang=None, n=310),
            Row(doc_id=4, lang=None, n=55),
        ]
    )
    pairs = spark.createDataFrame(
        [Row(left_id=1, right_id=2), Row(left_id=3, right_id=4), Row(left_id=1, right_id=3)]
    )
    vec = comparison_vectors(
        pairs,
        recs,
        {
            "g_lang": "lang",
            "g_band": ("n", lambda l, r: F.floor(l / 100).eqNullSafe(F.floor(r / 100))),
        },
        id_col="doc_id",
    )
    got = {(r["left_id"], r["right_id"]): (r["g_lang"], r["g_band"]) for r in vec.collect()}
    assert got[(1, 2)] == (1, 1)  # en==en, 105//100 == 199//100
    assert got[(3, 4)] == (1, 0)  # NULL eqNullSafe NULL -> agree
    assert got[(1, 3)] == (0, 0)  # en vs NULL -> disagree


def test_fs_score_matches_python_math(spark):
    vec = spark.createDataFrame([Row(left_id=1, right_id=2, g_a=1, g_b=0)])
    model = fs_train(
        spark.createDataFrame(
            [Row(g_a=a, g_b=b) for a, b, n in [(1, 1, 8), (0, 0, 90), (1, 0, 2)] for _ in range(n)]
        ),
        ["g_a", "g_b"],
        iters=5,
    )
    row = fs_score(vec, model).collect()[0]
    num = model.m[0] * (1.0 - model.m[1])
    den = model.u[0] * (1.0 - model.u[1])
    assert row["match_weight"] == pytest.approx(math.log2(num / den), abs=1e-6)
    post = model.lam * num / (model.lam * num + (1.0 - model.lam) * den)
    assert row["posterior"] == pytest.approx(post, abs=1e-6)


def test_sorted_neighborhood_matches_naive_sweep(spark):
    from entity_resolution_spark.operators.blocking import sorted_neighborhood_pairs

    rows = [Row(doc_id=i, key=f"k{(i * 7) % 20:03d}") for i in range(40)]
    df = spark.createDataFrame(rows).repartition(7)  # partition-invariance too
    w = 4
    got = {
        (r["left_id"], r["right_id"], r["rank_distance"])
        for r in sorted_neighborhood_pairs(df, ["key"], window=w).collect()
    }
    order = [r.doc_id for r in sorted(rows, key=lambda r: (r.key, r.doc_id))]
    want = {
        (order[i], order[j], j - i)
        for i in range(len(order))
        for j in range(i + 1, min(i + w, len(order)))
    }
    assert got == want


def test_sorted_neighborhood_window_one_is_empty(spark):
    from entity_resolution_spark.operators.blocking import sorted_neighborhood_pairs

    df = spark.createDataFrame([Row(doc_id=i, key=str(i)) for i in range(10)])
    assert sorted_neighborhood_pairs(df, ["key"], window=1).count() == 0


def test_meta_blocking_wnp_hand_graph(spark):
    from entity_resolution_spark.operators.metablocking import meta_blocking_wnp

    # blocks: k1={1,2}, k2={1,2}, k3={1,3}, k4={2,3}, k5={3,4}
    postings = spark.createDataFrame(
        [Row(id=i, key=k) for k, ids in
         [("k1", [1, 2]), ("k2", [1, 2]), ("k3", [1, 3]), ("k4", [2, 3]), ("k5", [3, 4])]
         for i in ids]
    )
    # n: 1->3, 2->3, 3->3, 4->1
    # edges: (1,2) cbs=2 js=2/4=.5; (1,3) cbs=1 js=1/5=.2; (2,3) .2; (3,4) 1/3
    # means: 1:(.5+.2)/2=.35, 2:.35, 3:(.2+.2+.333333)/3=.244444, 4:.333333
    # WNP: (1,2) .5>=.35 keep; (1,3) .2<.35 and .2<.244444 drop; (2,3) drop;
    #      (3,4) .333333>=.244444 keep
    got = {
        (r["left_id"], r["right_id"], r["cbs"], r["js"])
        for r in meta_blocking_wnp(postings).collect()
    }
    assert got == {(1, 2, 2, 0.5), (3, 4, 1, 0.333333)}


def test_meta_blocking_block_purge(spark):
    from entity_resolution_spark.operators.metablocking import meta_blocking_wnp

    # an oversized block ("stop") would connect everything; purge removes it
    postings = spark.createDataFrame(
        [Row(id=i, key="stop") for i in range(10)]
        + [Row(id=0, key="rare"), Row(id=1, key="rare")]
    )
    got = meta_blocking_wnp(postings, max_block_size=5).collect()
    assert {(r["left_id"], r["right_id"]) for r in got} == {(0, 1)}
    assert got[0]["js"] == 1.0  # after the purge both docs have exactly 1 block


def test_token_and_shingle_postings(spark):
    from entity_resolution_spark.operators.metablocking import (
        shingle_postings,
        token_postings,
    )

    docs = spark.createDataFrame([Row(doc_id=1, text="A b  a c"), Row(doc_id=2, text=None)])
    toks = {(r["id"], r["key"]) for r in token_postings(docs).collect()}
    assert toks == {(1, "a"), (1, "b"), (1, "c")}
    sh = {(r["id"], r["key"]) for r in shingle_postings(docs, n=2).collect()}
    assert sh == {(1, "a b"), (1, "b a"), (1, "a c")}


def test_golden_records_rules(spark):
    from entity_resolution_spark.operators.survivorship import golden_records

    asg = spark.createDataFrame(
        [Row(doc_id=i, cluster_id=1) for i in (1, 2, 3)]
        + [Row(doc_id=4, cluster_id=4)]
    )
    recs = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", text="aa", n=5),
            Row(doc_id=2, lang="de", text="bbbb", n=9),
            Row(doc_id=3, lang="en", text="cccc", n=2),
            Row(doc_id=4, lang=None, text=None, n=7),
        ]
    )
    got = {
        r["cluster_id"]: (r["lang"], r["text"], r["n"], r["n_min"])
        for r in golden_records(
            asg,
            recs.withColumn("n_min", F.col("n")),
            {"lang": "majority", "text": "longest", "n": "max", "n_min": "min"},
        ).collect()
    }
    # majority: en(2) > de(1); longest: 'bbbb' beats 'cccc' on tie by value ASC
    assert got[1] == ("en", "bbbb", 9, 2)
    assert got[4] == (None, None, 7, 7)  # all-null fields -> NULL golden values


def test_golden_records_majority_tiebreak_and_bad_rule(spark):
    from entity_resolution_spark.operators.survivorship import golden_records

    asg = spark.createDataFrame([Row(doc_id=i, cluster_id=1) for i in (1, 2)])
    recs = spark.createDataFrame([Row(doc_id=1, lang="fr"), Row(doc_id=2, lang="en")])
    got = golden_records(asg, recs, {"lang": "majority"}).collect()
    assert got[0]["lang"] == "en"  # count tie -> value ASC
    with pytest.raises(ValueError):
        golden_records(asg, recs, {"lang": "modal"})


def _brute_token_jaccard(rows, t):
    import itertools

    sets = {r.doc_id: set(x for x in (r.text or "").lower().strip().split() if x) for r in rows}
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        j = round(len(sa & sb) / len(sa | sb), 6)
        if j >= t:
            out.add((a, b, j))
    return out


def test_ppjoin_equals_brute_force_and_prunes(spark):
    from entity_resolution_spark.operators.setjoin import (
        ppjoin_candidate_count,
        ppjoin_token_jaccard,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = [
        Row(doc_id=i, text=" ".join(base[(i % 4):(i % 4) + 6]) + f" unique{i}")
        for i in range(30)
    ] + [Row(doc_id=100, text=""), Row(doc_id=101, text=None)]
    df = spark.createDataFrame(rows).repartition(5)
    t = 0.5
    got = {
        (r["left_id"], r["right_id"], r["jaccard"])
        for r in ppjoin_token_jaccard(df, t).collect()
    }
    assert got == _brute_token_jaccard(rows, t)
    # the prefix index must generate fewer candidates than all shared-token
    # pairs (every pair here shares common tokens; prefixes are rare-first)
    n_all = len({(a, b) for a, b, _ in _brute_token_jaccard(rows, 1e-9)})
    assert ppjoin_candidate_count(df, t) < n_all


def test_ppjoin_exact_boundary_pair_survives(spark):
    from entity_resolution_spark.operators.setjoin import ppjoin_token_jaccard

    # |x n y| = 3, |x u y| = 5 -> jaccard exactly 0.6
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b c d"), Row(doc_id=2, text="a b c e")]
    )
    got = ppjoin_token_jaccard(df, 0.6).collect()
    assert [(r["left_id"], r["right_id"], r["jaccard"]) for r in got] == [(1, 2, 0.6)]


def test_ppjoin_threshold_validation(spark):
    from entity_resolution_spark.operators.setjoin import ppjoin_token_jaccard

    df = spark.createDataFrame([Row(doc_id=1, text="a")])
    with pytest.raises(ValueError):
        ppjoin_token_jaccard(df, 0.0)


def test_fs_score_adds_no_exchange(spark):
    """Scoring is a pure literal expression: the physical plan over an
    exchange-free input must stay exchange-free (map-side only)."""
    from entity_resolution_spark.operators.linkage import FSModel, fs_score

    vec = spark.createDataFrame([Row(left_id=1, right_id=2, g_a=1, g_b=0)])
    model = FSModel(
        gamma_cols=["g_a", "g_b"], lam=0.2, m=[0.9, 0.8], u=[0.1, 0.3],
        iters=1, round_at=10,
    )
    plan = fs_score(vec, model)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_fs_score_tf_adjusts_by_value_rarity(spark):
    from entity_resolution_spark.operators.linkage import (
        comparison_vectors,
        fs_score_tf,
        fs_train,
        tf_share_table,
    )

    # 'xx' is rare (1/10 records), 'en' is common (9/10)
    recs = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i else "xx") for i in range(10)]
        + [Row(doc_id=10, lang="xx")]
    )
    pairs = spark.createDataFrame(
        [Row(left_id=0, right_id=10),  # agree on the RARE value
         Row(left_id=1, right_id=2),   # agree on the COMMON value
         Row(left_id=0, right_id=1)]   # disagree
    )
    vec = comparison_vectors(pairs, recs, {"g_lang": "lang"}, keep_values=True)
    model = fs_train(vec, ["g_lang"], iters=3)
    shares = {"g_lang": tf_share_table(recs, "lang")}
    got = {
        (r["left_id"], r["right_id"]): (r["match_weight"], r["tf_match_weight"])
        for r in fs_score_tf(vec, model, shares).collect()
    }
    rare_mw, rare_tf = got[(0, 10)]
    common_mw, common_tf = got[(1, 2)]
    assert rare_mw == common_mw  # base model can't tell values apart
    assert rare_tf > rare_mw     # rare-value agreement earns extra weight
    assert rare_tf > common_tf
    dis_mw, dis_tf = got[(0, 1)]
    assert dis_tf == dis_mw      # disagreement: no adjustment

    import math
    u = model.u[0]
    share_xx = 2.0 / 11.0
    assert rare_tf == pytest.approx(
        rare_mw + round(math.log2(u / round(share_xx, 10)), 6), abs=1e-6
    )


def test_fs_score_tf_rejects_unknown_gamma(spark):
    from entity_resolution_spark.operators.linkage import FSModel, fs_score_tf

    vec = spark.createDataFrame([Row(left_id=1, right_id=2, g_a=1, v_g_a="x")])
    model = FSModel(gamma_cols=["g_a"], lam=0.1, m=[0.9], u=[0.1], iters=1, round_at=10)
    with pytest.raises(ValueError):
        fs_score_tf(vec, model, {"g_zz": vec})


def test_link_entities_end_to_end(spark):
    from entity_resolution_spark.operators.linkage import link_entities

    # two planted duplicate groups + noise; candidates = all pairs
    recs = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", name="acme corp"),
            Row(doc_id=2, lang="en", name="acme corp"),
            Row(doc_id=3, lang="de", name="beta gmbh"),
            Row(doc_id=4, lang="de", name="beta gmbh"),
            Row(doc_id=5, lang="fr", name="gamma sa"),
        ]
    )
    ids = [1, 2, 3, 4, 5]
    pairs = spark.createDataFrame(
        [Row(left_id=a, right_id=b) for a in ids for b in ids if a < b]
    )
    res = link_entities(
        recs,
        pairs,
        fields={"g_lang": "lang", "g_name": "name"},
        rules={"lang": "majority", "name": "longest"},
        threshold=0.5,
        iters=20,
    )
    asg = {r["doc_id"]: r["cluster_id"] for r in res.assignments.collect()}
    assert asg[1] == asg[2] and asg[3] == asg[4]
    assert asg[1] != asg[3]
    assert 5 not in asg  # no confident edge for the singleton
    golden = {r["cluster_id"]: (r["lang"], r["name"]) for r in res.golden.collect()}
    assert golden[asg[1]] == ("en", "acme corp")
    assert golden[asg[3]] == ("de", "beta gmbh")


def test_containment_catches_truncation_that_jaccard_misses(spark):
    from entity_resolution_spark.operators.dedup import ngram_containment_pairs

    base = " ".join(f"w{i}" for i in range(30))
    rows = [
        Row(doc_id=1, text=base),                                   # the quote
        Row(doc_id=2, text=base + " " + " ".join(f"x{i}" for i in range(90))),
        Row(doc_id=3, text=" ".join(f"y{i}" for i in range(30))),   # unrelated
    ]
    got = {
        (r["inner_id"], r["outer_id"]): (r["containment"], r["jaccard"])
        for r in ngram_containment_pairs(
            spark.createDataFrame(rows), min_containment=0.8
        ).collect()
    }
    assert set(got) == {(1, 2)}
    cont, jac = got[(1, 2)]
    assert cont == 1.0      # doc 1 fully inside doc 2
    assert jac < 0.5        # symmetric jaccard would have missed it


def test_containment_orientation_tiebreak(spark):
    from entity_resolution_spark.operators.dedup import ngram_containment_pairs

    # equal gram-set sizes: inner must be the lower id
    txt = "a b c d e"
    got = ngram_containment_pairs(
        spark.createDataFrame([Row(doc_id=7, text=txt), Row(doc_id=3, text=txt)]),
        min_containment=0.8,
    ).collect()
    assert [(r["inner_id"], r["outer_id"], r["containment"]) for r in got] == [(3, 7, 1.0)]


def test_token_entropy_hand_values(spark):
    import math

    from entity_resolution_spark.operators.stats import token_entropy

    rows = [
        Row(doc_id=1, text="a a b b"),        # uniform over 2 -> H=1, ttr=.5
        Row(doc_id=2, text="x x x x"),        # single type -> H=0, ttr=.25
        Row(doc_id=3, text="p q r s"),        # all distinct -> H=2, ttr=1
        Row(doc_id=4, text=""),               # empty -> NULLs
        Row(doc_id=5, text=None),
        Row(doc_id=6, text="a a a b"),        # 3/4,1/4
    ]
    got = {
        r["doc_id"]: (r["n_tokens"], r["distinct_tokens"], r["ttr"], r["entropy"])
        for r in token_entropy(spark.createDataFrame(rows)).collect()
    }
    assert got[1] == (4, 2, 0.5, 1.0)
    assert got[2] == (4, 1, 0.25, 0.0)
    assert got[3] == (4, 4, 1.0, 2.0)
    assert got[4] == (None, None, None, None)
    assert got[5] == (None, None, None, None)
    h = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert got[6][3] == pytest.approx(h, abs=1e-6)


def test_review_queue_orders_by_uncertainty(spark):
    from entity_resolution_spark.operators.linkage import review_queue

    scored = spark.createDataFrame(
        [
            Row(left_id=1, right_id=2, posterior=0.98),
            Row(left_id=1, right_id=3, posterior=0.49),
            Row(left_id=2, right_id=3, posterior=0.60),
            Row(left_id=3, right_id=4, posterior=0.02),
            Row(left_id=4, right_id=5, posterior=0.51),  # margin tie with (1,3)
        ]
    )
    got = [(r["left_id"], r["right_id"]) for r in review_queue(scored, 3).collect()]
    assert got == [(1, 3), (4, 5), (2, 3)]  # margins .01, .01 (id tiebreak), .10


def test_fs_model_save_load_roundtrip(spark, tmp_path):
    from entity_resolution_spark.operators.linkage import (
        FSModel,
        load_fs_model,
        save_fs_model,
    )

    m = FSModel(
        gamma_cols=["g_a", "g_b"],
        lam=0.0088545099,
        m=[0.548889345, 0.1461082934],
        u=[0.2639296088, 1e-06],
        iters=8,
        round_at=10,
    )
    save_fs_model(m, str(tmp_path / "fs_model"))
    got = load_fs_model(spark, str(tmp_path / "fs_model"))
    assert got == m  # dataclass equality: every float bit-identical


def test_cluster_edge_density_hand_graph(spark):
    from entity_resolution_spark.operators.quality import cluster_edge_density

    asg = spark.createDataFrame(
        [Row(doc_id=i, cluster_id=1) for i in (1, 2, 3)]  # chain 1-2-3
        + [Row(doc_id=i, cluster_id=4) for i in (4, 5)]   # tight pair
    )
    edges = spark.createDataFrame(
        [
            Row(left_id=1, right_id=2, posterior=0.95),
            Row(left_id=2, right_id=3, posterior=0.91),   # 1-3 missing!
            Row(left_id=4, right_id=5, posterior=0.99),
            Row(left_id=1, right_id=9, posterior=0.99),   # cross-cluster: ignored
        ]
    )
    got = {r["cluster_id"]: r for r in cluster_edge_density(asg, edges).collect()}
    c1, c4 = got[1], got[4]
    assert (c1["n_members"], c1["n_edges"], c1["possible_pairs"]) == (3, 2, 3)
    assert c1["density"] == pytest.approx(2 / 3, abs=1e-6)
    assert c1["min_score"] == 0.91
    assert (c4["n_members"], c4["n_edges"], c4["density"]) == (2, 1, 1.0)


def test_cluster_edge_density_no_edges_cluster(spark):
    from entity_resolution_spark.operators.quality import cluster_edge_density

    asg = spark.createDataFrame([Row(doc_id=1, cluster_id=1), Row(doc_id=2, cluster_id=1)])
    edges = spark.createDataFrame(
        [Row(left_id=8, right_id=9, posterior=0.99)]
    )
    r = cluster_edge_density(asg, edges).collect()[0]
    assert (r["n_edges"], r["density"], r["min_score"]) == (0, 0.0, None)


def test_fs_explain_decomposition(spark):
    import math

    from entity_resolution_spark.operators.linkage import FSModel, fs_explain

    vec = spark.createDataFrame(
        [Row(left_id=1, right_id=2, g_a=1, g_b=0)]
    )
    model = FSModel(
        gamma_cols=["g_a", "g_b"], lam=0.2, m=[0.9, 0.8], u=[0.1, 0.4],
        iters=1, round_at=10,
    )
    r = fs_explain(vec, model).collect()[0]
    assert r["wt_g_a"] == pytest.approx(math.log2(0.9 / 0.1), abs=1e-6)
    assert r["wt_g_b"] == pytest.approx(math.log2(0.2 / 0.6), abs=1e-6)
    assert r["wt_prior"] == pytest.approx(math.log2(0.25), abs=1e-6)
    assert r["wt_total"] == pytest.approx(
        r["wt_g_a"] + r["wt_g_b"] + r["wt_prior"], abs=1e-6
    )


def test_fs_em_degenerate_and_empty_census():
    from entity_resolution_spark.operators.linkage import fs_em

    # every pair shows the same all-agree pattern: clamps keep the fit
    # finite (m, u -> 0.999999), nothing NaN
    lam, m, u = fs_em([(1, 1, 100)], k=2, iters=10)
    assert all(math.isfinite(x) for x in [lam, *m, *u])
    assert m == [0.999999, 0.999999] and u == [0.999999, 0.999999]
    with pytest.raises(ValueError):
        fs_em([], k=2)


def test_ngram_novelty_hand_values(spark):
    from entity_resolution_spark.operators.stats import ngram_novelty

    rows = [
        Row(doc_id=1, text="a b c d e"),     # grams: abc bcd cde
        Row(doc_id=2, text="a b c x y"),     # grams: abc bcx cxy -> shares abc
        Row(doc_id=3, text="p q r s"),       # fully novel
        Row(doc_id=4, text=""),              # empty -> NULLs
    ]
    got = {
        r["doc_id"]: (r["n_grams"], r["novel_grams"], r["novelty"])
        for r in ngram_novelty(spark.createDataFrame(rows), n=3).collect()
    }
    assert got[1] == (3.0, 2.0, pytest.approx(2 / 3, abs=1e-6))
    assert got[2] == (3.0, 2.0, pytest.approx(2 / 3, abs=1e-6))
    assert got[3] == (2.0, 2.0, 1.0)
    assert got[4] == (None, None, None)


def test_soundex_replica_exhaustive_over_corpus_tokens(spark, tmp_path):
    """The recursive-CTE soundex kernel must match Spark's builtin on
    EVERY distinct corpus token plus classic + hostile edge cases."""
    import duckdb

    from entity_resolution_spark.queries import ORACLE_SQL

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    toks = (
        docs.select(
            F.explode(F.split(F.lower(F.trim(F.coalesce("text", F.lit("")))), r"\s+"))
            .alias("w")
        )
        .distinct()
    )
    extra = [
        "robert", "rupert", "ashcraft", "ashcroft", "tymczak", "pfister",
        "honeyman", "bfpv", "yoyo", "hw", "wwhw", "a", "x9z", "9abc", "",
        "hash", "llll", "czzz", "aeiouy",
    ]
    words = sorted({r["w"] for r in toks.collect()} | set(extra))
    probe = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    pq = str(tmp_path / "probe.parquet")
    probe.write.mode("overwrite").parquet(pq)

    want = {
        r["doc_id"]: r["sx"]
        for r in probe.select(
            "doc_id",
            F.soundex(
                F.element_at(F.split(F.lower(F.trim(F.coalesce("text", F.lit("")))), r"\s+"), 1)
            ).alias("sx"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    got = {
        int(r[0]): r[2] for r in con.sql(ORACLE_SQL["phonetic_soundex_keys"]).fetchall()
    }
    assert len(got) == len(want)
    diffs = {i: (want[i], got[i]) for i in want if want[i] != got[i]}
    assert not diffs, dict(list(diffs.items())[:10])


def test_fs_pr_curve_hand_values(spark):
    from entity_resolution_spark.operators.linkage import fs_pr_curve

    scored = spark.createDataFrame(
        [
            Row(left_id=1, right_id=2, posterior=0.9),   # match
            Row(left_id=1, right_id=3, posterior=0.9),   # non-match
            Row(left_id=2, right_id=3, posterior=0.5),   # match
            Row(left_id=3, right_id=4, posterior=0.1),   # non-match
        ]
    )
    truth = spark.createDataFrame(
        [Row(left_id=1, right_id=2), Row(left_id=2, right_id=3)]
    )
    got = {r["threshold"]: r for r in fs_pr_curve(scored, truth).collect()}
    assert set(got) == {0.9, 0.5, 0.1}
    r9 = got[0.9]
    assert (r9["tp"], r9["fp"], r9["fn"]) == (1, 1, 1)
    assert r9["precision"] == 0.5 and r9["recall"] == 0.5
    r5 = got[0.5]
    assert (r5["tp"], r5["fp"], r5["fn"]) == (2, 1, 0)
    assert r5["recall"] == 1.0 and r5["precision"] == pytest.approx(2 / 3, abs=1e-6)
    r1 = got[0.1]
    assert (r1["tp"], r1["fp"]) == (2, 2)
    assert r1["f1"] == pytest.approx(2 * 2 / (4 + 2), abs=1e-6)


def _brute_tfidf_cosine(rows, t):
    """NumPy-free brute-force tf-idf cosine over whitespace tokens."""
    import itertools
    import math
    from collections import Counter

    tfs = {
        r.doc_id: Counter(x for x in (r.text or "").lower().strip().split() if x)
        for r in rows
    }
    n = len(rows)
    dfs = Counter()
    for c in tfs.values():
        dfs.update(c.keys())
    vecs = {}
    for d, c in tfs.items():
        w = {tok: tf * math.log(n / dfs[tok]) for tok, tf in c.items()}
        w = {tok: x for tok, x in w.items() if x > 0}
        nrm = math.sqrt(sum(x * x for x in w.values()))
        if nrm > 0:
            vecs[d] = {tok: x / nrm for tok, x in w.items()}
    out = set()
    for a, b in itertools.combinations(sorted(vecs), 2):
        va, vb = vecs[a], vecs[b]
        cos = round(sum(x * vb[tok] for tok, x in va.items() if tok in vb), 6)
        if cos >= t:
            out.add((a, b, cos))
    return out


def test_tfidf_cosine_join_equals_brute_force_and_prunes(spark):
    from entity_resolution_spark.operators.setjoin import (
        tfidf_cosine_candidate_count,
        tfidf_cosine_join,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = [
        Row(doc_id=i, text=" ".join(base[(i % 4):(i % 4) + 6]) + f" unique{i}")
        for i in range(30)
    ] + [Row(doc_id=100, text=""), Row(doc_id=101, text=None)]
    df = spark.createDataFrame(rows).repartition(5)
    t = 0.5
    got = {
        (r["left_id"], r["right_id"], r["cosine"])
        for r in tfidf_cosine_join(df, t).collect()
    }
    assert got == _brute_tfidf_cosine(rows, t)
    # the suffix-norm prefix must generate fewer candidates than the full
    # weighted inverted index (= all pairs sharing any positive-idf token)
    n_all = len({(a, b) for a, b, _ in _brute_tfidf_cosine(rows, -1.0)})
    assert tfidf_cosine_candidate_count(df, t) < n_all


def test_tfidf_cosine_identical_docs_score_one(spark):
    from entity_resolution_spark.operators.setjoin import tfidf_cosine_join

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="red green blue"),
            Row(doc_id=2, text="red green blue"),
            Row(doc_id=3, text="cyan magenta yellow yellow"),
        ]
    )
    got = tfidf_cosine_join(df, 0.99).collect()
    assert [(r["left_id"], r["right_id"], r["cosine"]) for r in got] == [(1, 2, 1.0)]


def test_tfidf_cosine_threshold_validation(spark):
    from entity_resolution_spark.operators.setjoin import tfidf_cosine_join

    df = spark.createDataFrame([Row(doc_id=1, text="a")])
    with pytest.raises(ValueError):
        tfidf_cosine_join(df, 1.5)


def _brute_soft_tfidf(rows, pairs, theta):
    """Independent soft-tfidf over whitespace tokens (engine JW kernel)."""
    import math
    from collections import Counter

    from entity_resolution_spark.functions.similarity import jaro_winkler

    tfs = {
        r.doc_id: Counter(x for x in (r.text or "").lower().strip().split() if x)
        for r in rows
    }
    n = len(rows)
    dfs = Counter()
    for c in tfs.values():
        dfs.update(c.keys())
    vecs = {}
    for d, c in tfs.items():
        w = {t: tf * math.log(n / dfs[t]) for t, tf in c.items()}
        w = {t: x for t, x in w.items() if x > 0}
        nrm = math.sqrt(sum(x * x for x in w.values()))
        if nrm > 0:
            vecs[d] = {t: x / nrm for t, x in w.items()}

    def direction(src, dst):
        s = 0.0
        for tl, wl in sorted(src.items()):
            # deterministic tie-break: jw DESC, partner token ASC
            cands = sorted(
                ((jaro_winkler(tl, tr), tr) for tr in dst),
                key=lambda x: (-x[0], x[1]),
            )
            if cands and cands[0][0] >= theta:
                jw, tr = cands[0]
                s += wl * dst[tr] * jw
        return s

    out = {}
    for l, r in pairs:
        if l not in vecs or r not in vecs:
            continue
        slr = direction(vecs[l], vecs[r])
        srl_raw = 0.0
        for tr, wr in sorted(vecs[r].items()):
            cands = sorted(
                ((jaro_winkler(tl, tr), tl) for tl in vecs[l]),
                key=lambda x: (-x[0], x[1]),
            )
            if cands and cands[0][0] >= theta:
                jw, tl = cands[0]
                srl_raw += vecs[l][tl] * wr * jw
        if slr > 0 or srl_raw > 0:
            out[(l, r)] = round((slr + srl_raw) / 2, 6)
    return out


def test_soft_tfidf_matches_brute_force(spark):
    from entity_resolution_spark.operators.setjoin import soft_tfidf_score

    rows = [
        Row(doc_id=1, text="jon smith plumbing"),
        Row(doc_id=2, text="john smyth plumbing"),
        Row(doc_id=3, text="acme widget factory"),
        Row(doc_id=4, text="acme widgets factory"),
        Row(doc_id=5, text="totally unrelated words"),
        Row(doc_id=6, text=""),
    ]
    df = spark.createDataFrame(rows)
    pair_list = [(1, 2), (1, 3), (3, 4), (1, 5), (1, 6)]
    pairs = spark.createDataFrame(pair_list, "left_id long, right_id long")
    got = {
        (r["left_id"], r["right_id"]): r["soft_tfidf"]
        for r in soft_tfidf_score(
            df, pairs, threshold=0.0, theta=0.85, id_col="doc_id"
        ).collect()
    }
    want = _brute_soft_tfidf(rows, pair_list, 0.85)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 2e-6, (k, got[k], want[k])
    # the near-identical name pair must clearly outscore the unrelated one
    assert got[(1, 2)] > 0.8
    assert (1, 5) not in got or got[(1, 5)] < 0.2


def test_soft_tfidf_theta_validation(spark):
    from entity_resolution_spark.operators.setjoin import soft_tfidf_score

    df = spark.createDataFrame([Row(doc_id=1, text="a")])
    pairs = spark.createDataFrame([(1, 1)], "left_id long, right_id long")
    with pytest.raises(ValueError):
        soft_tfidf_score(df, pairs, theta=0.0)


def test_monge_elkan_matches_brute_force(spark):
    from entity_resolution_spark.functions.similarity import jaro_winkler
    from entity_resolution_spark.operators.setjoin import monge_elkan_score

    rows = [
        Row(doc_id=1, text="jon smith"),
        Row(doc_id=2, text="john smyth"),
        Row(doc_id=3, text="completely different tokens"),
    ]
    df = spark.createDataFrame(rows)
    pair_list = [(1, 2), (1, 3)]
    pairs = spark.createDataFrame(pair_list, "left_id long, right_id long")
    got = {
        (r["left_id"], r["right_id"]): r["monge_elkan"]
        for r in monge_elkan_score(df, pairs, id_col="doc_id").collect()
    }
    toks = {r.doc_id: sorted(set(r.text.lower().split())) for r in rows}
    for l, r in pair_list:
        A, B = toks[l], toks[r]
        lr = sum(max(jaro_winkler(a, b) for b in B) for a in A) / len(A)
        rl = sum(max(jaro_winkler(a, b) for a in A) for b in B) / len(B)
        assert abs(got[(l, r)] - round((lr + rl) / 2, 6)) < 2e-6
    assert got[(1, 2)] > 0.9 > got[(1, 3)]
