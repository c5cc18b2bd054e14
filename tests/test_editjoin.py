"""Unit tests for the Ed-Join edit-distance self-join (operators/editjoin.py)
beyond the driver oracle row (test_queries_oracle.py::edit_distance_join_names).
"""

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.editjoin import (
    edit_distance_join,
    edit_join_candidate_count,
)


@pytest.fixture(scope="module")
def strings(spark):
    rows = [
        (1, "kitten"),
        (2, "sitting"),
        (3, "kitchen"),
        (4, "mitten"),
        (5, "mittens"),
        (6, "smitten"),
        (7, "written"),
        (8, "bitten"),
        (9, "kitten"),  # exact duplicate -> distance 0
        (10, ""),  # empty string edge case
        (11, "a"),  # shorter than q
        (12, "b"),
        (13, None),  # NULL -> treated as ""
    ]
    return spark.createDataFrame(rows, "id long, text string")


def _brute(df, tau):
    a = df.select(
        F.col("id").alias("l"), F.coalesce("text", F.lit("")).alias("lx")
    )
    b = df.select(
        F.col("id").alias("r"), F.coalesce("text", F.lit("")).alias("rx")
    )
    return sorted(
        (row.l, row.r, row.d)
        for row in a.crossJoin(b)
        .where(F.col("l") < F.col("r"))
        .withColumn("d", F.levenshtein("lx", "rx"))
        .where(F.col("d") <= tau)
        .collect()
    )


@pytest.mark.parametrize("tau", [0, 1, 2])
def test_matches_brute_force(spark, strings, tau):
    got = sorted(
        (r.left_id, r.right_id, r.distance)
        for r in edit_distance_join(strings, tau=tau).collect()
    )
    assert got == _brute(strings, tau)


def test_short_and_null_strings_join(spark, strings):
    got = {
        (r.left_id, r.right_id): r.distance
        for r in edit_distance_join(strings, tau=1).collect()
    }
    assert got[(10, 13)] == 0  # empty vs NULL-as-empty
    assert got[(11, 12)] == 1  # single chars, below q=2
    assert got[(10, 11)] == 1  # empty vs single char
    assert got[(1, 9)] == 0  # exact duplicate


def test_candidate_reduction_on_real_names(spark):
    from tests.conftest import SF_DIR

    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    n = cust.count()
    cands = edit_join_candidate_count(
        cust, tau=1, q=2, id_col="c_custkey", text_col="c_name"
    )
    all_pairs = n * (n - 1) // 2
    # the prefix filter must prune the vast majority of the quadratic space
    assert cands < all_pairs / 4, (cands, all_pairs)


def test_tau_validation(strings):
    with pytest.raises(ValueError):
        edit_distance_join(strings, tau=-1)
    with pytest.raises(ValueError):
        edit_distance_join(strings, tau=1, q=1)


def test_weighted_token_jaccard_hand_weights(spark):
    import math

    import pytest
    from pyspark.sql import Row

    from entity_resolution_spark.operators.setjoin import weighted_token_jaccard

    # 4 docs; token 'common' in all (idf ln(2), tiny), 'rare' in 2 (idf ln(3))
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="common rare alpha"),
            Row(doc_id=2, text="common rare beta"),
            Row(doc_id=3, text="common gamma delta"),
            Row(doc_id=4, text="common"),
        ]
    ).repartition(2)
    out = {
        (r["left_id"], r["right_id"]): r["weighted_jaccard"]
        for r in weighted_token_jaccard(docs, threshold=0.01).collect()
    }
    i_c, i_r, i_u = math.log(1 + 4 / 4), math.log(1 + 4 / 2), math.log(1 + 4 / 1)
    # docs 1,2 share common+rare; each also holds one unique token
    want_12 = (i_c + i_r) / (2 * (i_c + i_r + i_u) - (i_c + i_r))
    assert out[(1, 2)] == pytest.approx(want_12, abs=1e-6)
    # doc 4 vs doc 3: only 'common' shared
    want_34 = i_c / ((i_c + 2 * i_u) + i_c - i_c)
    assert out[(3, 4)] == pytest.approx(want_34, abs=1e-6)
    # rare pair scores above the only-common pair
    assert out[(1, 2)] > out[(3, 4)]
    with pytest.raises(ValueError):
        weighted_token_jaccard(docs, threshold=0.0)
