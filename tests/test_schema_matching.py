"""Reference-parity tests for column matching / validation / consolidation
(FIXTURES.md §3; behavioral assertions from the reference's own suite,
SURVEY.md §5.1)."""

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.consolidation import (
    SemanticPatterns,
    consolidate_datasets,
    consolidation_decision,
)
from entity_resolution_spark.operators.schema_matching import (
    find_similar_columns,
    profile_columns,
    type_compatibility,
    validate_column_matches,
    value_overlap,
)


@pytest.fixture(scope="module")
def df_a(spark):
    # FIXTURES.md §3a / reference tests/test_entity_resolution.py:60-70
    return spark.createDataFrame(
        [(1, "Alice", "2023-01-01"), (2, "Bob", "2023-01-02"), (3, "Charlie", "2023-01-03")],
        "cust_id int, name string, order_date string",
    )


@pytest.fixture(scope="module")
def df_b(spark):
    return spark.createDataFrame(
        [(1, "Alice Smith", "2023-01-01"), (2, "Bob Jones", "2023-01-02"), (3, "Charlie Brown", "2023-01-03")],
        "customer_number int, full_name string, transaction_date string",
    )


def test_find_similar_columns_shape(df_a, df_b):
    matches = find_similar_columns(df_a, df_b, threshold=40)
    assert matches, "expected at least one column match"
    for c1, c2, s in matches:
        assert isinstance(c1, str) and isinstance(c2, str)
        assert 40 <= s <= 100
    scores = [m[2] for m in matches]
    assert scores == sorted(scores, reverse=True)  # sorted desc (ref :348)


def test_find_similar_columns_threshold_filters(df_a, df_b):
    # threshold 100 keeps only identical descriptions
    high = find_similar_columns(df_a, df_b, threshold=100)
    low = find_similar_columns(df_a, df_b, threshold=10)
    assert len(high) <= len(low)
    with pytest.raises(ValueError):
        find_similar_columns(df_a, df_b, threshold=101)


def test_enhanced_dtype_lattice(spark):
    df = spark.createDataFrame(
        [("1", "2023-01-01", "yes", "a", None, 1.5),
         ("2", "2023-02-01", "no", "a", None, 2.5),
         ("3", "2023-03-01", "true", "b", None, 3.5)],
        "num_str string, dt string, boolish string, cat string, empty string, dbl double",
    )
    p = profile_columns(df)
    assert p["num_str"].enhanced_dtype == "numeric_string"
    assert p["dt"].enhanced_dtype == "datetime"
    assert p["boolish"].enhanced_dtype == "boolean"
    assert p["empty"].enhanced_dtype == "empty"
    assert p["dbl"].enhanced_dtype == "numeric"


def test_type_compatibility_reference_values():
    # reference tests/test_entity_resolution.py:346-379
    assert type_compatibility("numeric", "numeric")["compatibility_score"] == 100
    assert type_compatibility("empty", "empty")["compatibility_score"] == 0
    assert type_compatibility("numeric", "text")["compatibility_score"] < 70
    assert not type_compatibility("numeric", "text")["compatible"]
    assert type_compatibility("numeric_string", "numeric")["type_conversion_possible"]
    assert type_compatibility("categorical", "categorical")["compatibility_score"] == 85


def test_value_overlap_identical_and_disjoint(spark):
    a = spark.createDataFrame([("x",), ("y",), ("z",)], "v string")
    b = spark.createDataFrame([("x",), ("y",), ("z",)], "v string")
    c = spark.createDataFrame([("p",), ("q",)], "v string")
    ov = value_overlap(a, "v", b, "v")
    assert ov["overlap_percentage"] == 100.0 and ov["jaccard_similarity"] == 1.0
    ov2 = value_overlap(a, "v", c, "v")
    assert ov2["overlap_percentage"] == 0.0 and ov2["jaccard_similarity"] == 0.0


def test_validate_missing_column_flagged(df_a, df_b):
    res = validate_column_matches(df_a, df_b, [("nope", "full_name", 90.0)])
    assert res[0]["validation_flags"] == ["COLUMN_NOT_FOUND"]
    assert res[0]["overall_validation_score"] == 0


def test_validate_sorted_and_scored(df_a, df_b):
    res = validate_column_matches(
        df_a, df_b, [("cust_id", "customer_number", 85.0), ("name", "full_name", 90.0)]
    )
    scores = [r["overall_validation_score"] for r in res]
    assert scores == sorted(scores, reverse=True)
    ids = [r for r in res if r["col1"] == "cust_id"][0]
    # identical int values -> full overlap, numeric-numeric compat 100
    assert ids["data_type_analysis"]["compatibility_score"] == 100
    assert ids["value_overlap_analysis"]["overlap_percentage"] == 100.0


# --- consolidation -----------------------------------------------------------

def test_patterns_mine_suffixes():
    # FIXTURES.md §3b: suffix census finds _id/_name/_date
    p = SemanticPatterns().analyze(
        ["cust_id", "customer_name", "order_date"], ["user_id", "user_name", "created_date"]
    )
    assert "_id" in p.suffixes and "_name" in p.suffixes and "_date" in p.suffixes
    # semantic categories identifier/name/date exist among mappings
    cats = set(p.mappings.values())
    assert {"identifier", "name", "date"} <= cats


def test_patterns_default_matches_compat_layer():
    # operator-layer default mirrors the reference's 0.1
    # (entity_assignment.py:47-56); compat layer wraps the same default —
    # both must mine identical patterns on the reference's own fixture
    # (reference tests/test_entity_assignment.py:32-42)
    from entity_resolution_spark.compat import SemanticConsolidation

    cols1 = ["cust_id", "customer_name", "order_date"]
    cols2 = ["user_id", "user_name", "created_date"]
    op = SemanticPatterns().analyze(cols1, cols2)
    assert op.min_frequency == 0.1
    compat = SemanticConsolidation()
    compat_p = compat.patterns.analyze(cols1, cols2)
    assert op.prefixes == compat_p.prefixes
    assert op.suffixes == compat_p.suffixes
    assert op.mappings == compat_p.mappings


def test_decision_rule():
    # entity_assignment.py:399-412: top max(1, min_cols//2) mean / 100
    m = [("a", "x", 90.0), ("b", "y", 80.0), ("c", "z", 10.0)]
    # min_cols=3 -> required = max(1, 3//2) = 1 -> top-1 mean = 0.90
    method, avg = consolidation_decision(m, 3, 3, threshold=0.7)
    assert method == "join" and avg == pytest.approx(0.90)
    # min_cols=4 -> required = 2 -> mean(90, 80)/100 = 0.85
    method2, avg2 = consolidation_decision(m, 4, 5, threshold=0.7)
    assert method2 == "join" and avg2 == pytest.approx(0.85)
    method3, _ = consolidation_decision(m, 4, 5, threshold=0.9)
    assert method3 == "concatenate"
    assert consolidation_decision([], 3, 3)[0] == "none"


def test_consolidate_join_path(spark, df_a, df_b):
    matches = [("cust_id", "customer_number", 95.0), ("name", "full_name", 90.0),
               ("order_date", "transaction_date", 88.0)]
    out, method, meta = consolidate_datasets(df_a, df_b, matches, threshold=0.7)
    assert method == "join"
    assert meta["n_matches"] == 3
    assert out.count() >= 3  # outer join over shared canonical labels
    assert set(meta["join_columns"]) <= set(out.columns)


def test_consolidate_concat_path(spark, df_a, df_b):
    matches = [("cust_id", "customer_number", 71.0)]
    out, method, meta = consolidate_datasets(df_a, df_b, matches, threshold=0.9)
    assert method == "concatenate"
    assert "_dataset_source" in out.columns  # ref tests :350-361
    tags = {r["_dataset_source"] for r in out.select("_dataset_source").distinct().collect()}
    assert tags == {"dataset_1", "dataset_2"}
    assert out.count() == df_a.count() + df_b.count()


def test_consolidate_empty_matches(df_a, df_b):
    out, method, meta = consolidate_datasets(df_a, df_b, [], threshold=0.7)
    assert method == "no_matches"
    assert out.columns == df_a.columns
