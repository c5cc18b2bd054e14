"""Declarative data-quality expectations (operators/expectations.py)."""

import pytest
from pyspark.sql import Row

from entity_resolution_spark.operators.expectations import check_expectations


def test_all_rule_kinds(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, status="OK", v=5.0, code="AB12"),
            Row(id=2, status="BAD", v=-1.0, code="xy"),
            Row(id=2, status=None, v=150.0, code=None),
            Row(id=4, status="OK", v=None, code="CD34"),
        ]
    )
    rules = [
        {"name": "status filled", "kind": "not_null", "column": "status"},
        {"name": "id unique", "kind": "unique", "column": "id"},
        {"name": "status domain", "kind": "in_set", "column": "status", "values": ["OK", "WARN"]},
        {"name": "v in range", "kind": "range", "column": "v", "lo": 0, "hi": 100},
        {"name": "code shape", "kind": "regex", "column": "code", "pattern": "^[A-Z]{2}[0-9]{2}$"},
    ]
    got = {
        r["rule_name"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in check_expectations(df, rules).collect()
    }
    assert got["status filled"] == (4, 1, False)
    assert got["id unique"] == (4, 1, False)  # id=2 twice -> 1 extra row
    assert got["status domain"] == (4, 1, False)  # BAD; NULL not counted
    assert got["v in range"] == (4, 2, False)  # -1 and 150; NULL skipped
    assert got["code shape"] == (4, 1, False)  # 'xy'; NULL skipped


def test_unique_counts_null_groups_and_validation(spark):
    df = spark.createDataFrame(
        [Row(k=None), Row(k=None), Row(k="a")], "k string"
    )
    got = check_expectations(df, [{"kind": "unique", "column": "k"}]).collect()[0]
    assert got["n_violations"] == 1  # the second NULL duplicates the first
    with pytest.raises(ValueError):
        check_expectations(df, [])
    with pytest.raises(ValueError):
        check_expectations(df, [{"kind": "median", "column": "k"}])
    with pytest.raises(ValueError):
        check_expectations(df, [{"kind": "range", "column": "k"}])
