"""Unit tests for data-profiling operators (FD / PK / inclusion deps) on
hand-built frames with planted violations, nulls, and edge cases."""

from pyspark.sql import Row


def test_fd_profile_holds_and_violations(spark):
    from entity_resolution_spark.operators.profiling import fd_profile

    df = spark.createDataFrame(
        [
            Row(a=1, b=1, c="x"),
            Row(a=1, b=2, c="x"),
            Row(a=2, b=3, c="y"),
            Row(a=2, b=3, c="z"),  # a=2 has two c values -> a->c violated
        ]
    ).repartition(3)
    out = {
        r["dependency"]: (r["n_groups"], r["n_violating"], r["holds"])
        for r in fd_profile(df, [(["a"], "c"), (["a", "b"], "c")]).collect()
    }
    assert out["a -> c"] == (2, 1, False)
    # (a, b) -> c: groups (1,1) (1,2) (2,3); (2,3) holds {y,z} -> violated
    assert out["a,b -> c"] == (3, 1, False)
    ok = fd_profile(df, [(["b"], "a")]).collect()[0]
    assert ok["holds"] is True and ok["max_distinct_rhs"] == 1


def test_pk_candidates_nulls_and_dupes(spark):
    from entity_resolution_spark.operators.profiling import pk_candidates

    df = spark.createDataFrame(
        [Row(id=1, k=1, n=None), Row(id=2, k=1, n=2), Row(id=3, k=2, n=3)],
        "id long, k long, n long",
    ).repartition(2)
    out = {r["column_name"]: r for r in pk_candidates(df).collect()}
    assert out["id"]["is_pk_candidate"] is True
    assert out["k"]["is_pk_candidate"] is False  # duplicate value
    assert out["n"]["is_pk_candidate"] is False  # null present
    assert out["n"]["n_nulls"] == 1 and out["n"]["n_distinct"] == 2


def test_inclusion_deps_directionality(spark):
    from entity_resolution_spark.operators.profiling import inclusion_deps

    child = spark.createDataFrame(
        [Row(fk=1), Row(fk=1), Row(fk=2), Row(fk=None)]
    )
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
    out = {
        r["dependency"]: r
        for r in inclusion_deps(
            [
                (child, "fk", parent, "pk", "child in parent"),
                (parent, "pk", child, "fk", "parent in child"),
            ]
        ).collect()
    }
    fwd = out["child in parent"]
    assert fwd["holds"] is True and fwd["n_child_distinct"] == 2  # null skipped
    rev = out["parent in child"]
    assert rev["holds"] is False and rev["n_missing"] == 1  # pk=3 unmatched
