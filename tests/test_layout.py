"""Layout-planning operators (operators/layout.py): compaction bin packing
and Z-order keys."""

import pytest
from pyspark.sql import Row

from entity_resolution_spark.operators.layout import (
    compaction_plan,
    compaction_summary,
    zorder_key,
)


def test_compaction_plan_chunks_by_prefix_sum(spark):
    files = spark.createDataFrame(
        [
            Row(part="a", file_path="f1", size_bytes=600),
            Row(part="a", file_path="f2", size_bytes=600),
            Row(part="a", file_path="f3", size_bytes=100),
            Row(part="a", file_path="f4", size_bytes=2500),  # oversized
            Row(part="a", file_path="f5", size_bytes=100),
            Row(part="b", file_path="f1", size_bytes=50),
        ]
    ).repartition(3)
    got = {
        (r["part"], r["file_path"]): r["bin_id"]
        for r in compaction_plan(files, 1000, ["part"]).collect()
    }
    # prefix sums: f1:0, f2:600, f3:1200, f4:1300, f5:3800
    assert got == {
        ("a", "f1"): 0,
        ("a", "f2"): 0,
        ("a", "f3"): 1,
        ("a", "f4"): 1,
        ("a", "f5"): 3,  # oversized f4 advances the id past 2
        ("b", "f1"): 0,
    }
    s = {
        r["part"]: (r["n_files"], r["n_bins"], r["total_bytes"], r["max_bin_bytes"])
        for r in compaction_summary(
            compaction_plan(files, 1000, ["part"]), ["part"], target_bytes=1000
        ).collect()
    }
    assert s["a"] == (5, 3, 3900, 2600)
    assert s["b"] == (1, 1, 50, 50)
    with pytest.raises(ValueError):
        compaction_plan(files, 0)


def test_zorder_key_interleaves_quantile_cells(spark):
    # 4 points on a 2x2 grid (bits=1): boundaries = medians
    rows = [
        Row(id=1, x=0.0, y=0.0),
        Row(id=2, x=10.0, y=0.0),
        Row(id=3, x=0.0, y=10.0),
        Row(id=4, x=10.0, y=10.0),
        Row(id=5, x=None, y=10.0),
    ]
    got = {
        r["id"]: r["zorder"]
        for r in zorder_key(spark.createDataFrame(rows), ["x", "y"], bits=1).collect()
    }
    # median of x (with null ignored) = 5 -> cell(0)=0 cell(10)=1; same for y
    # z = x_bit << 0 | y_bit << 1
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 2}


def test_zorder_key_orders_like_morton_curve(spark):
    import itertools

    rows = [
        Row(id=i, x=float(x), y=float(y))
        for i, (x, y) in enumerate(itertools.product(range(8), range(8)))
    ]
    out = zorder_key(spark.createDataFrame(rows).repartition(5), ["x", "y"], bits=3)
    got = {r["id"]: r["zorder"] for r in out.collect()}

    def morton(x, y):
        z = 0
        for b in range(3):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    # uniform 0..7 grid: quantile cells == the integer coordinates
    for i, (x, y) in enumerate(itertools.product(range(8), range(8))):
        assert got[i] == morton(x, y), (i, x, y)
    with pytest.raises(ValueError):
        zorder_key(spark.createDataFrame(rows), [], bits=3)
    with pytest.raises(ValueError):
        zorder_key(spark.createDataFrame(rows), ["x", "y"], bits=32)


class TestSkippingReport:
    def test_clustered_layout_skips_insertion_does_not(self, spark):
        from entity_resolution_spark.operators.layout import (
            file_minmax_stats,
            skipping_report,
        )

        # values interleave across insertion files but separate cleanly
        # when clustered: 4 files x 100 rows either way
        rows = [(i, float(i % 100)) for i in range(400)]
        df = spark.createDataFrame(rows, "id long, v double")
        ins = df.selectExpr("CAST(id / 100 AS LONG) AS f", "v")
        clu = df.selectExpr("CAST(v / 25 AS LONG) AS f", "v")
        rep_i = {
            (r["lo"], r["hi"]): (r["files_read"], r["skip_ratio"])
            for r in skipping_report(
                file_minmax_stats(ins, "f", "v"), [(0.0, 10.0)], "ins"
            ).collect()
        }
        rep_c = {
            (r["lo"], r["hi"]): (r["files_read"], r["skip_ratio"])
            for r in skipping_report(
                file_minmax_stats(clu, "f", "v"), [(0.0, 10.0)], "clu"
            ).collect()
        }
        assert rep_i[(0.0, 10.0)] == (4, 0.0)  # every insertion file overlaps
        assert rep_c[(0.0, 10.0)] == (1, 0.75)  # one clustered file read

    def test_null_only_file_is_conservatively_read(self, spark):
        from entity_resolution_spark.operators.layout import (
            file_minmax_stats,
            skipping_report,
        )

        df = spark.createDataFrame(
            [(0, 1.0), (0, 2.0), (1, None), (2, 50.0)], "f long, v double"
        )
        rep = skipping_report(
            file_minmax_stats(df, "f", "v"), [(10.0, 20.0)], "x"
        ).collect()[0]
        # file 1 (all NULL) must be read; files 0 and 2 skip
        assert rep["files_read"] == 1 and rep["files_skipped"] == 2

    def test_empty_intervals_raise(self, spark):
        import pytest as _pt

        from entity_resolution_spark.operators.layout import (
            file_minmax_stats,
            skipping_report,
        )

        df = spark.createDataFrame([(0, 1.0)], "f long, v double")
        with _pt.raises(ValueError):
            skipping_report(file_minmax_stats(df, "f", "v"), [], "x")


class TestRangeBoundaries:
    def test_equal_counts_and_coverage(self, spark):
        from entity_resolution_spark.operators.layout import range_boundaries

        df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
        out = {r["partition_id"]: r for r in range_boundaries(df, "v", 4).collect()}
        assert len(out) == 4
        assert sum(r["n_rows"] for r in out.values()) == 100
        assert all(r["n_rows"] == 25 for r in out.values())
        assert out[0]["lo"] is None and out[3]["hi"] is None
        # contiguous: partition i's hi == partition i+1's lo
        for i in range(3):
            assert out[i]["hi"] == out[i + 1]["lo"]

    def test_skewed_values_still_balance(self, spark):
        from entity_resolution_spark.operators.layout import range_boundaries

        # heavy skew: 90% of mass at the low end
        vals = [float(i) for i in range(90)] + [1000.0 + i for i in range(10)]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        out = range_boundaries(df, "v", 2).collect()
        counts = sorted(r["n_rows"] for r in out)
        assert counts == [50, 50]

    def test_validation(self, spark):
        import pytest as _pt

        from entity_resolution_spark.operators.layout import range_boundaries

        df = spark.createDataFrame([(1.0,)], "v double")
        with _pt.raises(ValueError):
            range_boundaries(df, "v", 1)
