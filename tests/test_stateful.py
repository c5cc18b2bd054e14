"""applyInPandasWithState first-seen filter: streaming exact-dedup with
explicit keyed state, exercised with the file source + AvailableNow."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F


def test_first_seen_filter_stream(spark):
    from entity_resolution_spark.session import ensure_py_files
    from entity_resolution_spark.streaming.stateful import first_seen_filter

    ensure_py_files(spark)
    base = tempfile.mkdtemp()
    inp = os.path.join(base, "in")
    os.makedirs(inp)
    rows = [
        (1, "o/r", "a.py", "c" * 40, "python", "alpha content"),
        (2, "o/r", "b.py", "c" * 40, "python", "alpha content"),   # dup of 1
        (3, "o/r", "c.py", "c" * 40, "python", "beta content"),
        (4, "o/r", "d.py", "c" * 40, "python", "alpha content"),   # dup of 1
        (5, "o/r", "e.py", "c" * 40, "python", "gamma content"),
    ]
    df = spark.createDataFrame(
        rows, "file_id long, repo string, path string, commit string, lang string, content string"
    )
    df.write.parquet(inp, mode="overwrite")
    try:
        stream = spark.readStream.schema(df.schema).parquet(inp)
        out = first_seen_filter(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("first_seen")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .start()
        )
        finished = q.awaitTermination(240)
        assert finished, f"stateful query did not finish: {q.status}"
        got = {r.file_id: r for r in spark.sql("select * from first_seen").collect()}
        # exactly one row per distinct content, the min file_id each
        assert sorted(got) == [1, 3, 5]
        assert got[1].n_duplicates_so_far == 0  # first emission precedes the dups
    finally:
        shutil.rmtree(base)


def test_first_seen_filter_batch_semantics(spark):
    """The same digest-collapse in batch (exact_duplicate_edges) must agree
    with the streaming operator's keeper choice (min file_id)."""
    from entity_resolution_spark.operators.blocking import with_features
    from entity_resolution_spark.plans.pipeline import exact_duplicate_edges

    rows = [
        (10, "o/r", "x.py", "c" * 40, "python", "same"),
        (11, "o/r", "y.py", "c" * 40, "python", "same"),
        (12, "o/r", "z.py", "c" * 40, "python", "other"),
    ]
    df = spark.createDataFrame(
        rows, "file_id long, repo string, path string, commit string, lang string, content string"
    )
    reps, edges = exact_duplicate_edges(with_features(df))
    assert sorted(r.file_id for r in reps.select("file_id").collect()) == [10, 12]
    assert [(r.src, r.dst) for r in edges.collect()] == [(10, 11)]
