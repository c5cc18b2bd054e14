"""Sources: multi-format ingestion + schema validation + partitioned write."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.datagen import generate_repo_files
from entity_resolution_spark.sources.readers import (
    SchemaValidationError,
    infer_format,
    read_repo_files,
    validate_schema,
    write_partitioned,
)


@pytest.fixture(scope="module")
def files(spark):
    return generate_repo_files(spark, 20).drop("file_id")


def test_roundtrip_formats(spark, files, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("fmt"))
    n = files.count()
    for fmt in ("parquet", "orc", "json", "csv"):
        p = os.path.join(base, f"t_{fmt}")
        w = files.write.format(fmt).mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true").option("escape", '"')
        w.save(p)
        back = read_repo_files(spark, p, fmt=fmt)
        assert back.count() == n, fmt
        assert {f.name for f in back.schema.fields} >= {
            "repo", "path", "commit", "lang", "content"
        }


def test_validate_schema_reports_all_problems(spark):
    bad = spark.createDataFrame([(1, "x")], "repo int, path string")
    with pytest.raises(SchemaValidationError) as e:
        validate_schema(bad)
    msg = str(e.value)
    assert "repo" in msg and "int" in msg  # mistyped
    assert "commit" in msg and "lang" in msg and "content" in msg  # missing
    # extra columns pass
    ok = spark.createDataFrame(
        [("r", "p", "c", "l", "x", 99)],
        "repo string, path string, commit string, lang string, content string, extra int",
    )
    assert validate_schema(ok).count() == 1


def test_infer_format():
    assert infer_format("/data/x.csv") == "csv"
    assert infer_format("/data/x.jsonl") == "json"
    assert infer_format("/data/dir") == "parquet"


def test_write_partitioned_prunes(spark):
    base = tempfile.mkdtemp()
    try:
        df = spark.range(1000).withColumn("cluster_id", F.col("id") % 50)
        write_partitioned(df, base, key="cluster_id", n_buckets=8)
        out = spark.read.parquet(base)
        assert out.count() == 1000
        buckets = [d for d in os.listdir(base) if d.startswith("bucket=")]
        assert len(buckets) == 8
        # a bucket-filtered read touches a subset (partition pruning)
        one = out.filter(F.col("bucket") == 3)
        assert 0 < one.count() < 1000
    finally:
        shutil.rmtree(base)
