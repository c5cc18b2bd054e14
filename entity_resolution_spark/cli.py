"""Console entry point (``ers-resolve``) — the deployment surface a
reference user gets from its console scripts (/root/reference/
pyproject.toml:92-94), re-expressed for Spark: read a repo-files parquet,
run the full resolution pipeline, write clusters + metrics parquet.

Works both as an installed script (``pip install -e . && ers-resolve``)
and under ``spark-submit --py-files entity_resolution_spark.zip``.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="ers-resolve",
        description="Run the entity-resolution pipeline on a repo-files parquet "
        "(columns: repo, path, commit, lang, content[, file_id]).",
    )
    p.add_argument("--input", required=True, help="input parquet path, or 'generate:<n_groups>' for the deterministic synthetic corpus")
    p.add_argument("--output", required=True, help="output directory (clusters/ and metrics/ parquet are written under it)")
    p.add_argument("--cores", type=int, default=None, help="local[N] cores (default: all)")
    p.add_argument("--store", default=None, help="optional StageStore directory for resumable stage materialization")
    p.add_argument("--threshold", type=int, default=None, help="similarity threshold 0-100 (default 80)")
    args = p.parse_args(argv)

    from .config import PipelineConfig
    from .plans.pipeline import resolve
    from .session import get_spark
    from .sources.io import StageStore

    spark = get_spark("ers-resolve", cores=args.cores)
    if args.input.startswith("generate:"):
        from .datagen import generate_repo_files

        files = generate_repo_files(spark, int(args.input.split(":", 1)[1]))
    else:
        files = spark.read.parquet(args.input)

    cfg = PipelineConfig() if args.threshold is None else PipelineConfig(
        similarity_threshold=args.threshold
    )
    store = StageStore(args.store) if args.store else None
    res = resolve(files, cfg, store=store)
    res.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    res.metrics.write.mode("overwrite").parquet(f"{args.output}/metrics")
    for r in res.metrics.orderBy("stage", "metric").collect():
        print(f"{r.stage:>14s}  {r.metric:<18s} {r.value}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
