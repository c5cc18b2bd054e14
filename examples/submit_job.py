#!/usr/bin/env python
"""spark-submit launcher for the resolution pipeline (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

The console script (``ers-resolve``) uses package-relative imports, which a
script handed directly to spark-submit cannot resolve; this thin wrapper is
the submit-able form. The package itself arrives on the executors through
``--py-files`` (and ``session.ensure_py_files`` re-ships it defensively, a
no-op when the zip is already present).

    # build the artifact once (any zip of the package directory works;
    # ensure_py_files writes the same thing for local sessions)
    python - <<'PY'
    from entity_resolution_spark.session import ensure_py_files  # noqa
    PY

    spark-submit \
        --master spark://host:7077 \
        --py-files /tmp/entity_resolution_spark_<hash>.zip \
        examples/submit_job.py \
        --input s3://bucket/repo_files/ --output s3://bucket/out/

Master/executor sizing come from spark-submit; ``get_spark`` keeps a
submit-provided master instead of forcing local mode.
"""

import sys

if __name__ == "__main__":
    from entity_resolution_spark.cli import main

    sys.exit(main())
