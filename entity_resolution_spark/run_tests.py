"""Console entry point (``ers-test``) — parity with the reference's
``entity-resolution-test`` script (/root/reference/pyproject.toml:92-94,
run_tests.py): discover and run the repo's test suite from an installed
environment, with a dependency preflight, returning a non-zero exit code
on failure. Re-expressed for this engine: the suite is pytest-based and
needs a working local Spark, so the preflight checks pyspark + a JVM."""

from __future__ import annotations

import os
import sys


def main(argv: list[str] | None = None) -> int:
    try:
        import duckdb  # noqa: F401
        import pandas  # noqa: F401
        import pyspark  # noqa: F401
        import pytest
    except ImportError as e:  # pragma: no cover - depends on broken env
        print("missing test dependencies (need pyspark, pandas, duckdb, pytest):")
        print(f"  {e}")
        return 1
    if not os.environ.get("JAVA_HOME") and not any(
        os.path.exists(os.path.join(p, "java"))
        for p in os.environ.get("PATH", "").split(os.pathsep)
    ):
        print("no JVM found (set JAVA_HOME); pyspark local mode needs Java 17+")
        return 1

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tests = os.path.join(repo, "tests")
    if not os.path.isdir(tests):  # installed without the test tree
        print(f"test directory not found at {tests}; run from a source checkout")
        return 1
    return pytest.main([tests, "-x", "-q", *(argv or [])])


if __name__ == "__main__":
    sys.exit(main())
