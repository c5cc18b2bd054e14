"""Deterministic synthetic ``repo_files`` + ``labeled_pairs`` generator.

Implements FIXTURES.md §1-2: a source-code-repository table of shape
(repo, path, commit, lang, content, content_sha256, file_id) with injected
duplicate classes, and the ground-truth pair labels for pairwise F1.

Scale design: files are generated **distributed** via ``mapInPandas`` over a
range of group ids; every group's rows depend only on (seed, group_id), so
output is identical regardless of partitioning/parallelism — the property
both the determinism gate (SURVEY.md §4.2) and the local[8]-vs-local[32]
scaling benchmark rely on. No wall-clock, no global RNG.

Entity-cluster classes per FIXTURES.md §1 (cycled by group id):
  exact       — identical content, different repo/path
  whitespace  — whitespace/comment-only variants (high edit-ratio)
  rename      — identifier-rename variants (token-Jaccard / JW territory)
  truncate    — truncated/extended copies (prefix overlap)
  hardneg     — same lang + same normalized basename, unrelated content
                (shares the path blocking key; must NOT match)
  singleton   — no duplicate anywhere

Every labeled pair (positive and negative) shares the path blocking key
``path:<lang>:<normalized basename>`` by construction — the "at the same
blocking key" clause of the F1 metric. sha/prefix/MinHash keys add recall on
top (operators/blocking.py).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAX_GROUP_SIZE = 8  # file_id = group_id * 8 + member_index

KINDS = ["exact", "whitespace", "rename", "truncate", "hardneg", "singleton", "singleton"]

_LANGS = ["python", "python", "python", "python", "python", "python", "java", "java", "go", "js"]
_EXTS = {"python": "py", "java": "java", "go": "go", "js": "js", "rust": "rs"}

_BASENAMES = [
    "parser", "scheduler", "tokenizer", "allocator", "router", "encoder",
    "decoder", "resolver", "planner", "executor", "compactor", "balancer",
    "sampler", "indexer", "matcher", "shuffler", "reducer", "mapper",
    "watcher", "builder",
]
_ORGS = ["acme", "acme-inc", "globex", "initech", "umbrella", "hooli", "stark"]
_PROJECTS = ["utils", "core", "engine", "pipeline", "toolkit", "platform", "service"]
_DIRS = ["src/core", "src/main", "lib", "pkg/internal", "app/modules", "services/api"]

_WORDS = (
    "the quick data frame that is processed for each batch and written to "
    "the output table with a stable partition layout for downstream jobs"
).split()

_STMTS = [
    "total = total + {c} * factor",
    "buffer.append(item_{c})",
    "if count > {c}: count = count - 1",
    "state[{c}] = compute(state.get({c}, 0))",
    "result = merge(result, chunk_{c})",
    "offset = (offset + {c}) % capacity",
    "cache.put(key_{c}, value_{c})",
    "metrics.incr('op_{c}')",
]

FILES_SCHEMA = T.StructType(
    [
        T.StructField("file_id", T.LongType(), False),
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
    ]
)

PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("left_id", T.LongType(), False),
        T.StructField("right_id", T.LongType(), False),
        T.StructField("is_match", T.BooleanType(), False),
        T.StructField("block_key", T.StringType(), False),
    ]
)


def _rng(seed: int, group_id: int) -> np.random.RandomState:
    return np.random.RandomState((seed * 1_000_003 + group_id) % (2**31 - 1))


def group_spec(group_id: int, seed: int) -> dict:
    """Cheap structural spec (no content): kind, lang, basename, n members."""
    rng = _rng(seed, group_id)
    kind = KINDS[group_id % len(KINDS)]
    lang = _LANGS[rng.randint(len(_LANGS))]
    basename = _BASENAMES[group_id % len(_BASENAMES)]
    n = {"exact": 3, "whitespace": 2, "rename": 2, "truncate": 3, "hardneg": 2, "singleton": 1}[kind]
    return {"kind": kind, "lang": lang, "basename": basename, "n": n}


def _pseudo_sha(tag: str) -> str:
    return hashlib.sha1(tag.encode("utf-8")).hexdigest()  # 40-hex commit id


def _base_content(rng: np.random.RandomState, basename: str, salt: int) -> str:
    """Deterministic source-ish snippet, 400-2000 chars."""
    fn = f"{basename}_run_{salt}"
    cls = basename.capitalize() + str(salt)
    desc = " ".join(_WORDS[rng.randint(len(_WORDS))] for _ in range(12))
    n_lines = 14 + int(rng.randint(24))
    body = []
    for i in range(n_lines):
        # wide constant space keeps cross-group shingle overlap realistic
        # (unrelated real files don't share 50%+ of their 5-grams)
        stmt = _STMTS[rng.randint(len(_STMTS))].format(c=int(rng.randint(100000)))
        body.append("    " + stmt)
    lines = [
        f'"""{desc}"""',
        "import os",
        "import sys",
        "",
        f"def {fn}(items, factor):",
        "    total = 0",
        "    result = {}",
        "    buffer = []",
        "    count = len(items)",
        "    offset = 0",
        "    capacity = 64",
        *body,
        "    return result",
        "",
        f"class {cls}:",
        "    def __init__(self, name):",
        "        self.name = name",
        "",
        "    def describe(self):",
        f"        return '{desc[:40]}' + self.name",
        "",
    ]
    return "\n".join(lines)


def _variant(kind: str, member: int, base: str, rng: np.random.RandomState, basename: str) -> str:
    if member == 0 or kind in ("exact", "singleton"):
        return base
    if kind == "whitespace":
        out_lines = []
        for ln in base.split("\n"):
            out_lines.append(ln.replace(", ", ",  ").replace(" = ", "  =  "))
            if rng.rand() < 0.2:
                out_lines.append("")
        out_lines.append(f"# reviewed batch {int(rng.randint(10))}")
        return "\n".join(out_lines)
    if kind == "rename":
        return base.replace(f"{basename}_run_", f"{basename}_exec_")
    if kind == "truncate":
        lines = base.split("\n")
        if member == 1:  # truncated: keep first ~75% of lines
            keep = max(12, int(len(lines) * 0.75))
            return "\n".join(lines[:keep])
        # extended: append extra statements
        extra = ["", "def extra_helper(x):", "    return x + 1", ""]
        return base + "\n".join(extra)
    if kind == "hardneg":
        # unrelated content, same basename/lang (different salt => different
        # identifiers, different statement mix)
        return _base_content(rng, basename + "alt", 9000 + member)
    return base


def group_files(group_id: int, seed: int) -> list[dict]:
    spec = group_spec(group_id, seed)
    rng = _rng(seed, group_id)
    # burn the draws group_spec made so content draws are independent of call order
    base = _base_content(rng, spec["basename"], group_id % 10)
    ext = _EXTS[spec["lang"]]
    rows = []
    for m in range(spec["n"]):
        content = _variant(spec["kind"], m, base, rng, spec["basename"])
        org = _ORGS[(group_id + m) % len(_ORGS)]
        project = _PROJECTS[(group_id * 3 + m) % len(_PROJECTS)]
        d = _DIRS[(group_id + 2 * m) % len(_DIRS)]
        suffix = "" if m == 0 else (f"_v{m + 1}" if spec["kind"] != "exact" else "")
        path = f"{d}/{spec['basename']}{suffix}.{ext}"
        fid = group_id * MAX_GROUP_SIZE + m
        rows.append(
            {
                "file_id": fid,
                "repo": f"{org}/{project}",
                "path": path,
                "commit": _pseudo_sha(f"commit-{fid}"),
                "lang": spec["lang"],
                "content": content,
            }
        )
    return rows


def group_pairs(group_id: int, seed: int, n_groups: int) -> list[dict]:
    """Labeled pairs derivable from structure alone (no content needed).

    Positives: all intra-group pairs for duplicate-class groups.
    Negatives: the hardneg intra-group pair, plus a cross-group pair against
    group_id + len(KINDS)*len(_BASENAMES)... simplified: against the next
    group sharing (basename, lang) at stride len(_BASENAMES), when it exists.
    """
    from .functions.text import normalize_basename

    spec = group_spec(group_id, seed)
    key = f"path:{spec['lang']}:{normalize_basename(spec['basename'] + '.x')}"
    out = []
    ids = [group_id * MAX_GROUP_SIZE + m for m in range(spec["n"])]
    if spec["kind"] in ("exact", "whitespace", "rename", "truncate"):
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out.append(
                    {"left_id": ids[i], "right_id": ids[j], "is_match": True, "block_key": key}
                )
    elif spec["kind"] == "hardneg":
        out.append({"left_id": ids[0], "right_id": ids[1], "is_match": False, "block_key": key})
    # cross-group negative: same basename repeats every len(_BASENAMES) groups
    other = group_id + len(_BASENAMES)
    if other < n_groups:
        ospec = group_spec(other, seed)
        if ospec["lang"] == spec["lang"] and ospec["basename"] == spec["basename"]:
            out.append(
                {
                    "left_id": ids[0],
                    "right_id": other * MAX_GROUP_SIZE,
                    "is_match": False,
                    "block_key": key,
                }
            )
    return out


# ---------------------------------------------------------------------------
# Spark-distributed generation
# ---------------------------------------------------------------------------

def generate_repo_files(spark: SparkSession, n_groups: int = 300, seed: int = 42) -> DataFrame:
    """Distributed deterministic repo_files table (~2.2 rows/group)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for gid in pdf["id"].tolist():
                rows.extend(group_files(int(gid), seed))
            yield pd.DataFrame(rows, columns=[f.name for f in FILES_SCHEMA.fields])

    base = spark.range(0, n_groups)
    return base.mapInPandas(gen, schema=FILES_SCHEMA)


def generate_labeled_pairs(spark: SparkSession, n_groups: int = 300, seed: int = 42) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for gid in pdf["id"].tolist():
                rows.extend(group_pairs(int(gid), seed, n_groups))
            yield pd.DataFrame(rows, columns=[f.name for f in PAIRS_SCHEMA.fields])

    return spark.range(0, n_groups).mapInPandas(gen, schema=PAIRS_SCHEMA)


def generate_repo_files_pdf(n_groups: int = 300, seed: int = 42) -> pd.DataFrame:
    """Driver-side variant for unit tests (no Spark session needed)."""
    rows: list[dict] = []
    for gid in range(n_groups):
        rows.extend(group_files(gid, seed))
    return pd.DataFrame(rows)


def generate_labeled_pairs_pdf(n_groups: int = 300, seed: int = 42) -> pd.DataFrame:
    rows: list[dict] = []
    for gid in range(n_groups):
        rows.extend(group_pairs(gid, seed, n_groups))
    return pd.DataFrame(rows)
