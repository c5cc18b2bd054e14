"""The DuckDB SQL replicas in contract/sql_kernels.py must match the numpy
kernels bit-for-bit — this is what lets the driver oracle-check the seeded
MinHash / SimHash / winnowing operators instead of a rows-only count.

These tests run DuckDB only (no Spark session) so they stay fast and
pin the kernel <-> SQL equivalence independently of the contract harness.
"""

import os
import sys
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from entity_resolution_spark.config import MinHashConfig
from entity_resolution_spark.contract import sql_kernels
from entity_resolution_spark.functions.minhash import minhash_signature
from entity_resolution_spark.functions.text import (
    batch_fingerprint,
    batch_simhash64,
    normalize_content,
)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con


@pytest.fixture(scope="module")
def docs(duck):
    return duck.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()


def test_corpus_is_ascii(duck):
    """The SQL replicas hash bytes via unicode(char) — valid only while the
    corpus is pure ASCII (codepoint == UTF-8 byte). If the driver's
    testdata ever grows non-ASCII documents this fails loudly instead of
    the oracles mismatching mysteriously."""
    n_bad = duck.execute(
        r"SELECT count(*) FROM documents WHERE NOT (text ~ '^[\x00-\x7F]*$')"
    ).fetchone()[0]
    assert n_bad == 0


def test_minhash_signature_sql_replica(duck, docs):
    cfg = MinHashConfig()
    got = duck.execute(sql_kernels.minhash_signatures_sql(cfg)).fetchall()
    expected = []
    for doc_id, text in docs:
        sig = minhash_signature(normalize_content(text), cfg)
        expected.extend((doc_id, slot, int(np.int64(v))) for slot, v in enumerate(sig))
    assert sorted(got) == sorted(expected)


def test_simhash_sql_replica(duck, docs):
    got = dict(duck.execute(sql_kernels.simhash_values_sql()).fetchall())
    texts = pd.Series([t for _, t in docs])
    expected = batch_simhash64(texts)
    assert len(got) == len(docs)
    for (doc_id, _), e in zip(docs, expected):
        assert got[doc_id] == int(e), doc_id


def test_fingerprints_sql_replica(duck, docs):
    got = duck.execute(sql_kernels.fingerprints_sql()).fetchall()
    texts = pd.Series([t for _, t in docs])
    expected = []
    for (doc_id, _), picks in zip(docs, batch_fingerprint(texts)):
        expected.extend((doc_id, pos, int(v)) for pos, v in enumerate(picks))
    assert sorted(got) == sorted(expected)


def test_embedding_lsh_pairs_sql_replica(duck):
    """SQL replica of the hyperplane-LSH sketch + cosine verify must equal
    the numpy definition on the real corpus (same seeded planes)."""
    duck.execute(
        f"CREATE VIEW IF NOT EXISTS embeddings AS "
        f"SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    vecs = dict(
        duck.execute("SELECT vec_id, embedding::DOUBLE[] FROM embeddings").fetchall()
    )
    n_tables, n_planes, min_cos = 8, 4, 0.4
    rng = np.random.RandomState(42)
    dim = len(next(iter(vecs.values())))
    planes = rng.normal(size=(n_tables, n_planes, dim)).astype("float64")
    keys = {}
    for vid, v in vecs.items():
        arr = np.asarray(v)
        if np.linalg.norm(arr) == 0:
            continue
        keys[vid] = {
            (t, tuple((planes[t] @ arr) >= 0)) for t in range(n_tables)
        }
    ids = sorted(keys)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not (keys[a] & keys[b]):
                continue
            va, vb = np.asarray(vecs[a]), np.asarray(vecs[b])
            cos = float(va @ vb) / (np.linalg.norm(va) * np.linalg.norm(vb))
            cos = float(Decimal(cos).quantize(Decimal("0.000001"), ROUND_HALF_UP))
            if cos >= min_cos:
                expected.add((a, b))
    got = {
        (l, r)
        for l, r, _ in duck.execute(
            sql_kernels.embedding_lsh_pairs_sql(min_cos, n_planes, n_tables)
        ).fetchall()
    }
    assert got == expected
    assert len(got) > 0  # non-vacuous at sf0.01 (round-1 verdict)


def test_minhash_lsh_pairs_sql_emits_banded_pairs(duck, docs):
    """The pairs oracle must equal the brute-force definition: pairs whose
    signatures agree on >= 1 full band AND whose slot-agreement fraction
    clears the threshold."""
    cfg = MinHashConfig()
    sigs = {
        doc_id: minhash_signature(normalize_content(text), cfg) for doc_id, text in docs
    }
    ids = sorted(sigs)
    r = cfg.rows_per_band
    expected = set()
    for i, a in enumerate(ids):
        sa = sigs[a]
        for b in ids[i + 1 :]:
            sb = sigs[b]
            if not any(
                np.array_equal(sa[k * r : (k + 1) * r], sb[k * r : (k + 1) * r])
                for k in range(cfg.bands)
            ):
                continue
            # HALF_UP like Spark's F.round and DuckDB's round() — python's
            # built-in round is banker's and disagrees on exact halves
            # (125/128 = 0.9765625 -> 0.976563, not 0.976562)
            est = float(
                Decimal(np.mean(sa == sb)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
            )
            if est >= 0.6:
                expected.add((a, b, est))
    got = {
        (l, rr, float(e))
        for l, rr, e in duck.execute(
            sql_kernels.minhash_lsh_pairs_sql(min_jaccard=0.6, cfg=cfg)
        ).fetchall()
    }
    assert got == expected
