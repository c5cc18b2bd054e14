"""chunk_documents properties: full coverage, exact overlap, edge lengths."""

import pytest

from entity_resolution_spark.operators.chunking import chunk_documents


def _rows(spark, texts, **kw):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = chunk_documents(df, **kw).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_idx)):
        by_doc.setdefault(r.doc_id, []).append(r)
    return by_doc


def test_coverage_and_overlap(spark):
    texts = ["a" * 5, "b" * 10, "c" * 11, "d" * 25, "", None, "x"]
    chunk, overlap = 10, 3
    by_doc = _rows(spark, texts, chunk_chars=chunk, overlap=overlap)
    # empty/None yield no rows
    assert 4 not in by_doc and 5 not in by_doc
    for i, t in enumerate(texts):
        if not t:
            continue
        rows = by_doc[i]
        # reassembling chunks with overlap stripped gives back the text
        rebuilt = rows[0].chunk + "".join(r.chunk[overlap:] for r in rows[1:])
        assert rebuilt == t, (i, rebuilt)
        # offsets are consistent with the chunk payloads
        for r in rows:
            assert t[r.chunk_start - 1 : r.chunk_end] == r.chunk
            assert len(r.chunk) <= chunk
        # consecutive chunks share exactly `overlap` characters
        for a, b in zip(rows, rows[1:]):
            assert b.chunk_start == a.chunk_start + (chunk - overlap)
            assert a.chunk[-overlap:] == b.chunk[:overlap] or len(a.chunk) < chunk


def test_single_chunk_when_short(spark):
    by_doc = _rows(spark, ["short"], chunk_chars=100, overlap=10)
    assert len(by_doc[0]) == 1
    r = by_doc[0][0]
    assert (r.chunk_idx, r.chunk_start, r.chunk_end, r.chunk) == (0, 1, 5, "short")


def test_boundary_one_past_chunk(spark):
    # n = chunk + 1 must produce a second window that still overlaps
    by_doc = _rows(spark, ["ab" * 5 + "z"], chunk_chars=10, overlap=4)
    rows = by_doc[0]
    assert len(rows) == 2
    assert rows[1].chunk_start == 7 and rows[1].chunk == "ababz"


def test_invalid_overlap_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=10, overlap=10)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_chars=10, overlap=-1)
