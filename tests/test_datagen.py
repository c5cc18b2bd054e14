"""Generator determinism + fixture-quality gates (SURVEY.md §7.1 step 1)."""

import hashlib

from entity_resolution_spark.datagen import (
    generate_labeled_pairs_pdf,
    generate_repo_files_pdf,
    group_files,
)
from entity_resolution_spark.functions.similarity import fuzz_ratio, jaro_winkler, token_jaccard
from entity_resolution_spark.functions.text import (
    identifier_tokens,
    normalize_basename,
    normalize_content,
)


def test_generator_deterministic():
    a = generate_repo_files_pdf(30)
    b = generate_repo_files_pdf(30)
    assert a.equals(b)
    assert group_files(7, 42) == group_files(7, 42)
    assert group_files(7, 42) != group_files(7, 43)


def test_schema_and_invariants():
    files = generate_repo_files_pdf(50)
    assert list(files.columns) == ["file_id", "repo", "path", "commit", "lang", "content"]
    assert files.file_id.is_unique
    assert files.commit.str.len().eq(40).all()
    assert files.content.str.len().ge(300).all()
    assert files.lang.isin(["python", "java", "go", "js", "rust"]).all()


def test_labeled_pairs_reference_valid_ids():
    files = generate_repo_files_pdf(50)
    pairs = generate_labeled_pairs_pdf(50)
    ids = set(files.file_id)
    assert set(pairs.left_id).issubset(ids)
    assert set(pairs.right_id).issubset(ids)
    assert (pairs.left_id < pairs.right_id).all()  # canonical ordering §1.3
    assert pairs.is_match.any() and (~pairs.is_match).any()


def test_pairs_share_declared_block_key():
    """Every labeled pair's block_key must equal the path key both sides
    actually produce — the 'at the same blocking key' metric clause."""
    files = generate_repo_files_pdf(60).set_index("file_id")
    pairs = generate_labeled_pairs_pdf(60)
    for p in pairs.itertuples():
        for fid in (p.left_id, p.right_id):
            row = files.loc[fid]
            key = f"path:{row.lang}:{normalize_basename(row.path)}"
            assert key == p.block_key, (fid, key, p.block_key)


def test_score_separation():
    """Fixture quality gate: blend >= 80 for all positives, < 80 for all
    negatives — otherwise F1>=0.99 is unreachable by construction."""
    files = generate_repo_files_pdf(70).set_index("file_id").to_dict("index")
    pairs = generate_labeled_pairs_pdf(70)
    for p in pairs.itertuples():
        a, b = files[p.left_id], files[p.right_id]
        lev = fuzz_ratio(normalize_content(a["content"]), normalize_content(b["content"]))
        jac = token_jaccard(identifier_tokens(a["content"]), identifier_tokens(b["content"]))
        jw = jaro_winkler(a["path"].rsplit("/", 1)[-1], b["path"].rsplit("/", 1)[-1])
        blend = 0.40 * lev + 0.35 * 100 * jac + 0.25 * 100 * jw
        if p.is_match:
            assert blend >= 80, (p, blend)
        else:
            assert blend < 80, (p, blend)


def test_sha256_invariant_derivable():
    files = generate_repo_files_pdf(10)
    h = hashlib.sha256(files.iloc[0].content.encode("utf-8")).hexdigest()
    assert len(h) == 64


def test_distributed_generation_matches_driver(spark):
    from entity_resolution_spark.datagen import generate_labeled_pairs, generate_repo_files

    sdf = generate_repo_files(spark, 40).orderBy("file_id").toPandas()
    pdf = generate_repo_files_pdf(40).reset_index(drop=True)
    assert sdf.equals(pdf)
    sp = generate_labeled_pairs(spark, 40).orderBy("left_id", "right_id").toPandas()
    pp = (
        generate_labeled_pairs_pdf(40)
        .sort_values(["left_id", "right_id"])
        .reset_index(drop=True)
    )
    assert sp.equals(pp)
