"""Dedup semantics on planted fixtures: the oracle gate proves Spark==DuckDB;
these prove the algorithms actually FIND duplicates (recall on planted
near-dups) and don't hallucinate them (precision on unrelated docs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_demo_spark.queries import dedup as D

SF = "/root/testdata/sf0.001"


def _planted_docs(spark, tmp_path_factory):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden outside"
    )
    near = base.replace("lazy", "sleepy")  # one word changed -> jaccard ~0.9
    other = (
        "completely different content about distributed query engines and "
        "columnar storage formats with vectorized execution and partition pruning"
    )
    rows = [(0, base), (1, near), (2, other), (3, base)]  # 3 == exact dup of 0
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = str(tmp_path_factory.mktemp("dedup") / "documents.parquet")
    df.write.parquet(out)
    return out.rsplit("/documents.parquet", 1)[0]


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    return _planted_docs(spark, tmp_path_factory)


def test_minhash_lsh_finds_planted_near_dup(spark, planted_dir):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.dedup_minhash_lsh(spark, planted_dir).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.7  # near-dup found
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0  # exact dup found
    assert not any(2 in p for p in pairs)  # unrelated doc never paired


def test_ngram_jaccard_equals_minhash_verified_set(spark, planted_dir):
    exact = {(r.doc_a, r.doc_b) for r in D.dedup_ngram_jaccard(spark, planted_dir).collect()}
    lsh = {(r.doc_a, r.doc_b) for r in D.dedup_minhash_lsh(spark, planted_dir).collect()}
    assert lsh <= exact  # LSH candidates are verified -> subset of exact
    assert (0, 1) in lsh  # and high-similarity pairs survive LSH banding


def test_simhash_planted_near_dup_within_hamming(spark, planted_dir):
    rows = D.dedup_simhash(spark, planted_dir).collect()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    assert pairs.get((0, 3)) == 0  # identical text -> identical simhash
    assert (0, 1) in pairs  # one-word change stays within hamming budget
    assert not any(2 in p for p in pairs)


def test_exact_dedup_groups_identical_text(spark, planted_dir):
    rows = D.dedup_exact_text(spark, planted_dir).collect()
    by_keep = {r.keep_id: r.n_copies for r in rows}
    assert by_keep[0] == 2  # docs 0 and 3 collapse, min doc_id kept
    assert by_keep[1] == 1 and by_keep[2] == 1


def test_embedding_cosine_flags_identical_vectors(spark, tmp_path):
    vecs = [
        (0, [1.0, 0.0, 2.0, -1.0], 0),
        (1, [1.0, 0.0, 2.0, -1.0], 0),  # identical -> cosine 1.0
        (2, [-1.0, 5.0, 0.0, 1.0], 1),
    ]
    out = str(tmp_path / "embeddings.parquet")
    spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>, label int").write.parquet(out)
    rows = D.dedup_embedding_cosine(spark, str(tmp_path)).collect()
    pairs = {(r.vec_a, r.vec_b): r.cosine for r in rows}
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert (0, 2) not in pairs


def test_fixture_planted_near_dups_detected(spark):
    """The driver's documents fixture contains planted near-duplicates
    (probed: 25 pairs with jaccard >= 0.2 at sf0.01); the pipeline must
    surface them at sf0.001 too."""
    n = D.dedup_ngram_jaccard(spark, SF).count()
    assert n > 0


def test_dedup_clusters_transitive(spark, planted_dir):
    """docs 0,1,3 form one near-dup component (0~1 one-word change, 0~3
    exact); doc 2 is a singleton labeling itself."""
    labels = {r.doc_id: r.cluster_id for r in D.dedup_clusters(spark, planted_dir).collect()}
    assert labels == {0: 0, 1: 0, 3: 0, 2: 2}


def test_prefix_filtered_jaccard_equals_plain_inverted_index(spark):
    """The AllPairs prefix filter is an exact optimization: candidate pruning
    must not change the verified output by even one pair."""
    from kinesis_demo_spark.queries.dedup import dedup_ngram_jaccard, dedup_ngram_jaccard_prefix

    from .conftest import SF_SMOKE

    plain = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in dedup_ngram_jaccard(spark, SF_SMOKE).collect()}
    pref = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in dedup_ngram_jaccard_prefix(spark, SF_SMOKE).collect()}
    assert pref == plain and plain
