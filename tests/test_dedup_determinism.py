"""Determinism coverage for the rows-only (Spark-specific-hash) operators:
same session, same inputs → identical result sets. Seeded hashing
(MinHashLSH/BRP-LSH seed=42, xxhash64) must not vary across runs or
partitionings."""

from __future__ import annotations

from vat_etl_spark.queries import QUERIES


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_minhash_lsh_deterministic(spark, sf_smoke):
    a = _rows(QUERIES["dedup_minhash_lsh"](spark, sf_smoke))
    b = _rows(QUERIES["dedup_minhash_lsh"](spark, sf_smoke))
    assert a == b and len(a) > 0


def test_simhash_deterministic_and_64bit(spark, sf_smoke):
    a = _rows(QUERIES["dedup_simhash"](spark, sf_smoke))
    b = _rows(QUERIES["dedup_simhash"](spark, sf_smoke))
    assert a == b and len(a) > 0


def test_ann_lsh_deterministic(spark, sf_smoke):
    a = _rows(QUERIES["ann_lsh_bucketed"](spark, sf_smoke))
    b = _rows(QUERIES["ann_lsh_bucketed"](spark, sf_smoke))
    assert a == b and len(a) > 0


def test_multimodal_features_deterministic(spark, sf_smoke):
    df = QUERIES["multimodal_features"](spark, sf_smoke)
    a = sorted((r.doc_id, r.n_bytes, r.entropy_proxy) for r in df.collect())
    b = sorted((r.doc_id, r.n_bytes, r.entropy_proxy) for r in df.collect())
    assert a == b and len(a) > 0


def test_kmeans_lloyd_deterministic_and_total(spark, sf_smoke):
    """kmeans_lloyd: deterministic across runs (fixed init, deterministic
    argmax tie-break) and every vector lands in exactly one of K clusters."""
    from vat_etl_spark.queries import QUERIES
    from vat_etl_spark.sources.catalog import read_table

    a = sorted(map(tuple, QUERIES["kmeans_lloyd"](spark, sf_smoke).collect()))
    b = sorted(map(tuple, QUERIES["kmeans_lloyd"](spark, sf_smoke).collect()))
    assert a == b
    n_vecs = read_table(spark, sf_smoke, "embeddings").count()
    assert sum(r[1] for r in a) == n_vecs
    assert len(a) <= 8
