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
