"""Hypothesis property tests for the round-5 expression kernels: the BPE
merge fold and the perceptual-hash signature must agree with their pure-
Python references on adversarial inputs the corpus never produces
(overlap runs like a,a,a; merged symbols re-matching; empty/1-byte
payloads). Batched — one Spark job per property run."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from vat_etl_spark.operators.multimodal import PHASH_BITS
from vat_etl_spark.queries.llm_pipeline import _merge_pair_expr


from tests.conftest import py_bpe_merge as _py_merge


syms = st.sampled_from(["a", "b", "aa", "ab", "c"])


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.lists(syms, min_size=0, max_size=12), min_size=1, max_size=16),
    syms,
    syms,
)
def test_merge_fold_matches_python_reference(spark, arrays, a, b):
    # includes the nasty cases: runs of the pair symbol (a,a,a with pair
    # (a,a) must fuse leftmost-first -> [aa, a]), and a merged symbol that
    # equals the left element (pair (aa, b) after an (a,a) fuse)
    df = spark.createDataFrame(
        [(i, arr) for i, arr in enumerate(arrays)], "i int, syms array<string>"
    )
    got = {
        r.i: list(r.m)
        for r in df.select(
            "i", _merge_pair_expr(F.col("syms"), a, b).alias("m")
        ).collect()
    }
    for i, arr in enumerate(arrays):
        assert got[i] == _py_merge(arr, a, b), (arr, a, b)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=12))
def test_phash_matches_python_on_arbitrary_bytes(spark, payloads):
    from pyspark.sql import types as T

    from vat_etl_spark.operators.multimodal import perceptual_hash

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(payloads)], schema
    )
    got = {r.doc_id: list(r.bands) for r in perceptual_hash(df).collect()}

    def ref(b: bytes) -> list[int]:
        from vat_etl_spark.operators.multimodal import (
            PHASH_BAND_BITS,
            PHASH_BANDS,
        )

        n = len(b)
        bands = [0] * PHASH_BANDS
        if not n:
            return bands
        total = sum(b)
        for i in range(PHASH_BITS):
            lo, hi = i * n // PHASH_BITS, (i + 1) * n // PHASH_BITS
            if hi > lo and sum(b[lo:hi]) * n >= total * (hi - lo):
                bands[i // PHASH_BAND_BITS] |= 1 << (i % PHASH_BAND_BITS)
        return bands

    for i, b in enumerate(payloads):
        assert got[i] == ref(b), b


def test_sampling_coin_never_overflows_to_negative(spark):
    """The per-mille sampling coin folds doc_id to 31 bits BEFORE the
    multiply: for doc_id up to 2^62 the bucket stays in [0, 1000) — the
    unmasked product would wrap negative above ~3.5e9 (and a negative
    bucket always passes `bucket < rate`, silently keeping every such
    doc). Pins the masked form for both primes."""
    from pyspark.sql import functions as F

    ids = [0, 1, 3_499_999_999, 2**31, 2**40, 2**62, 2**62 + 12345]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = df.select(
        (((F.col("doc_id") % 2147483648) * 2654435761) % 1000).alias("b1"),
        (((F.col("doc_id") % 2147483648) * 2246822519) % 1000).alias("b2"),
    ).collect()
    for r in out:
        assert 0 <= r.b1 < 1000 and 0 <= r.b2 < 1000, tuple(r)
