"""Multimodal column plumbing: payload/metadata schema, Arrow-batched
feature extraction determinism, decode stub behavior."""

from __future__ import annotations

import pytest

from vat_etl_spark.operators.multimodal import (
    attach_payload,
    decode_image,
    extract_features,
)
from vat_etl_spark.sources.catalog import read_table


@pytest.fixture(scope="module")
def mm(spark, sf_smoke):
    return attach_payload(read_table(spark, sf_smoke, "documents"))


def test_payload_schema(mm):
    fields = dict(mm.dtypes)
    assert fields["payload"] == "binary"
    assert "mime" in fields["meta"] and "checksum" in fields["meta"]


def test_checksum_matches_text(mm, spark, sf_smoke):
    docs = {r.doc_id: r.text for r in read_table(spark, sf_smoke, "documents").collect()}
    import hashlib

    for r in mm.limit(5).collect():
        want = hashlib.md5(docs[r.doc_id].encode()).hexdigest()
        assert r.meta.checksum == want
        assert r.meta.n_bytes == len(docs[r.doc_id].encode())


def test_feature_extraction_deterministic(mm):
    a = {r.doc_id: (r.n_bytes, tuple(r.byte_histogram), r.entropy_proxy)
         for r in extract_features(mm).collect()}
    b = {r.doc_id: (r.n_bytes, tuple(r.byte_histogram), r.entropy_proxy)
         for r in extract_features(mm).collect()}
    assert a == b
    some = next(iter(a.values()))
    assert sum(some[1]) == some[0]  # histogram mass == byte count


def test_decode_stub_raises(mm):
    with pytest.raises(NotImplementedError):
        decode_image(mm)


def test_frame_sample_is_map_only(spark, sf_smoke):
    from vat_etl_spark.plans import shuffle_count
    from vat_etl_spark.queries import QUERIES

    df = QUERIES["multimodal_frame_sample"](spark, sf_smoke)
    assert shuffle_count(df) == 0
    # stride-2 sampling: only even frame indices survive
    assert df.filter((df.frame_idx % 2) == 1).count() == 0


def test_resize_payload_shrinks_and_refreshes_meta(spark, sf_smoke):
    import math

    from vat_etl_spark.operators.multimodal import attach_payload, resize_payload
    from vat_etl_spark.sources.catalog import read_table

    docs = read_table(spark, sf_smoke, "documents").limit(50)
    mm = attach_payload(docs)
    orig = {r.doc_id: r.meta.n_bytes for r in mm.select("doc_id", "meta").collect()}
    small = resize_payload(mm, factor=4)
    # composable: same multimodal convention (nullability aside — mapInPandas
    # output fields are always nullable)
    assert [(f.name, f.dataType.simpleString()) for f in small.schema.fields] == [
        (f.name, f.dataType.simpleString()) for f in mm.schema.fields
    ]
    for r in small.collect():
        assert r.meta.n_bytes == math.ceil(orig[r.doc_id] / 4)
        assert len(r.payload) == r.meta.n_bytes
