"""Multimodal column convention (north-star extension, SURVEY.md §2.9):
image/audio/video payloads as opaque ``binary`` columns beside a typed
metadata struct, with decode / feature-extraction as Arrow-batched
``mapInPandas`` stages.

The decode libraries (PIL / torchaudio / ffmpeg) are NOT in this container,
so the actual byte→pixels step is STUBBED: :func:`decode_image` raises
NotImplementedError unless PIL is importable, and the tested path uses
:func:`extract_features` — a deterministic byte-level featureizer with the
exact Spark plumbing (schema, Arrow batching, partition behavior) the real
decoder would use. Swapping the stub for a real decoder changes only the
inner function body.

Scale notes: payloads at 100 TB should be *pointer-style* (path + offset +
length into object storage) with the binary fetched inside mapInPandas per
batch — never shuffled. Here payloads are inline for testability; the schema
carries both forms (``payload`` nullable, ``uri`` nullable).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MULTIMODAL_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("width", T.IntegerType()),   # decode-time metadata,
        T.StructField("height", T.IntegerType()),  # NULL until decoded
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_histogram", T.ArrayType(T.LongType())),
        T.StructField("entropy_proxy", T.DoubleType()),
    ]
)


def attach_payload(documents: DataFrame) -> DataFrame:
    """Promote a text corpus to the multimodal column convention: binary
    payload + metadata struct + nullable storage URI. (Real pipelines ingest
    bytes directly; encoding text is the container-friendly stand-in.)"""
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.lit("text/plain").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.lit(None).cast("string").alias("uri"),
        meta.alias("meta"),
    )


def extract_features(mm: DataFrame, n_bins: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas:
    per-payload byte histogram + an entropy proxy. Deterministic — this is
    the tested stand-in for an image/audio featureizer; the batch shape,
    schema contract, and partition-preserving execution are the real thing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                hist = [0] * n_bins
                for byte in b:
                    hist[byte % n_bins] += 1
                n = len(b)
                ent = 0.0
                for h in hist:
                    if h:
                        p = h / n
                        ent -= p * math.log2(p)
                out.append((doc_id, n, hist, ent))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "byte_histogram", "entropy_proxy"]
            )

    return mm.mapInPandas(batches, schema=FEATURES_SCHEMA)


def decode_image(mm: DataFrame) -> DataFrame:
    """Decode image payloads to (width, height)-filled metadata. STUB: the
    imaging library is not in this container."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; not available in this container — "
            "the plumbing path is extract_features()"
        ) from e
    raise NotImplementedError("real decoder wiring lands when PIL is present")


def sample_frames(
    mm: DataFrame, frame_bytes: int = 64, every_nth: int = 2
) -> DataFrame:
    """Frame sampling over binary payloads — the video/audio pattern (decode
    → fixed-size frames → keep every n-th) with the frame step as pure
    native byte slicing: sequence → explode → substring(payload, off, len).
    No Python in the row path; map-only (zero shuffles); at 100 TB with
    pointer-style payloads the substring happens after a per-batch ranged
    fetch inside mapInPandas, same schema out."""
    n_frames = F.ceil(F.col("meta.n_bytes") / F.lit(frame_bytes)).cast("int")
    idx = F.explode(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_nth))
    )
    framed = mm.select("doc_id", "payload", F.col("meta.n_bytes").alias("n_bytes"),
                       idx.alias("frame_idx"))
    frame = F.substring(F.col("payload"), F.col("frame_idx") * frame_bytes + 1, frame_bytes)
    return framed.filter(F.col("frame_idx") * frame_bytes < F.col("n_bytes")).select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        # hex so the oracle can compare frames (DuckDB can't byte-slice
        # blobs; it slices the hex string at 2× offsets instead)
        F.hex(frame).alias("frame_hex"),
        F.length(frame).cast("long").alias("frame_len"),
    )


def resize_payload(mm: DataFrame, factor: int = 4) -> DataFrame:
    """Resize-shaped transform over binary payloads: keep every ``factor``-th
    byte, recompute the metadata struct (n_bytes, checksum) for the new
    payload. This is the image-resize plumbing with a deterministic
    byte-level stand-in for the pixel kernel — payload in, smaller payload +
    refreshed metadata out, Arrow-batched, partition-preserving; a real
    resizer swaps only the inner bytes→bytes function (PIL.thumbnail etc.).
    Output schema equals the input multimodal convention so resize stages
    compose with featurize/frame-sample."""
    import hashlib

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("uri", T.StringType()),
            T.StructField("meta", MULTIMODAL_META),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, uri, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["uri"], pdf["meta"]
            ):
                b = bytes(payload) if payload is not None else b""
                small = b[::factor]
                rows.append(
                    (
                        doc_id,
                        small,
                        uri,
                        {
                            "mime": meta["mime"],
                            "n_bytes": len(small),
                            "checksum": hashlib.md5(small).hexdigest(),
                            "width": meta["width"],
                            "height": meta["height"],
                        },
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload", "uri", "meta"])

    return mm.mapInPandas(batches, schema=out_schema)
