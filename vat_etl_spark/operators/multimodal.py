"""Multimodal column convention (north-star extension, SURVEY.md §2.9):
image/audio/video payloads as opaque ``binary`` columns beside a typed
metadata struct, with decode / feature-extraction as Arrow-batched
``mapInPandas`` stages.

The pixel-decode libraries (PIL / torchaudio / ffmpeg) are NOT in this
container, so :func:`decode_image` carries a self-contained pure-Python
header parser (PNG/GIF/BMP/netpbm dimensions) as its fallback, upgrading
transparently to PIL's full decode when importable — the Spark plumbing
(schema, Arrow batching, partition behavior, null handling on malformed
bytes) is identical either way, so swapping in a heavier decoder changes
only the inner bytes→values function. :func:`extract_features` is the
deterministic byte-level featureizer used by the registered queries.

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


def _probe_image_dims(b: bytes) -> tuple[int | None, int | None]:
    """Pure-Python (width, height) probe for the common container formats —
    header parsing only, no pixel decode, no third-party libs:

    - PNG: IHDR width/height at bytes 16..24 (big-endian u32)
    - GIF87a/89a: logical screen size at bytes 6..10 (little-endian u16)
    - BMP: DIB header size at byte 14 picks the layout — ≥40
      (BITMAPINFOHEADER+) i32 dims at 18..26, 12 (OS/2
      BITMAPCOREHEADER) u16 dims at 18..22, anything else unknown
    - netpbm (P1-P6): ASCII dims after the magic, comments skipped

    Unknown/truncated payloads → (None, None); decoding never throws on
    malformed bytes (a 100 TB corpus always contains some)."""
    import re
    import struct

    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
            w, h = struct.unpack(">II", b[16:24])
            return int(w), int(h)
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            return int(w), int(h)
        if b[:2] == b"BM" and len(b) >= 22:
            (dib_size,) = struct.unpack("<I", b[14:18])
            if dib_size >= 40 and len(b) >= 26:
                w, h = struct.unpack("<ii", b[18:26])
                return int(w), abs(int(h))  # negative h = top-down DIB
            if dib_size == 12:  # OS/2 BITMAPCOREHEADER: u16 dims
                w, h = struct.unpack("<HH", b[18:22])
                return int(w), int(h)
            return None, None
        if len(b) >= 2 and b[0:1] == b"P" and b[1:2] in b"123456":
            header = re.sub(rb"#[^\n]*", b"", b[2:256])  # strip comments
            nums = re.findall(rb"\d+", header)[:2]
            if len(nums) == 2:
                return int(nums[0]), int(nums[1])
    except Exception:
        pass
    return None, None


def decode_image(mm: DataFrame, use_pil: bool | None = None) -> DataFrame:
    """Decode image payloads to (width, height)-filled metadata structs.

    Arrow-batched mapInPandas over the multimodal convention; output schema
    equals the input's, so decode composes with featurize / frame-sample /
    resize. ``use_pil=None`` (default) uses PIL when importable (full
    pixel-level decode) and otherwise a self-contained pure-Python header
    parser (:func:`_probe_image_dims`) that fills dimensions for
    PNG/GIF/BMP/netpbm — the container ships no imaging lib, and the
    plumbing (schema, batching, null behavior) is identical either way.
    Pass ``use_pil=False`` to force the header probe (tests use this so
    results don't depend on whether PIL is installed — PIL rejects
    header-only synthetic payloads that the probe accepts). Payloads that
    are not recognizable images keep NULL width/height rather than failing
    the batch."""
    probe = _probe_image_dims
    if use_pil is not False:
        try:
            from PIL import Image  # noqa: F401
            import io

            def probe(b: bytes) -> tuple[int | None, int | None]:
                try:
                    with Image.open(io.BytesIO(b)) as im:
                        return int(im.width), int(im.height)
                except Exception:
                    return None, None

        except ImportError:
            if use_pil is True:
                raise

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
                w, h = probe(b)
                rows.append(
                    (
                        doc_id,
                        payload,
                        uri,
                        {
                            "mime": meta["mime"],
                            "n_bytes": meta["n_bytes"],
                            "checksum": meta["checksum"],
                            "width": w,
                            "height": h,
                        },
                    )
                )
            yield pd.DataFrame(rows, columns=["doc_id", "payload", "uri", "meta"])

    return mm.mapInPandas(batches, schema=out_schema)


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


AUDIO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("peak_abs", T.LongType()),
    ]
)


def audio_frame_energy(mm: DataFrame, frame_samples: int = 256) -> DataFrame:
    """Audio framing over the multimodal convention: interpret the binary
    payload as s16le PCM, cut into ``frame_samples``-sample frames, and
    emit per-frame integer energy (sum of squared samples) and peak
    amplitude — the framing+feature step a speech pipeline runs before an
    acoustic model (real decode of containerized audio would go through a
    codec here; the PCM interpretation keeps the Spark-side plumbing —
    schema, Arrow batching, frame geometry, integer determinism — real and
    testable without audio libs).

    Arrow-batched ``mapInPandas`` with numpy vectorized framing; output is
    integer-only so results are bit-stable across engines, partitionings,
    and BLAS builds. Map-only at any scale — one input row expands to
    ⌈n_samples/frame⌉ output rows, no shuffle."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                usable = len(b) // 2 * 2
                samples = np.frombuffer(b[:usable], dtype="<i2").astype(np.int64)
                for idx in range(0, max(len(samples), 1), frame_samples):
                    frame = samples[idx : idx + frame_samples]
                    out.append(
                        (
                            doc_id,
                            idx // frame_samples,
                            len(frame),
                            int((frame * frame).sum()) if len(frame) else 0,
                            int(np.abs(frame).max()) if len(frame) else 0,
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "frame_idx", "n_samples", "energy", "peak_abs"],
            )

    return mm.mapInPandas(batches, schema=AUDIO_FRAMES_SCHEMA)


KEYFRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("delta", T.LongType()),
        T.StructField("is_keyframe", T.BooleanType()),
    ]
)


def keyframe_select(
    mm: DataFrame, frame_bytes: int = 64, threshold: int = 2000
) -> DataFrame:
    """Video-style keyframe selection over the multimodal convention:
    payloads are cut into fixed ``frame_bytes`` frames and a frame is a
    keyframe when its byte-level delta from the previous frame (sum of
    absolute byte differences, zero-padded to equal length) exceeds
    ``threshold`` — the scene-cut heuristic a sampling pipeline runs
    before an expensive vision model (real decode would compare pixel
    planes; byte deltas keep the plumbing — framing geometry, sequential
    delta recurrence, Arrow batching — real without codecs). Frame 0 is
    always a keyframe. Integer-only and map-only at any scale."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                prev = None
                n_frames = max(-(-len(b) // frame_bytes), 1)
                for i in range(n_frames):
                    fr = np.frombuffer(
                        b[i * frame_bytes : (i + 1) * frame_bytes], dtype=np.uint8
                    ).astype(np.int64)
                    if prev is None:
                        delta = 0
                        key = True
                    else:
                        width = max(len(fr), len(prev))
                        a = np.zeros(width, dtype=np.int64); a[: len(fr)] = fr
                        p = np.zeros(width, dtype=np.int64); p[: len(prev)] = prev
                        delta = int(np.abs(a - p).sum())
                        key = delta > threshold
                    out.append((doc_id, i, delta, key))
                    prev = fr
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "delta", "is_keyframe"]
            )

    return mm.mapInPandas(batches, schema=KEYFRAMES_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("bands", T.ArrayType(T.LongType())),
    ]
)

PHASH_BITS = 256
PHASH_BANDS = 8  # pigeonhole: hamming <= 7 => >= 1 band equal, any band width
PHASH_BAND_BITS = PHASH_BITS // PHASH_BANDS  # 32


def perceptual_hash(mm: DataFrame) -> DataFrame:
    """Block-average perceptual hash (the aHash recipe of classic image
    near-dup, applied byte-domain): the payload is split into 256 equal
    byte blocks, bit i is set when block i's mean byte value is >= the
    whole payload's mean. Visually/structurally similar payloads flip few
    bits, so near-duplicates sit at small Hamming distance — the property
    banded LSH blocking exploits.

    The signature is emitted as PHASH_BANDS unsigned 32-bit BAND WORDS
    (band k = bits [32k, 32k+32), each < 2^32 so it is sign-safe as a
    BIGINT in both engines) — the band word IS the LSH bucket key, and
    Hamming distance is the sum of per-band popcounts. 256 bits, not the
    round-12 56: a 7-bit band key has only 128 possible values, so at
    500 K docs every band bucket held ~3 900 docs and the banded join
    degenerated to 9.4 BILLION candidate pairs (measured, SCALE.md round
    13) — band-key cardinality must exceed the corpus size, exactly the
    lesson of the text MinHash R=2→3 cliff. The pigeonhole guarantee is
    unchanged (8 bands ⇒ lossless for hamming ≤ 7 ≥ tau=3): widening
    bands shrinks buckets without weakening it.

    Pure-integer, deterministic, Arrow batches; block sums are one numpy
    reduceat per payload (the 256-slice Python loop would be ~1.3 B
    interpreter iterations at 5 M docs)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bounds_cache: dict[int, "np.ndarray"] = {}
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n = len(b)
                bands = [0] * PHASH_BANDS
                if n:
                    arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                    total = int(arr.sum())
                    bounds = bounds_cache.get(n)
                    if bounds is None:
                        bounds = (np.arange(PHASH_BITS + 1) * n) // PHASH_BITS
                        bounds_cache[n] = bounds
                    blen = np.diff(bounds)
                    valid = blen > 0
                    bs = np.zeros(PHASH_BITS, dtype=np.int64)
                    # reduceat over only the non-empty starts: an empty
                    # block's end equals the next non-empty block's start,
                    # so consecutive valid starts delimit exact blocks
                    bs[valid] = np.add.reduceat(arr, bounds[:-1][valid])
                    # integer-exact comparison: block_sum * n >= total * block_len
                    bits = (bs * n >= total * blen) & valid
                    bands = [
                        int(x)
                        for x in (
                            bits.astype(np.int64).reshape(
                                PHASH_BANDS, PHASH_BAND_BITS
                            )
                            * (1 << np.arange(PHASH_BAND_BITS, dtype=np.int64))
                        ).sum(axis=1)
                    ]
                out.append((doc_id, n, bands))
            yield pd.DataFrame(out, columns=["doc_id", "n_bytes", "bands"])

    return mm.mapInPandas(batches, schema=PHASH_SCHEMA)
