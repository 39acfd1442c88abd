"""Multimodal (binary-column) operators: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payloads with typed metadata.

The Spark-side plumbing is real — Arrow-batched ``mapInPandas`` with declared
output schemas, binary columns kept opaque end-to-end — while the actual
codec work is STUBBED: this container has no image/audio libraries, so
``decode_image_real`` raises ``NotImplementedError`` and the queries use
``fake_decode_features``, a deterministic arithmetic "decode" whose outputs a
SQL oracle can replicate. Swapping the fake for a real decoder changes ONE
function; schemas, batching, and partitioning are production-shaped already.

Scale notes: mapInPandas streams Arrow batches executor-side (no driver
involvement, no per-row Python overhead); payload bytes cross the JVM<->Python
boundary once per batch. At 100 TB the knobs are
``spark.sql.execution.arrow.maxRecordsPerBatch`` (bound batch memory for fat
payloads) and input-split sizing so one task's batches fit the Python worker.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("first_byte", T.LongType(), True),
        T.StructField("last_byte", T.LongType(), True),
        T.StructField("byte_sum", T.LongType(), False),
        T.StructField("checksum", T.LongType(), False),
        T.StructField("resized_w", T.LongType(), False),
        T.StructField("resized_h", T.LongType(), False),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_offset", T.LongType(), False),
        T.StructField("sample_byte", T.LongType(), True),
    ]
)


def decode_image_real(payload: bytes) -> object:
    """STUB — real image decode. The container ships no imaging libraries;
    in production this is `PIL.Image.open(io.BytesIO(payload))` (or a
    libvips/ffmpeg call for audio/video) behind the same mapInPandas shape."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires an imaging library not present in "
            "this environment; use fake_decode_features for the deterministic "
            "test path"
        ) from exc
    raise NotImplementedError("real decode path not wired in this build")


def fake_decode_features(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for decode + feature-extract + resize: byte
    stats of the payload plus halved 'resize' dims from the metadata. Input
    columns: doc_id, payload (binary), width, height."""
    for pdf in batches:
        payloads = pdf["payload"]
        n = payloads.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n.astype("int64"),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else None),
                "last_byte": payloads.map(lambda b: b[-1] if len(b) else None),
                "byte_sum": payloads.map(lambda b: sum(b)).astype("int64"),
                "checksum": payloads.map(lambda b: sum(b) % 997).astype("int64"),
                "resized_w": (pdf["width"] // 2).astype("int64"),
                "resized_h": (pdf["height"] // 2).astype("int64"),
            }
        )


def fake_frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for video frame sampling: each payload expands
    to n_frames = (n_bytes % 4) + 1 rows with evenly spaced offsets and the
    sampled byte at each offset. Input columns: doc_id, payload."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_offset": [], "sample_byte": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_bytes = len(payload)
            n_frames = (n_bytes % 4) + 1
            stride = n_bytes // n_frames
            for idx in range(n_frames):
                off = idx * stride
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_offset"].append(off)
                out["sample_byte"].append(payload[off] if off < n_bytes else None)
        yield pd.DataFrame(out)


def decode_features(media: DataFrame) -> DataFrame:
    """media(doc_id, payload, width, height, ...) -> per-doc feature rows."""
    return media.select("doc_id", "payload", "width", "height").mapInPandas(
        fake_decode_features, FEATURES_SCHEMA
    )


def frame_sample(media: DataFrame) -> DataFrame:
    """media(doc_id, payload, ...) -> one row per sampled frame."""
    return media.select("doc_id", "payload").mapInPandas(fake_frame_sample, FRAMES_SCHEMA)
