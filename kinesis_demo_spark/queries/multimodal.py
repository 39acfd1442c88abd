"""Multimodal-column queries: a synthetic ``media`` table (binary payload +
typed metadata, derived deterministically from ``documents``) driven through
real Arrow-batched mapInPandas operators (operators/multimodal.py).

The fixture ships no binary media, so the payload is the UTF-8 encoding of
``text`` — an opaque byte string as far as the plumbing is concerned. Because
the fixture text is pure ASCII, byte arithmetic equals character-code
arithmetic, which lets a DuckDB oracle value-hash-check even the
pandas-UDF outputs: the Python path is verified against SQL, not just
rows-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import load_table, spread
from ..operators.multimodal import decode_features, frame_sample
from ..registry import register

FORMATS = ("png", "jpeg", "wav")


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> media(doc_id, payload binary, format, width, height)."""
    # spread: downstream mapInPandas otherwise runs on one Python worker
    docs = spread(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.element_at(
            F.array(*[F.lit(f) for f in FORMATS]), (F.col("doc_id") % 3).cast("int") + 1
        ).alias("format"),
        ((F.col("n_chars") % 64) * 16 + 16).alias("width"),
        ((F.col("doc_id") % 48) * 16 + 16).alias("height"),
    )


_MEDIA_CTE = f"""
media AS (
  SELECT doc_id, encode(text) AS payload,
         (['{FORMATS[0]}', '{FORMATS[1]}', '{FORMATS[2]}'])[CAST(doc_id % 3 AS INT) + 1] AS format,
         (n_chars % 64) * 16 + 16 AS width,
         (doc_id % 48) * 16 + 16 AS height,
         text
  FROM documents
)
"""


@register(
    "multimodal_metadata",
    oracle=f"""
WITH {_MEDIA_CTE}
SELECT doc_id, CAST(octet_length(payload) AS BIGINT) AS byte_len, format, width, height
FROM media
""",
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads — the schema contract every
    downstream media operator relies on. Pure JVM expressions; the payload
    bytes are never shipped to Python here."""
    return media_table(spark, sf_dir).select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("byte_len"),
        "format",
        "width",
        "height",
    )


@register(
    "multimodal_decode_features",
    oracle=f"""
WITH {_MEDIA_CTE}
SELECT doc_id,
       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
       CAST(ascii(substr(text, length(text), 1)) AS BIGINT) AS last_byte,
       list_reduce(list_transform(string_split_regex(text, ''), c -> CAST(ascii(c) AS BIGINT)),
                   (x, y) -> x + y) AS byte_sum,
       list_reduce(list_transform(string_split_regex(text, ''), c -> CAST(ascii(c) AS BIGINT)),
                   (x, y) -> x + y) % 997 AS checksum,
       width // 2 AS resized_w,
       height // 2 AS resized_h
FROM media
""",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract + resize through Arrow-batched mapInPandas
    (operators/multimodal.py). The 'decode' is the deterministic byte-stat
    fake (real codecs are stubbed — see decode_image_real); the oracle
    recomputes the same stats from ASCII char codes, so the whole
    JVM->Arrow->pandas->Arrow->JVM round trip is value-hash verified."""
    return decode_features(media_table(spark, sf_dir))


@register(
    "multimodal_frame_sample",
    oracle=f"""
WITH {_MEDIA_CTE},
m AS (
  SELECT doc_id, text, CAST(octet_length(payload) AS BIGINT) AS n_bytes,
         (CAST(octet_length(payload) AS BIGINT) % 4) + 1 AS n_frames
  FROM media
)
SELECT m.doc_id,
       CAST(f.frame_idx AS BIGINT) AS frame_idx,
       CAST(f.frame_idx * (m.n_bytes // m.n_frames) AS BIGINT) AS frame_offset,
       CAST(ascii(substr(m.text, CAST(f.frame_idx * (m.n_bytes // m.n_frames) AS INT) + 1, 1)) AS BIGINT) AS sample_byte
FROM m, (SELECT unnest(range(4)) AS frame_idx) f
WHERE f.frame_idx < m.n_frames
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: each payload expands to (n_bytes % 4) + 1 frames at
    even offsets, sampling one byte per frame — the row-expanding mapInPandas
    shape (1 input row -> N output rows) that real video frame extraction
    uses."""
    return frame_sample(media_table(spark, sf_dir))
