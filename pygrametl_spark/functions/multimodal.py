"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Net-new surface for training-data pipelines. Images/audio/video are
carried as ``binary`` columns with metadata columns alongside; the
decode / feature-extract steps run as Arrow-batched ``mapInPandas``
over partitions — the only sane shape for CPU-heavy media work at
100 TB (one Python worker per partition, whole Arrow batches, no
per-row serde).

The actual media decoding is STUBBED in this container (no PIL/ffmpeg):
``decode_image_meta`` raises ``NotImplementedError`` when asked for a
real decode and otherwise produces a *deterministic fake* derived from
the payload's md5 — the Spark-side plumbing (schema, batching, UDF
signature, partitioning) is real and tested, and the fake is
reproducible in SQL for the oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["to_binary_payload", "decode_image_meta", "FAKE_FORMATS"]

FAKE_FORMATS = ["png", "jpeg", "webp"]


def to_binary_payload(df: DataFrame, src_col: str, out: str = "payload") -> DataFrame:
    """Wrap a column as an opaque binary payload column (UTF-8 encode for
    string sources; real pipelines read binaryFile / parquet BLOBs)."""
    return df.withColumn(out, F.encode(F.col(src_col), "UTF-8"))


def decode_image_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    *,
    real_decode: bool = False,
) -> DataFrame:
    """Per-payload "decode" producing (id, byte_len, width, height, format).

    Runs as ``mapInPandas``: each Arrow batch is processed vectorized in
    one Python call. With ``real_decode=True`` this is where PIL/ffmpeg
    would run — unavailable here, so it raises ``NotImplementedError``.
    The deterministic fake derives width/height/format from the md5 of
    the payload bytes (exactly reproducible in SQL).
    """
    if real_decode:
        raise NotImplementedError(
            "media libraries are not available in this container; "
            "the deterministic fake decode exercises the full Spark plumbing"
        )

    schema = f"{id_col} long, byte_len long, width long, height long, format string"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf[payload_col]
            hashes = [hashlib.md5(bytes(p)).hexdigest() for p in payloads]
            h32 = [int(h[:8], 16) for h in hashes]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int64"),
                    "width": pd.Series([16 + (h % 256) for h in h32], dtype="int64"),
                    "height": pd.Series([16 + ((h // 256) % 256) for h in h32], dtype="int64"),
                    "format": [FAKE_FORMATS[h % 3] for h in h32],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, schema=schema)
