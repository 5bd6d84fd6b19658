"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Net-new surface for training-data pipelines. Images/audio/video are
carried as ``binary`` columns with metadata columns alongside; the
decode / feature-extract steps run as Arrow-batched ``mapInPandas``
over partitions — the only sane shape for CPU-heavy media work at
100 TB (one Python worker per partition, whole Arrow batches, no
per-row serde).

Image DIMENSION decode is REAL: ``real_decode=True`` parses PNG IHDR /
JPEG SOF / GIF logical-screen / BMP headers from the payload bytes in
pure Python (no PIL needed — the same header math `file`/identify use),
falling back to the *deterministic fake* (derived from the payload md5,
reproducible in SQL for the oracle) for payloads that are not images.
Pixel-level work (full decode, resample, frame extraction) would need
PIL/ffmpeg, absent from this container, so those stay Arrow-batched
deterministic fakes — the Spark-side plumbing (schema, batching, UDF
signature, partitioning) is real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "to_binary_payload", "decode_image_meta", "resize_image",
    "sample_frames", "extract_features", "write_wds_shards", "FAKE_FORMATS",
    "parse_image_header", "synth_image_payloads",
]

FAKE_FORMATS = ["png", "jpeg", "webp"]


def parse_image_header(payload: bytes) -> "tuple[int, int, str] | None":
    """Pure-Python image header parse → ``(width, height, format)`` or
    ``None`` when the payload is not a recognized image. Reads only the
    header bytes (PNG IHDR, JPEG SOF0-15 marker scan, GIF logical
    screen descriptor, BMP info header) — no media libraries."""
    b = bytes(payload)
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        return (
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
            "png",
        )
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return (
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
            "gif",
        )
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:  # standalone
                i += 2
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(b):
                    return None
                height = int.from_bytes(b[i + 5:i + 7], "big")
                width = int.from_bytes(b[i + 7:i + 9], "big")
                return (width, height, "jpeg")
            i += 2 + int.from_bytes(b[i + 2:i + 4], "big")
        return None
    if len(b) >= 26 and b[:2] == b"BM":
        width = int.from_bytes(b[18:22], "little", signed=True)
        height = int.from_bytes(b[22:26], "little", signed=True)
        return (width, abs(height), "bmp")  # negative height = top-down rows
    return None


def _synth_payload(kind: str, width: int, height: int) -> bytes:
    """A minimal VALID image header for tests/oracles: fixed byte sizes
    (png=33, jpeg=16, gif=13) so an oracle can state byte_len as a
    literal per format."""
    if kind == "png":
        ihdr = (
            width.to_bytes(4, "big") + height.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0])
        )
        return (
            b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR" + ihdr
            + b"\x00\x00\x00\x00"
        )
    if kind == "jpeg":
        sof = (
            b"\xff\xc0" + (11).to_bytes(2, "big") + bytes([8])
            + height.to_bytes(2, "big") + width.to_bytes(2, "big")
            + bytes([1, 0x11, 0])
        )
        return b"\xff\xd8" + sof + b"\xff\xd9"
    if kind == "gif":
        return (
            b"GIF89a" + width.to_bytes(2, "little")
            + height.to_bytes(2, "little") + b"\x00\x00\x00"
        )
    raise ValueError(f"unknown kind {kind!r}")


def synth_image_payloads(
    df: DataFrame, id_col: str = "doc_id", out: str = "payload"
) -> DataFrame:
    """Deterministic VALID image payloads keyed by id — the test-data
    synthesizer for the real-decode path: format cycles png/jpeg/gif by
    ``id % 3``, ``width = 16 + id % 240``, ``height = 16 + (id*7) % 240``
    (an oracle states the expected dims with the same integer math,
    which the header PARSER must then recover from the bytes)."""
    schema = f"{id_col} long, {out} binary"
    kinds = ["png", "jpeg", "gif"]

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    id_col: ids,
                    out: [
                        _synth_payload(
                            kinds[i % 3], 16 + i % 240, 16 + (i * 7) % 240
                        )
                        for i in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(synth, schema=schema)


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

    Runs as ``mapInPandas``: each Arrow batch is processed in one Python
    call. With ``real_decode=True`` the width/height/format come from
    the ACTUAL payload bytes via :func:`parse_image_header` (PNG / JPEG
    / GIF / BMP, pure Python — no PIL), with the deterministic fake as
    the fallback for non-image payloads. ``real_decode=False`` is
    fake-only: width/height/format derive from the md5 of the payload
    bytes (exactly reproducible in SQL for the oracle).
    """
    schema = f"{id_col} long, byte_len long, width long, height long, format string"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf[payload_col]
            widths, heights, formats = [], [], []
            for p in payloads:
                b = bytes(p)
                parsed = parse_image_header(b) if real_decode else None
                if parsed is None:
                    h = int(hashlib.md5(b).hexdigest()[:8], 16)
                    parsed = (16 + h % 256, 16 + (h // 256) % 256,
                              FAKE_FORMATS[h % 3])
                widths.append(parsed[0])
                heights.append(parsed[1])
                formats.append(parsed[2])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int64"),
                    "width": pd.Series(widths, dtype="int64"),
                    "height": pd.Series(heights, dtype="int64"),
                    "format": formats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, schema=schema)


def _md5_h32(payloads) -> tuple[list[str], list[int]]:
    import hashlib

    hexes = [hashlib.md5(bytes(p)).hexdigest() for p in payloads]
    return hexes, [int(h[:8], 16) for h in hexes]


def resize_image(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    *,
    target_w: int = 64,
    real_decode: bool = False,
) -> DataFrame:
    """Aspect-preserving resize to ``target_w`` wide.

    Same plumbing as :func:`decode_image_meta` (Arrow-batched
    ``mapInPandas``, one Python call per batch). With
    ``real_decode=True`` the SOURCE dims come from
    :func:`parse_image_header` (fake-fallback for non-images); the
    actual pixel resample would need PIL, so the "resized payload" is
    summarized as an md5 checksum either way (a real pipeline would
    emit the binary itself). Scaling is integer arithmetic
    (``out_h = src_h*target_w // src_w``) so the oracle replays it.
    """
    schema = f"{id_col} long, out_w long, out_h long, resized_md5 string"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            hexes, h32 = _md5_h32(pdf[payload_col])
            src_w = [16 + (h % 256) for h in h32]
            src_h = [16 + ((h // 256) % 256) for h in h32]
            if real_decode:
                for j, p in enumerate(pdf[payload_col]):
                    parsed = parse_image_header(bytes(p))
                    if parsed is not None:
                        src_w[j], src_h[j] = parsed[0], parsed[1]
            out_h = [h * target_w // w for w, h in zip(src_w, src_h)]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "out_w": pd.Series([target_w] * len(h32), dtype="int64"),
                    "out_h": pd.Series(out_h, dtype="int64"),
                    "resized_md5": [
                        hashlib.md5(f"{hx}x{target_w}x{oh}".encode()).hexdigest()
                        for hx, oh in zip(hexes, out_h)
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, schema=schema)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    *,
    n_frames: int = 4,
    real_decode: bool = False,
) -> DataFrame:
    """Evenly-spaced frame sampling from a "video" payload — the 1→N row
    shape: each input row yields ``n_frames`` output rows, produced
    inside the same Arrow batch (``mapInPandas`` may change cardinality,
    which per-row UDFs cannot).

    Fake: duration_ms = 1000 * (1 + md5_32 % 30); frame i's timestamp is
    ``i * duration_ms // n_frames`` and its checksum is
    ``md5(payload_md5 || '-' || i)`` — all replayable in SQL.
    """
    if real_decode:
        raise NotImplementedError(
            "media libraries are not available in this container; "
            "the deterministic fake exercises the full Spark plumbing"
        )

    schema = f"{id_col} long, frame_idx long, ts_ms long, frame_md5 string"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            hexes, h32 = _md5_h32(pdf[payload_col])
            ids, fidx, tsms, fmd5 = [], [], [], []
            for did, hx, h in zip(pdf[id_col].astype("int64"), hexes, h32):
                duration_ms = 1000 * (1 + h % 30)
                for i in range(n_frames):
                    ids.append(did)
                    fidx.append(i)
                    tsms.append(i * duration_ms // n_frames)
                    fmd5.append(hashlib.md5(f"{hx}-{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int64"),
                    "ts_ms": pd.Series(tsms, dtype="int64"),
                    "frame_md5": fmd5,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(sample, schema=schema)


# Affine constants for the fake feature extractor (arbitrary, fixed so
# the oracle can inline them). Each a < 2^31 so a * md5_32 stays under
# 2^63 in both engines' 64-bit arithmetic.
_FEAT_A = [754435761, 2046822519, 1366489917, 668265263, 374761393, 1241592653, 818281829, 1618033989]
_FEAT_P = 4294967311


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    *,
    dim: int = 8,
    real_decode: bool = False,
) -> DataFrame:
    """Payload → fixed-dim feature vector (``array<double>``) — the
    embedding-extraction shape: binary in, vector out, Arrow both ways.

    Fake feature j is ``round(((md5_32 * A_j) % P) / P, 6)`` ∈ [0,1) —
    a real extractor would run a model forward pass here per Arrow
    batch. Output is a proper array column so downstream similarity
    operators (:mod:`~pygrametl_spark.functions.similarity`) compose.
    """
    if real_decode:
        raise NotImplementedError(
            "media libraries are not available in this container; "
            "the deterministic fake exercises the full Spark plumbing"
        )
    if dim > len(_FEAT_A):
        raise ValueError(f"dim must be <= {len(_FEAT_A)}")

    schema = f"{id_col} long, features array<double>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            _, h32 = _md5_h32(pdf[payload_col])
            feats = [
                [round(((h * _FEAT_A[j]) % _FEAT_P) / _FEAT_P, 6) for j in range(dim)]
                for h in h32
            ]
            yield pd.DataFrame(
                {id_col: pdf[id_col].astype("int64"), "features": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(extract, schema=schema)


def write_wds_shards(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    ext: str = "bin",
    meta_cols: tuple = (),
    n_shards: int = 4,
) -> DataFrame:
    """Export samples as WebDataset-style tar shards — the layout
    multimodal training loaders stream (one ``{key}.{ext}`` member per
    payload, one ``{key}.json`` sidecar per sample's metadata).

    Sharding is deterministic (hash of the id modulo ``n_shards``), each
    shard is one tar written by ONE task via ``mapPartitions`` — the
    legitimate per-partition imperative-IO exception, the same shape as
    the PEP249 sink — and members are written in sorted id order, so a
    re-run produces byte-identical shards. ``path`` must be storage every
    executor can reach (local here; a mounted DFS/object store on a
    cluster). Returns the manifest (shard, n_samples, payload_bytes) —
    write it next to the shards so loaders can size epochs without
    listing tars.

    Member keys: non-negative integer ids are zero-padded to 12 digits
    (so lexicographic member order == numeric id order, the WebDataset
    convention); any other id (string doc ids, negative ints) is used as
    ``str(id)`` verbatim — sorted-id write order is then lexicographic.
    """
    import io
    import json
    import os
    import tarfile

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    os.makedirs(path, exist_ok=True)
    cols = [id_col, payload_col, *meta_cols]
    sharded = (
        df.select(*cols)
        .withColumn("_shard", F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_shards)))
        .repartition(n_shards, "_shard")
    )

    out_schema = StructType([
        StructField("shard", StringType()),
        StructField("n_samples", LongType()),
        StructField("payload_bytes", LongType()),
    ])

    def write_partition(rows):
        buckets: dict = {}
        for r in rows:
            buckets.setdefault(r["_shard"], []).append(r)
        def member_key(v):
            if isinstance(v, int) and not isinstance(v, bool) and v >= 0:
                return f"{v:012d}"
            return str(v)

        for shard_no, items in buckets.items():
            items.sort(key=lambda r: member_key(r[id_col]))
            name = f"shard-{int(shard_no):05d}.tar"
            total = 0
            with tarfile.open(os.path.join(path, name), "w") as tar:
                for r in items:
                    key = member_key(r[id_col])
                    payload = bytes(r[payload_col])
                    total += len(payload)
                    ti = tarfile.TarInfo(f"{key}.{ext}")
                    ti.size = len(payload)
                    ti.mtime = 0  # byte-identical re-runs
                    tar.addfile(ti, io.BytesIO(payload))
                    meta = json.dumps(
                        {c: r[c] for c in meta_cols}, sort_keys=True
                    ).encode()
                    mi = tarfile.TarInfo(f"{key}.json")
                    mi.size = len(meta)
                    mi.mtime = 0
                    tar.addfile(mi, io.BytesIO(meta))
            yield {"shard": name, "n_samples": len(items), "payload_bytes": total}

    manifest = sharded.rdd.mapPartitions(write_partition).toDF(out_schema)
    return manifest.orderBy("shard")
