"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The decode kernels themselves are STUBBED (no image/audio libraries
in this environment — replace ``_fake_decode_*`` with PIL/libav
calls); everything Spark-side is real and tested: schemas, batch
iteration, partition sizing, UDF signatures.

Scale notes (100 TB of media)
-----------------------------
- Binary payloads dominate partition size: size partitions by bytes,
  not rows (``spark.sql.files.maxPartitionBytes``), and NEVER shuffle
  payloads — derive features first, shuffle the features.
- ``mapInPandas`` streams Arrow batches; peak memory per task =
  batch_size × avg_payload. Cap with
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` when payloads are
  large.
- Keep metadata (width/height/duration/codec) in typed columns next
  to the blob so pruning/filtering never touches payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, payload_md5 string, "
    "feat array<float>"
)


def attach_payload_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata: byte length + content hash — computed
    without Python, used for exact dedup of media blobs."""
    return df.select(
        "*",
        F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("payload_md5"),
    )


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder (e.g. PIL →
    CLIP). Derives ``dim`` floats from the payload bytes so tests are
    stable. Replace with a real kernel in production.
    """
    if payload is None:
        raise NotImplementedError("real decoder goes here")
    out = []
    h = 2166136261
    for i, b in enumerate(payload[: dim * 16] or b"\x00"):
        h = (h ^ b) * 16777619 % (1 << 32)
        if i % 16 == 15:
            out.append((h % 10_000) / 10_000.0)
    while len(out) < dim:
        h = h * 16777619 % (1 << 32)
        out.append((h % 10_000) / 10_000.0)
    return out[:dim]


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over media blobs.
    Input schema: MEDIA_SCHEMA; output: FEATURE_SCHEMA."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [
                _fake_decode_features(p, dim) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "payload_md5": [
                        __import__("hashlib").md5(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feat": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 32
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts)
    to decode — the shuffle-free explode that parallelizes per-frame
    work across the cluster. Decoding each frame is the stubbed
    kernel; the plan is real."""
    n_frames = F.least(
        F.floor(F.col("duration_ms") / every_ms).cast("int") + 1, F.lit(max_frames)
    )
    return df.select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
            )
        ).alias("frame_ts_ms"),
    )
