"""Deterministic sampling & dataset splitting for training-data
pipelines.

``randomSplit``/``sample`` are seed-dependent AND partitioning-
dependent — re-running on a repartitioned table yields a different
split, which silently leaks eval data into training sets. Hash-based
splitting is the production answer: membership is a pure function of
the row's id, stable across runs, partitionings, and engines.

The hash is md5-derived (not xxhash64) so external systems —
including the DuckDB oracle — can reproduce the exact split.

Scale: a narrow projection + filter; no shuffle, fully pushed into
the scan pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(id_col: str | Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the id's md5 (portable:
    DuckDB twin is ('0x' || substr(md5(id), 1, 8))::BIGINT % n)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(buckets))


def split_column(
    id_col: str | Column, fractions: dict[str, float], buckets: int = 100
) -> Column:
    """Label each row with its split ('train'/'val'/'test'...) by
    thresholding the hash bucket. Fractions must sum to ≤ 1; the
    remainder (if any) gets the label 'rest'."""
    b = hash_bucket(id_col, buckets)
    expr: Column | None = None
    lo = 0.0
    for name, frac in fractions.items():
        hi = lo + frac * buckets
        cond = (b >= F.lit(int(round(lo)))) & (b < F.lit(int(round(hi))))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    assert expr is not None
    return expr.otherwise(F.lit("rest"))


def hash_split(
    df: DataFrame, id_col: str, fractions: dict[str, float], buckets: int = 100
) -> DataFrame:
    """Adds a ``split`` column. Deterministic: the same id lands in
    the same split forever, regardless of partitioning or engine."""
    return df.withColumn("split", split_column(id_col, fractions, buckets))


def mix_sources(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    default_weight: float = 0.0,
    buckets: int = 100,
) -> DataFrame:
    """Deterministic dataset mixing: subsample each source to its
    target weight (fraction kept) by thresholding the id's hash
    bucket — the curriculum/mixture step of a training-data pipeline
    (e.g. upweight curated sources, downsample web crawl).

    Per-row decision, no shuffle, reproducible across runs and
    engines; a document keeps or drops identically no matter how the
    corpus is partitioned or which sources are re-weighted later
    (hash depends only on the id)."""
    b = hash_bucket(id_col, buckets)
    thresh = None
    for src, w in weights.items():
        t = F.when(F.col(source_col) == src, F.lit(int(round(w * buckets))))
        thresh = t if thresh is None else thresh.when(
            F.col(source_col) == src, F.lit(int(round(w * buckets)))
        )
    thresh = (
        thresh.otherwise(F.lit(int(round(default_weight * buckets))))
        if thresh is not None
        else F.lit(int(round(default_weight * buckets)))
    )
    return df.where(b < thresh)
