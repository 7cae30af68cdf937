"""Z-order (Morton-curve) lake layout — multi-dimensional data
skipping for the scan side.

Bucketing (operators/bucketing.py) co-locates ONE join key;
hive-partitioning prunes ONE leading column. When scans filter on
SEVERAL columns (user AND time, key AND value band), the production
answer is to sort the table along a space-filling curve of those
columns before writing: rows close in the multi-dimensional key
space land in the same files, so every file's parquet min/max
footer stats form a tight bounding box and a predicate on ANY of
the curve's columns skips most files. This is Delta Lake's
``OPTIMIZE ZORDER BY`` / Iceberg's z-ordered rewrite, built here
from plain column expressions:

1. each column is quantized to a ``bits``-wide integer rank
   (min-max linear via ``width_bucket``; swap in approx-quantile
   cutpoints for heavily skewed columns — the hook is
   ``quantize_cols``),
2. the per-column ranks are bit-interleaved into one Morton key
   (a constant-folded chain of shift/or expressions — whole-stage
   codegen, no UDF),
3. the frame is range-partitioned and sorted by that key and
   written; ``target_files`` controls file granularity.

The layout is read-side transparent: consumers scan the same
parquet schema, only faster. ``tests/test_zorder.py`` proves the
skipping effect mechanically (matching rows concentrate into a few
files on BOTH dimensions, against a shuffled control layout).

At 100 TB: the one-time z-write costs a range shuffle (same class
as any global sort); every subsequent selective scan reads
O(selectivity) files instead of O(all). Re-cluster periodically as
data drifts — the write is idempotent per snapshot.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def quantize_cols(
    df: DataFrame, cols: list[str], bits: int = 8
) -> list[Column]:
    """Per-column integer ranks in [0, 2**bits): min-max linear
    scaling computed from one tiny aggregate (collected — 2·|cols|
    scalars). Monotone by construction, which is all the curve
    needs.

    Non-finite rows get deterministic ranks rather than errors:
    NaN rows take the TOP rank (they sort above every real value,
    matching Spark's own NaN ordering) and NULL rows take rank 0
    (they sort below every value in ascending NULLS FIRST order) —
    both choices only affect which files those rows co-cluster
    into, never read-side correctness."""
    n = 2**bits
    # NaN-safe bounds: Spark's max() orders NaN above every real
    # value, so an unguarded max over a double column with NaNs
    # would make span NaN and every rank NULL — quantize over the
    # finite values only.
    floating = {
        f.name for f in df.schema.fields if f.dataType.typeName() in ("double", "float")
    }
    def _finite(c: str):
        col = F.col(c)
        return F.when(~F.isnan(col), col) if c in floating else col
    stats = df.agg(
        *[F.min(_finite(c)).alias(f"mn_{c}") for c in cols],
        *[F.max(_finite(c)).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    out = []
    for c in cols:
        if stats[f"mn_{c}"] is None:
            raise ValueError(
                f"z-order column {c!r} has no non-null finite values; "
                "drop it from cols or filter the frame first"
            )
        mn = float(stats[f"mn_{c}"])
        mx = float(stats[f"mx_{c}"])
        span = (mx - mn) or 1.0
        scaled = (
            (F.col(c).cast("double") - F.lit(mn)) / F.lit(span)
        ) * F.lit(n - 1)
        if c in floating:
            # NaN propagates through the arithmetic and ANSI mode
            # throws CAST_OVERFLOW on round(NaN).cast(bigint) —
            # clamp NaN rows to the top rank before the cast.
            scaled = F.nanvl(scaled, F.lit(float(n - 1)))
        rank = F.least(
            F.greatest(F.round(scaled).cast("bigint"), F.lit(0)),
            F.lit(n - 1),
        )
        # NULL inputs stay NULL through the arithmetic; pin them to
        # rank 0 explicitly (greatest() would drop the NULL anyway,
        # but an implicit landing spot is a trap for readers).
        out.append(F.coalesce(rank, F.lit(0)))
    return out


def morton_key(ranks: list[Column], bits: int = 8) -> Column:
    """Bit-interleave ``len(ranks)`` integer ranks into one Morton
    key: output bit (i·d + j) takes bit i of rank j. Builds a
    constant chain of shift/and/or expressions (d·bits terms) that
    Catalyst constant-folds into straight-line codegen."""
    d = len(ranks)
    if d * bits > 63:
        raise ValueError(
            f"{d} cols x {bits} bits = {d * bits} key bits > 63: the "
            "interleaved key would overflow into the bigint sign bit "
            "and break curve ordering — lower bits or drop columns"
        )
    terms = []
    for j, r in enumerate(ranks):
        for i in range(bits):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * d + j))
    return reduce(lambda a, b: a.bitwiseOR(b), terms).alias("__zkey")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 8,
    target_files: int = 16,
) -> None:
    """Write ``df`` to ``path`` clustered along the Z-curve of
    ``cols``: range-partition on the Morton key (balanced files via
    the range sampler), sort within partitions so parquet row-group
    stats tighten too, then drop the key — the layout is carried by
    row order alone."""
    z = morton_key(quantize_cols(df, cols, bits), bits)
    (
        df.withColumn("__zkey", z)
        .repartitionByRange(target_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
