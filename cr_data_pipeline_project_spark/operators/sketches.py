"""Count-min sketch over DataFrame keys — the sub-linear frequency
summary for heavy-hitter queries when the key space is too large to
aggregate exactly (Cormode & Muthukrishnan, J. Algorithms 2005).

Where q116's exact windowed heavy hitters shuffle one row per
(window, key), a 100 TB event stream with 10⁹⁺ distinct keys wants a
FIXED-size summary: depth×width counters (e.g. 5×16384 ≈ 80 K cells)
that (a) bound the over-estimate by ε·N with probability 1−δ, and
(b) MERGE by cell-wise addition — partials from disjoint row slices
(partitions, micro-batches, days) sum to the sketch of the union,
the same additivity contract the drift monitors ride.

Engine mapping: hashing is ``xxhash64(key, seed=d)`` — JVM-side,
whole-stage-codegen — and a row contributes to ``depth`` cells via an
in-row posexplode of the hash array; the only shuffle is the
partial-combining sum over (d, b), whose key cardinality is the CELL
count, not the key count. Estimation joins candidate keys back by
recomputing their cells (broadcast — candidates are bounded by
contract) and taking min over d.

Guarantees (standard CMS): est ≥ true always (one-sided);
est ≤ true + ε·N with prob ≥ 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _cell(key: Column, d: int, width: int) -> Column:
    """Row d's counter index for ``key``: pmod(xxhash64(key, d),
    width). Seeding by the row index makes the depth hash functions
    pairwise-independent enough for the CMS bound in practice (the
    standard xxhash/murmur-seeded construction)."""
    return F.pmod(F.xxhash64(key, F.lit(d)), F.lit(width))


def cms_partials(
    df: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 16384,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch as a (d, b, c) cell table: counter value c
    at depth-row d, bucket b. ``weight_col`` aggregates a measure
    instead of row counts (e.g. bytes per key).

    Additive by construction — union two partial outputs and
    re-aggregate on (d, b) to merge sketches (what a streaming
    foreachBatch or a per-day rollup does); empty cells are simply
    absent rows, so the table is also SPARSE (≤ min(cells, rows)).

    Scale: one in-row posexplode of ``depth`` cell ids per input
    row, then ONE partial-combining sum keyed by (d, b) — map-side
    combine collapses each partition to ≤ depth·width rows before
    the exchange, so shuffle volume is bounded by the sketch size
    times the partition count, independent of input rows."""
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    cells = F.array(
        *[_cell(F.col(key_col), d, width) for d in range(depth)]
    )
    return (
        df.select(F.posexplode(cells).alias("d", "b"), w.alias("__w"))
        .groupBy("d", "b")
        .agg(F.sum("__w").alias("c"))
    )


def cms_estimate(
    partials: DataFrame,
    candidates: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 16384,
) -> DataFrame:
    """Point-query the sketch for each candidate key: recompute the
    candidate's ``depth`` cells in-row, join the cell table, and
    take min(c) over the rows that hit — the CMS estimator
    (absent cells count 0, so a key with any missing cell gets
    est = 0, which only happens for keys the sketch never saw).

    ``depth``/``width`` MUST match the build call — they are the
    sketch's identity (persist them next to the cell table).

    Returns (key_col, est). Scale: candidates are bounded by
    contract (a top-k working set, a watchlist); they explode to
    depth rows each and join the cell table on (d, b) — broadcast
    the exploded candidates when small, a cell-keyed shuffle
    otherwise; either way cost is O(candidates·depth + cells)."""
    cand = candidates.select(key_col).distinct()
    cells = F.array(
        *[_cell(F.col(key_col), d, width) for d in range(depth)]
    )
    probe = cand.select(
        F.col(key_col), F.posexplode(cells).alias("d", "b")
    )
    return (
        probe.join(partials, ["d", "b"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est")
        )
    )


def cms_topk(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    depth: int = 5,
    width: int = 16384,
    weight_col: str | None = None,
) -> DataFrame:
    """Heavy hitters by sketch estimate: build the sketch, query it
    for every distinct key, return the top-``k`` by (est desc, key)
    — the batch serve path whose STREAMING form keeps the cell
    table as mutable state and a candidate heap beside it.

    At true 100 TB cardinality the distinct-key candidate set is
    itself the expensive part; production pairs the sketch with a
    per-partition local-top-k prefilter so only ~k·partitions
    candidates are ever estimated. Here candidates = distinct keys
    (the fixture is small); the prefilter belongs to the caller
    because it changes recall semantics.

    est ≥ true count for every key (one-sided CMS error), so the
    true top-k are always CANDIDATES within the estimated ranking;
    ties and near-ties can reorder vs exact counts — rows-only by
    design."""
    partials = cms_partials(df, key_col, depth, width, weight_col)
    ests = cms_estimate(
        partials, df.select(key_col), key_col, depth, width
    )
    return ests.orderBy(F.desc("est"), key_col).limit(k)
