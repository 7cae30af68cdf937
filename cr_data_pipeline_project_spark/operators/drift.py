"""Distribution-drift statistics over value-count tables — ONE
kernel shared by the batch report (plans/reference_queries.py:
q177_ks_source_drift) and the streaming drift monitor
(streaming/incremental.py: value-count partials + KS snapshot), the
daily_count_anomaly / importance.py single-kernel discipline.

Everything operates on aggregated (value, count) tables, never raw
rows: the corpus collapses once into per-value counts (additive, so
streamed partials sum to the batch table), and the statistic is
BIGINT-exact — sup|F1-F2| compares integer cross-products
f1*n2 - f2*n1, with ONE IEEE division at the very end. That is what
makes the streamed monitor's output bit-identical to the batch
recompute regardless of micro-batch slicing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ks_from_counts(
    counts_a: DataFrame, counts_b: DataFrame, val_col: str = "v"
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic from two
    per-value count tables (val_col, c). Returns ONE row
    (n1, n2, ks_num, ks_stat): the supremum of |F1 - F2| over every
    distinct observed value, integer-exact via |f1*n2 - f2*n1|
    BIGINT cross-products; ks_stat is that max over n1*n2, rounded
    once.

    Scale: the full-outer merge and cumulative window run over the
    UNION of distinct values — bounded by value cardinality, not
    sample size; sample totals ride the same window pass (no second
    scan). The window is global but its input is the bounded value
    table (the q177 contract); swap in a sketch-CDF twin if value
    cardinality itself explodes."""
    a = counts_a.select(F.col(val_col).alias("v"), F.col("c").alias("ca"))
    b = counts_b.select(F.col(val_col).alias("v"), F.col("c").alias("cb"))
    pts = (
        a.join(b, "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).cast("bigint").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("bigint").alias("cb"),
        )
    )
    return ks_from_merged(pts)


def ks_from_merged(pts: DataFrame) -> DataFrame:
    """The KS finish over an already-merged (v, ca, cb) table — the
    entry a one-scan producer uses directly (q177 derives ca/cb as
    conditional counts in a single corpus pass; routing it through
    the two-table entry would reintroduce the double scan a review
    removed)."""
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = pts.select(
        F.sum("ca").over(wcum).alias("f1"),
        F.sum("cb").over(wcum).alias("f2"),
        F.sum("ca").over(wall).cast("bigint").alias("n1"),
        F.sum("cb").over(wall).cast("bigint").alias("n2"),
    )
    num = F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
    return cum.groupBy("n1", "n2").agg(
        F.max(num).cast("bigint").alias("ks_num"),
        F.round(
            F.max(num).cast("double")
            / (F.col("n1") * F.col("n2")).cast("double"),
            6,
        ).alias("ks_stat"),
    )


def value_counts(
    df: DataFrame, val_col: str, out_val: str = "v"
) -> DataFrame:
    """(v, c): the per-value count table every drift statistic
    consumes. Additive across disjoint row slices — the property the
    streaming partials rely on."""
    return df.groupBy(F.col(val_col).alias(out_val)).agg(
        F.count(F.lit(1)).alias("c")
    )


def psi_from_counts(
    ref_counts: DataFrame,
    live_counts: DataFrame,
    bins: int = 10,
    val_col: str = "v",
) -> DataFrame:
    """Population Stability Index over reference-quantile bins — the
    industry-standard drift score (PSI < 0.1 stable / 0.1-0.25
    watch / > 0.25 shifted), from two per-value count tables.

    Binning: cut points are the EXACT reference quantiles — cut_i =
    min v with cumulative reference count >= ceil(i*n1/bins) — so
    both engines derive identical bins from integer rank arithmetic
    (no percentile interpolation). Shares (p_hat, q_hat) add-1
    smoothing with the DSIR lambda kernel so empty bins stay
    finite. Determinism: each bin's term is a fixed chain of IEEE
    ops on exact integers (two one-division proportions, one pinned
    ratio ln), and the running psi accumulates in BIN ORDER via a
    cumulative window — an unordered float SUM would be
    shuffle-order dependent. Output: one row per bin (ref_n,
    live_n, term, psi_cum); the last bin's psi_cum IS the PSI.

    Scale: both inputs are value-count tables (corpus already
    collapsed); the cut table is ``bins - 1`` rows and broadcasts;
    the windows run over ``bins`` rows."""
    ref = ref_counts.select(
        F.col(val_col).alias("v"), F.col("c").cast("bigint").alias("c")
    )
    live = live_counts.select(
        F.col(val_col).alias("v"), F.col("c").cast("bigint").alias("c")
    )
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    refc = ref.select(
        "v", "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n1"),
    )
    # cut_i = min v with cum >= ceil(i*n1/bins); ceil via (x+b-1) div b
    cuts = (
        refc.crossJoin(
            F.broadcast(
                refc.sparkSession.range(1, bins).select(
                    F.col("id").cast("bigint").alias("i")
                )
            )
        )
        .where(F.col("cum") >= F.expr(f"(i * n1 + {bins - 1}) div {bins}"))
        .groupBy("i")
        .agg(F.min("v").alias("cut"))
    )

    def binned(counts: DataFrame) -> DataFrame:
        return (
            counts.crossJoin(F.broadcast(cuts))
            .groupBy("v")
            .agg(
                F.first("c").alias("c"),
                (
                    F.lit(1)
                    + F.sum(
                        F.when(F.col("v") > F.col("cut"), 1).otherwise(0)
                    )
                )
                .cast("int")
                .alias("bin"),
            )
            .groupBy("bin")
            .agg(F.sum("c").alias("n"))
        )

    rb = binned(ref).select(F.col("bin"), F.col("n").alias("ref_n"))
    lb = binned(live).select(F.col("bin"), F.col("n").alias("live_n"))
    allbins = (
        refc.sparkSession.range(1, bins + 1)
        .select(F.col("id").cast("int").alias("bin"))
        .join(rb, "bin", "left")
        .join(lb, "bin", "left")
        .select(
            "bin",
            F.coalesce("ref_n", F.lit(0)).cast("bigint").alias("ref_n"),
            F.coalesce("live_n", F.lit(0)).cast("bigint").alias("live_n"),
        )
    )
    tot = allbins.select(
        "bin", "ref_n", "live_n",
        F.sum("ref_n").over(wall).alias("n1"),
        F.sum("live_n").over(wall).alias("n2"),
    )
    p = (F.col("ref_n") + 1).cast("double") / (
        F.col("n1") + F.lit(bins)
    ).cast("double")
    q = (F.col("live_n") + 1).cast("double") / (
        F.col("n2") + F.lit(bins)
    ).cast("double")
    # ln(p/q) from exact integer cross-products, pinned to 1e-5
    lnr5 = F.round(
        F.log(
            ((F.col("ref_n") + 1) * (F.col("n2") + F.lit(bins))).cast(
                "double"
            )
            / ((F.col("live_n") + 1) * (F.col("n1") + F.lit(bins))).cast(
                "double"
            )
        )
        * 100000
    ).cast("bigint")
    term = (p - q) * (lnr5.cast("double") / F.lit(100000.0))
    wbin = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = tot.select(
        "bin", "ref_n", "live_n",
        term.alias("__term"),
    )
    return out.select(
        "bin", "ref_n", "live_n",
        F.round(F.col("__term"), 6).alias("term"),
        F.round(F.sum("__term").over(wbin), 6).alias("psi_cum"),
    ).orderBy("bin")
