"""Distribution-drift statistics over value-count tables — ONE
kernel shared by the batch reports (plans/reference_queries.py:
q177_ks_source_drift, q182_psi_drift) and the streaming drift
monitor (streaming/incremental.py: value-count partials + KS
snapshot), the daily_count_anomaly / importance.py single-kernel
discipline.

Everything operates on aggregated (value, count) tables, never raw
rows: the corpus collapses once into per-value counts (additive, so
streamed partials sum to the batch table), and the statistics are
exact — KS compares BIGINT cross-products f1*n2 - f2*n1 with ONE
IEEE division at the very end; PSI's per-bin chain is fixed IEEE
ops on exact integers with a pinned ln. That is what makes the
streamed monitor's output bit-identical to the batch recompute
regardless of micro-batch slicing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def value_counts(
    df: DataFrame, val_col: str, out_val: str = "v"
) -> DataFrame:
    """(v, c): the per-value count table every drift statistic
    consumes. Additive across disjoint row slices — the property the
    streaming partials rely on."""
    return df.groupBy(F.col(val_col).alias(out_val)).agg(
        F.count(F.lit(1)).alias("c")
    )


def merge_counts(
    counts_a: DataFrame, counts_b: DataFrame, val_col: str = "v"
) -> DataFrame:
    """Merge two (v, c) tables into one (v, ca, cb) table via
    union + re-aggregate — NOT a full-outer join, because join keys
    are not null-safe: a nullable monitored column would produce two
    separate NULL rows (one per side) and a phantom CDF step
    (review-flagged); groupBy treats NULL as one group, matching the
    one-scan conditional-count producers."""
    a = counts_a.select(
        F.col(val_col).alias("v"),
        F.col("c").cast("bigint").alias("ca"),
        F.lit(0).cast("bigint").alias("cb"),
    )
    b = counts_b.select(
        F.col(val_col).alias("v"),
        F.lit(0).cast("bigint").alias("ca"),
        F.col("c").cast("bigint").alias("cb"),
    )
    return (
        a.union(b)
        .groupBy("v")
        .agg(F.sum("ca").alias("ca"), F.sum("cb").alias("cb"))
    )


def ks_from_counts(
    counts_a: DataFrame, counts_b: DataFrame, val_col: str = "v"
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic from two
    per-value count tables (val_col, c). Returns ONE row
    (n1, n2, ks_num, ks_stat): the supremum of |F1 - F2| over every
    distinct observed value, integer-exact via |f1*n2 - f2*n1|
    BIGINT cross-products; ks_stat is that max over n1*n2, rounded
    once.

    Scale: the null-safe merge and cumulative window run over the
    UNION of distinct values — bounded by value cardinality, not
    sample size; sample totals ride the same window pass (no second
    scan). The window is global but its input is the bounded value
    table (the q177 contract); swap in a sketch-CDF twin if value
    cardinality itself explodes."""
    return ks_from_merged(merge_counts(counts_a, counts_b, val_col))


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


def psi_from_counts(
    ref_counts: DataFrame,
    live_counts: DataFrame,
    bins: int = 10,
    val_col: str = "v",
) -> DataFrame:
    """Population Stability Index from two per-value count tables —
    the two-table entry (streaming: frozen reference vs summed live
    partials). See :func:`psi_from_merged` for the statistic."""
    return psi_from_merged(
        merge_counts(ref_counts, live_counts, val_col), bins
    )


def psi_from_merged(pts: DataFrame, bins: int = 10) -> DataFrame:
    """Population Stability Index over reference-quantile bins — the
    industry-standard drift score (PSI < 0.1 stable / 0.1-0.25
    watch / > 0.25 shifted) — from a merged (v, ca, cb) count table
    (ca = reference side, cb = live side; a one-scan conditional
    producer lands here directly, the ks_from_merged discipline).

    Binning: cut points are the EXACT reference quantiles — cut_i =
    min v with cumulative reference count >= ceil(i*n1/bins) — so
    both engines derive identical bins from integer rank arithmetic
    (no percentile interpolation); rows with ca = 0 contribute no
    cumulative mass, so live-only values never move a cut. Bin
    membership is assigned ONCE per distinct value and both sides
    aggregate off that single pass. An EMPTY reference yields no
    cuts and every value lands in bin 1 (left join, not a
    cross-join that would annihilate the live side — review-
    flagged), so the verdict is maximal drift, never a silent
    'stable'. Add-1 smoothing keeps empty bins finite. Determinism:
    each bin's term is a fixed chain of IEEE ops (two one-division
    proportions, one pinned-to-1e-5 ratio ln whose cross-products
    multiply as DOUBLES — BIGINT products would wrap at ~4e9-row
    sides, the TextRank overflow class), and the running psi
    accumulates in BIN ORDER via a cumulative window — an unordered
    float SUM would be shuffle-order dependent. Output: one row per
    bin (ref_n, live_n, term, psi_cum); the last bin's psi_cum IS
    the PSI.

    Scale: everything runs over value-count / ``bins``-row tables;
    the cut table is ``bins - 1`` rows and broadcasts."""
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    refc = pts.select(
        "v",
        "ca",
        "cb",
        F.sum("ca").over(wcum).alias("cum"),
        F.sum("ca").over(wall).alias("n1"),
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
    vb = (
        pts.join(F.broadcast(cuts), F.lit(True), "left")
        .groupBy("v")
        .agg(
            F.first("ca").alias("ca"),
            F.first("cb").alias("cb"),
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
        .agg(F.sum("ca").alias("ref_n"), F.sum("cb").alias("live_n"))
    )
    allbins = (
        pts.sparkSession.range(1, bins + 1)
        .select(F.col("id").cast("int").alias("bin"))
        .join(vb, "bin", "left")
        .select(
            "bin",
            F.coalesce("ref_n", F.lit(0)).cast("bigint").alias("ref_n"),
            F.coalesce("live_n", F.lit(0)).cast("bigint").alias("live_n"),
        )
    )
    tot = allbins.select(
        "bin",
        "ref_n",
        "live_n",
        F.sum("ref_n").over(wall).alias("n1"),
        F.sum("live_n").over(wall).alias("n2"),
    )
    p = (F.col("ref_n") + 1).cast("double") / (
        F.col("n1") + F.lit(bins)
    ).cast("double")
    q = (F.col("live_n") + 1).cast("double") / (
        F.col("n2") + F.lit(bins)
    ).cast("double")
    # ln(p/q) from cross-products multiplied AS DOUBLES (exact to
    # 2^53 per factor; a BIGINT product wraps at ~4e9-row sides),
    # pinned to 1e-5
    lnr5 = F.round(
        F.log(
            (
                (F.col("ref_n") + 1).cast("double")
                * (F.col("n2") + F.lit(bins)).cast("double")
            )
            / (
                (F.col("live_n") + 1).cast("double")
                * (F.col("n1") + F.lit(bins)).cast("double")
            )
        )
        * 100000
    ).cast("bigint")
    term = (p - q) * (lnr5.cast("double") / F.lit(100000.0))
    wbin = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = tot.select("bin", "ref_n", "live_n", term.alias("__term"))
    return out.select(
        "bin",
        "ref_n",
        "live_n",
        F.round(F.col("__term"), 6).alias("term"),
        F.round(F.sum("__term").over(wbin), 6).alias("psi_cum"),
    ).orderBy("bin")


def _ln5(c) -> F.Column:
    """Pinned natural log in integer 1e-5 nat units — the module's
    exactness convention (see ks/psi kernels): one libm ln, scaled,
    rounded ONCE to BIGINT, so every downstream sum is integer."""
    return F.round(F.log(c.cast("double")) * 100000).cast("bigint")


def unigram_kl(
    df: DataFrame, text_col: str, group_col: str
) -> DataFrame:
    """Per-group unigram KL divergence from the corpus mixture:
    KL(P_g ‖ P_corpus) over whitespace unigrams with add-1
    smoothing on the corpus vocabulary — the distribution-shift
    score data-mixing pipelines watch per source/domain (a source
    whose token distribution drifts far from the mixture is either
    contaminated, mis-crawled, or a genuinely novel domain worth
    re-weighting; DoReMi-adjacent diagnostics key on exactly this).

    P_g(w) = (c_g(w)+1)/(n_g+V), P_c(w) = (c(w)+1)/(n_c+V); the sum
    runs over the FULL corpus vocab V, but only (group, present-
    word) pairs ever materialize: the absent-word mass folds into
    closed form via ln-factor separation —

        Σ_{w: c_g(w)=0} 1·[ln(n_c+V) − ln(n_s+V) − ln(c(w)+1)]
        = (V−m_g)(ln(n_c+V) − ln(n_g+V)) − (S₀ − Σ_present ln(c+1))

    with S₀ = Σ_vocab ln(c(w)+1) ONE global scalar. Every ln is
    pinned to integer 1e-5 nat units (_ln5) so both partial sums
    are BIGINT; the only float op is the final division — exact
    cross-engine, same contract as the PSI/surprisal family.

    Returns (group_col, n_tokens, distinct_tokens, kl_nats).

    Scale: one explode into a (group, word) partial-combining
    count; the corpus word table is its re-aggregate (same keys,
    no second scan); per-group present-term sums ride the same
    clustering; the vocab scalars are two 1-row aggregates that
    broadcast back. Nothing materializes group×vocab."""
    words = df.select(
        F.col(group_col).alias("g"),
        F.explode(F.split(F.col(text_col), " ")).alias("w"),
    )
    # Materialize the (group, word) counts — vocab×groups-bounded —
    # before the three consumers (corpus re-agg, vocab scalars, the
    # present-term join) each re-run the corpus explode: Catalyst
    # does not share common subplans, so without this one query
    # scans the 100 TB text column three times.
    gw = (
        words.groupBy("g", "w")
        .agg(F.count(F.lit(1)).alias("cg"))
        .localCheckpoint()
    )
    corpus = gw.groupBy("w").agg(F.sum("cg").alias("c"))
    vocab = corpus.agg(
        F.count(F.lit(1)).alias("V"),
        F.sum("c").alias("n_c"),
        F.sum(_ln5(F.col("c") + 1)).alias("S0"),
    )
    # per-group totals + present-term partial sums (joined with the
    # corpus count per word — same (w) key, broadcast-sized right
    # side only when vocab is small; Catalyst picks)
    per = (
        gw.join(corpus, "w")
        .groupBy("g")
        .agg(
            F.sum("cg").alias("n_g"),
            F.count(F.lit(1)).alias("m_g"),
            F.sum(
                (F.col("cg") + 1)
                * (_ln5(F.col("cg") + 1) - _ln5(F.col("c") + 1))
            ).alias("present_core5"),
            F.sum(_ln5(F.col("c") + 1)).alias("present_lnc5"),
        )
    )
    j = per.join(F.broadcast(vocab), F.lit(True), "inner")
    ln_nc = _ln5(F.col("n_c") + F.col("V"))
    ln_ng = _ln5(F.col("n_g") + F.col("V"))
    present5 = F.col("present_core5") + (
        F.col("n_g") + F.col("m_g")
    ) * (ln_nc - ln_ng)
    absent5 = (F.col("V") - F.col("m_g")) * (ln_nc - ln_ng) - (
        F.col("S0") - F.col("present_lnc5")
    )
    kl = (present5 + absent5).cast("double") / (
        (F.col("n_g") + F.col("V")).cast("double") * F.lit(100000.0)
    )
    return j.select(
        F.col("g").alias(group_col),
        F.col("n_g").alias("n_tokens"),
        F.col("m_g").alias("distinct_tokens"),
        F.round(kl, 6).alias("kl_nats"),
    )


def kl_from_merged(pts: DataFrame) -> DataFrame:
    """KL(live ‖ ref) from ONE merged (v, ca, cb) count table
    (ca = reference, cb = live) with add-1 smoothing over the union
    vocabulary — the drift statistic for CATEGORICAL/token
    distributions, complementing KS (ordered values) and PSI
    (binned numerics): no ordering or binning, mass-weighted by the
    live side, so a category the live side spams dominates the
    score even when its rank order is unchanged.

    KL = Σ_v (cb+1)/(n_b+V) · ln((cb+1)(n_a+V) / ((ca+1)(n_b+V)))

    Every v of the union appears as a merged row (merge_counts'
    contract), so the sum needs no absent-mass closed form (unlike
    unigram_kl's group-vs-mixture case, where a group misses most
    of the vocab). Pinned-integer exactness, same as the KS/PSI
    kernels: each ln rounds ONCE to BIGINT 1e-5 nat units, the
    numerator accumulates as BIGINT, one IEEE division at the end —
    bit-identical across engines, row orders, and micro-batch
    slicings (what lets the streaming snapshot equal the batch
    recompute exactly). Returns one row:
    (n_ref, n_live, vocab, kl_nats). Scale: one partial-combining
    aggregate over the value-count table — cardinality-bounded, not
    row-bounded."""
    agg = pts.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.count(F.lit(1)).alias("V"),
        F.sum(
            (F.col("cb") + 1)
            * (_ln5(F.col("cb") + 1) - _ln5(F.col("ca") + 1))
        ).alias("core5"),
    )
    ln_na = _ln5(F.col("n_a") + F.col("V"))
    ln_nb = _ln5(F.col("n_b") + F.col("V"))
    num5 = F.col("core5") + (F.col("n_b") + F.col("V")) * (ln_na - ln_nb)
    kl = num5.cast("double") / (
        (F.col("n_b") + F.col("V")).cast("double") * F.lit(100000.0)
    )
    return agg.select(
        F.col("n_a").alias("n_ref"),
        F.col("n_b").alias("n_live"),
        F.col("V").alias("vocab"),
        F.round(kl, 6).alias("kl_nats"),
    )


def kl_from_counts(
    ref_counts: DataFrame, live_counts: DataFrame
) -> DataFrame:
    """KL(live ‖ ref) from two separate (v, c) tables — the
    streaming-consumer entry (frozen reference vs summed live
    partials); batch producers that already hold both sides in one
    scan use :func:`kl_from_merged` directly."""
    return kl_from_merged(merge_counts(ref_counts, live_counts))
