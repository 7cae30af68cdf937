"""Group-wise statistics: per-group z-score normalization.

Two implementations with identical semantics:

- :func:`zscore_exact` — pure DataFrame: decimal-exact group sums →
  broadcast join back → double arithmetic. Deterministic to the bit,
  so it carries a DuckDB oracle.
- :func:`zscore_pandas` — ``applyInPandas`` (grouped Arrow batches →
  numpy). The idiomatic shape for group-wise Python (per-group model
  scoring, resampling, curve fitting); numerically equal to ~1e-12
  but not bitwise (BLAS reductions), so it is checked rows-only +
  tolerance tests.

Scale notes: the exact path is one partial+final aggregation plus a
broadcast of the tiny group-stats table — no second shuffle of the
fact rows. ``applyInPandas`` shuffles rows by group key: fine for
many medium groups, a straggler hazard for one giant group (pre-split
hot groups by salting and merge moments afterwards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def group_moments(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-key (n, mean, stddev) from decimal-exact sums (sample
    stddev, n-1 denominator). A singleton group has no SAMPLE stddev
    at all (n-1 = 0 — under ANSI the unguarded division is a CRASH,
    singleton adversary, round 11): stddev is NULL for n < 2, and the
    CASE guard keeps the division unevaluated for those rows."""
    sum_d = F.sum(F.col(value).cast("decimal(28,6)")).cast("double")
    sumsq_d = F.sum((F.col(value) * F.col(value)).cast("decimal(38,12)")).cast(
        "double"
    )
    n = F.count(F.lit(1))
    agg = df.groupBy(key).agg(
        n.alias("n"), sum_d.alias("s"), sumsq_d.alias("ss")
    )
    mean = F.col("s") / F.col("n")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    return agg.select(
        key,
        "n",
        mean.alias("mean"),
        F.when(F.col("n") < 2, F.lit(None))
        .otherwise(F.sqrt(var))
        .alias("stddev"),
    )


def zscore_exact(df: DataFrame, key: str, value: str, id_col: str) -> DataFrame:
    # zero-dispersion contract: a group whose every value is identical
    # (stddev = 0, const adversary) or has a single row (stddev NULL
    # from group_moments, singleton adversary) has no standardization —
    # z-score NULL, pinned on both engines. Without the guard ANSI
    # mode CRASHES on the first stuck-sensor group (round 11).
    return (
        df.join(F.broadcast(group_moments(df, key, value)), key)
        .select(
            id_col,
            key,
            F.when(F.col("stddev") == 0, F.lit(None))
            .otherwise(
                F.round((F.col(value) - F.col("mean")) / F.col("stddev"), 6)
            )
            .alias("zscore"),
        )
    )


def zscore_pandas(df: DataFrame, key: str, value: str, id_col: str) -> DataFrame:
    """Grouped-map Arrow path (applyInPandas)."""
    import pandas as pd

    def norm(pdf: "pd.DataFrame") -> "pd.DataFrame":
        s = pdf[value].std(ddof=1)
        # same contract as zscore_exact: zero-dispersion (s == 0) and
        # singleton (n < 2 → s is NaN) groups get NULL, not NaN/inf
        if len(pdf) < 2 or s == 0:
            z = pd.Series(float("nan"), index=pdf.index, dtype="float64")
        else:
            z = ((pdf[value] - pdf[value].mean()) / s).round(6)
        return pd.DataFrame(
            {id_col: pdf[id_col], key: pdf[key], "zscore": z}
        )

    return df.select(id_col, key, value).groupBy(key).applyInPandas(
        norm, f"{id_col} long, {key} string, zscore double"
    )


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    accuracy: int = 10_000,
) -> DataFrame:
    """Scale path for a global NTILE: quantile-bucket every row
    WITHOUT a single-task global window.

    One sketch pass computes the ``n_buckets - 1`` cut points
    (``percentile_approx`` — t-digest-style, partial-mergeable,
    bounded memory), the tiny cut-point array is folded back into the
    plan as a literal, and each row's bucket is ``1 + #cutpoints
    below its value`` — a pure map-side expression, no shuffle of the
    fact rows at all.

    Semantics vs exact NTILE: equal values always land in the SAME
    bucket here (often the more desirable property), whereas NTILE
    splits ties to equalize bucket sizes; bucket populations are
    approximately — not exactly — equal. Agreement is asserted in
    tests (≥85% identical, never off by more than one bucket at
    fixture scale). Adds ``bucket`` (int, 1-based)."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.agg(
        F.percentile_approx(value_col, probs, accuracy).alias("c")
    ).first()["c"]
    arr = F.array(*[F.lit(float(c)) for c in cuts])
    bucket = F.lit(1) + F.aggregate(
        arr,
        F.lit(0),
        lambda acc, c: acc
        + F.when(F.col(value_col).cast("double") > c, 1).otherwise(0),
    )
    return df.withColumn("bucket", bucket.cast("int"))


def daily_count_anomaly(daily: DataFrame, z_threshold: int = 2) -> DataFrame:
    """The exact-integer |z| anomaly gate over per-(event_type, day)
    counts — ONE implementation shared by the batch q137 report and
    the streaming snapshot (``streaming/incremental.py:
    daily_anomaly_snapshot``), so the two serving paths cannot
    de-synchronize. Input: (event_type, d date, c bigint). The gate
    (n·c − s)² > z²·(n·q − s²) clears both denominators, so row
    selection is bit-deterministic cross-engine; the reported z is
    one IEEE sqrt + division on exact BIGINT moments. Scale: the
    moment table is |types| rows and broadcasts back; counts
    partial-combine upstream; no window functions."""
    if not isinstance(z_threshold, int) or isinstance(z_threshold, bool):
        # z² multiplies BIGINT moments — a float threshold would
        # silently demote the whole gate to double arithmetic and
        # void the bit-deterministic cross-engine contract.
        raise TypeError(
            f"z_threshold must be int (got {type(z_threshold).__name__}): "
            "the exact-integer gate squares it against BIGINT moments"
        )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    nc_s = F.col("n") * F.col("c") - F.col("s")
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return (
        daily.join(F.broadcast(m), "event_type")
        .where(
            (F.col("n") >= 2)
            & (nc_s * nc_s > F.lit(z_threshold * z_threshold) * var_n2)
        )
        .select(
            "event_type",
            F.col("d").cast("string").alias("day"),
            F.col("c").alias("n_events"),
            F.round(
                nc_s.cast("double") / F.sqrt(var_n2.cast("double")), 4
            ).alias("z"),
        )
        .orderBy("event_type", "day")
    )


def grouped_doubled_ranks(
    counts: DataFrame,
    group_col: str | list[str],
    value_col: str,
    count_col: str,
    out_col: str = "r2",
) -> DataFrame:
    """Scale path for per-group tie-averaged ranks on LOW-CARDINALITY
    group keys, in the exact doubled-rank integer encoding
    ``2*avg_rank = 2*rank() + count(ties) - 1``  (equivalently
    ``2*cnt_lt + cnt_eq + 1``): a ``Window.partitionBy(group)`` rank
    caps parallelism at |groups| tasks (3 for ``l_returnflag``), so
    this computes the same BIGINT values via the q58/q195
    partition-offset pattern instead:

    1. rank inputs are pre-aggregated ``(group, value, cnt)`` rows —
       the caller's groupBy, a hash aggregate with full parallelism;
    2. ``repartitionByRange(group, value)`` gives a total order
       across partitions with every (group, value) key in exactly
       one partition (range boundaries are key values);
    3. per-(partition, group) subtotals — ≤ nparts·|groups| rows —
       prefix-sum into per-partition group offsets with a window
       over that TINY table;
    4. the within-partition prefix sum runs under
       ``Window.partitionBy(pid, group)`` — parallelism is
       nparts·|groups|, never |groups|, and it shuffles only the
       distinct (group, value) rows, never the fact rows.

    Returns ``(group_col..., value_col, count_col, out_col)`` where
    ``out_col`` is the BIGINT doubled average rank of ``value_col``
    among the group's ROWS (weight = cnt). Bit-identical to the
    window formulation — same integers, any engine, and independent
    of the range-partition boundaries (offsets are per-(partition,
    group) exact prefix sums). ``group_col`` may be a LIST of
    columns — consumers ranking several variables fuse them into ONE
    pass by union-tagging a variable column into the group key
    (q239: one repartitionByRange + window sweep instead of two,
    optimization round 12, guide §1.2/§2.4)."""
    from pyspark.sql import Window

    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    nparts = counts.sparkSession.sparkContext.defaultParallelism
    tagged = (
        counts.repartitionByRange(nparts, *groups, value_col)
        .sortWithinPartitions(*groups, value_col)
        .select("*", F.spark_partition_id().alias("__pid"))
    )
    ptot = tagged.groupBy("__pid", *groups).agg(
        F.sum(F.col(count_col)).cast("long").alias("__ptot")
    )
    w_off = (
        Window.partitionBy(*groups)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = ptot.select(
        "__pid",
        *groups,
        F.coalesce(F.sum("__ptot").over(w_off), F.lit(0)).alias("__off"),
    )
    w_local = (
        Window.partitionBy("__pid", *groups)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        tagged.withColumn(
            "__local_lt",
            F.coalesce(
                F.sum(F.col(count_col)).over(w_local).cast("long"), F.lit(0)
            ),
        )
        .join(F.broadcast(offsets), ["__pid", *groups])
        .select(
            *groups,
            value_col,
            count_col,
            (
                2 * (F.col("__off") + F.col("__local_lt"))
                + F.col(count_col)
                + 1
            )
            .cast("long")
            .alias(out_col),
        )
    )


def _pava_pool(
    sums: list, cnts: list, ssqs: list, cs: float, cc: int, cq: float
) -> None:
    """Push one (sum, count, sum-of-squares) block onto the PAVA
    stack, pooling while the last block's mean >= the new one's
    (division-free comparison: s_last*c_new >= s_new*c_last)."""
    while sums and sums[-1] * cc >= cs * cnts[-1]:
        cs += sums.pop()
        cc += cnts.pop()
        cq += ssqs.pop()
    sums.append(cs)
    cnts.append(cc)
    ssqs.append(cq)


def isotonic_fit_stats(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    n_chunks: int | None = None,
    max_batch_rows: int = 5_000_000,
    auto_chunk: bool = True,
) -> DataFrame:
    """Group-wise isotonic regression (pool-adjacent-violators) fit
    census — the standard score-calibration step (Zadrozny & Elkan;
    a monotone map from raw scores to empirical outcome rates) plus
    the fit diagnostics a calibration audit reports: per group, n,
    the number of monotone blocks, and the MSE before (constant
    predictor = group mean) vs after the isotonic fit.

    The idiomatic ``applyInPandas`` shape for per-group iterative
    numerics: PAVA is inherently sequential IN x-order WITHIN a
    group, so each group's (x, y) pairs arrive as one Arrow batch,
    numpy runs the O(n) stack-based PAVA, and only the 1-row
    diagnostics leave the worker. Ties in x break by a caller-
    visible total order (x, y) so the fit is partitioning-proof.
    Rows-only posture: pooled block means are float averages (no
    SQL twin); a pure-Python replica test pins the algorithm.

    Giant groups (round-9 verdict #5, auto-chunked round 11): with
    ``auto_chunk=True`` (default) and no explicit ``n_chunks``, one
    cheap pre-pass (groupBy-count + max, column-pruned to the group
    column, 1-row collect) finds the largest group; when it exceeds
    ``max_batch_rows`` the operator derives
    ``n_chunks = ceil(2 * max_group_rows / max_batch_rows)`` itself
    (2× because chunks split on GLOBAL x-range boundaries, so a
    group's rows need not spread evenly) and self-heals onto the
    chunked path — no caller re-run. The in-UDF guard stays as the
    backstop: any Arrow batch still larger than ``max_batch_rows``
    raises a LOUD ValueError (carrying the derived ``n_chunks`` to
    pass) instead of silently OOMing one worker.

    Chunked path: the group pre-splits into global x-range chunks
    (boundaries from one bounded ``approx_percentile`` collect),
    each chunk runs PAVA independently, and the resulting
    (sum, count, sum-of-squares) blocks — typically ≪ rows — merge
    across chunk boundaries with the SAME stack in one tiny second
    stage. PAVA pooling is associative over contiguous segments
    (adjacent violators must pool in any optimal fit), so the
    chunked fit equals the single-batch fit; MSEs come from exact
    block moments (Σy² − (Σy)²/c per final block), accumulated on
    PIVOT-CENTERED y (y − global approx mean; MSE and the pooling
    comparison are both shift-invariant) so large |mean(y)| cannot
    catastrophically cancel the moment subtraction (round-10
    ADVICE). Equal x values always land in one chunk, so the (x, y)
    tie order is preserved.

    NULL x or y raises in BOTH paths: isotonic regression is
    undefined without an x-order, and the two paths would otherwise
    order null-x rows differently (pandas sorts NaN last; the chunk
    router would send them to chunk 0) and silently disagree
    (round-10 ADVICE).

    Scale: shuffles (group, x, y) projections once on (group) or
    (group, chunk); per-chunk O(n) PAVA; only block aggregates and
    1-row diagnostics leave the workers."""
    import math

    import pandas as pd

    group_type = df.schema[group_col].dataType.simpleString()
    diag_schema = (
        f"{group_col} {group_type}, n long, n_blocks long, "
        "mse_before double, mse_after double"
    )

    def _guard(n_rows: int, what: str) -> None:
        if n_rows > max_batch_rows:
            hint = math.ceil(2 * n_rows / max_batch_rows)
            raise ValueError(
                f"isotonic_fit_stats: {what} holds {n_rows} rows > "
                f"max_batch_rows={max_batch_rows}; pass "
                f"n_chunks={hint} to pre-split giant groups by "
                "x-range (or raise max_batch_rows if the workers "
                "have the memory)"
            )

    def _check_nulls(pdf: "pd.DataFrame", what: str) -> None:
        # Both paths must see the same row order; NaN x sorts LAST
        # in pandas but routes to chunk 0 in the chunk expression,
        # so null x (or y, which would silently poison the moment
        # sums) is rejected loudly instead (round-10 ADVICE).
        if pdf[x_col].isna().any() or pdf[y_col].isna().any():
            raise ValueError(
                f"isotonic_fit_stats: {what} contains null "
                f"{x_col!r}/{y_col!r} values — isotonic regression "
                "needs a total x-order; filter nulls upstream"
            )

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        _guard(len(pdf), f"group {pdf[group_col].iloc[0]!r}")
        _check_nulls(pdf, f"group {pdf[group_col].iloc[0]!r}")
        pdf = pdf.sort_values([x_col, y_col], kind="mergesort")
        y = pdf[y_col].to_numpy(dtype=np.float64)
        n = len(y)
        mean = y.mean() if n else float("nan")
        mse_before = float(((y - mean) ** 2).mean()) if n else None
        # stack-based PAVA: blocks of (sum, count); pool while the
        # last block's mean exceeds the new one's
        sums: list[float] = []
        cnts: list[int] = []
        ssqs: list[float] = []
        for v in y:
            _pava_pool(sums, cnts, ssqs, float(v), 1, float(v) * float(v))
        fitted = np.concatenate(
            [np.full(c, s / c) for s, c in zip(sums, cnts)]
        ) if n else np.array([])
        mse_after = float(((y - fitted) ** 2).mean()) if n else None
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n": [n],
                "n_blocks": [len(sums)],
                "mse_before": [round(mse_before, 6)],
                "mse_after": [round(mse_after, 6)],
            }
        )

    proj = df.select(group_col, x_col, y_col)
    if n_chunks is None and auto_chunk:
        # Self-healing pre-pass (round-10 verdict #3): one cheap
        # column-pruned groupBy-count + max — bounded 1-row collect —
        # finds the largest group; oversize groups derive their own
        # n_chunks instead of failing and demanding a caller re-run.
        max_rows = (
            proj.groupBy(group_col).count().agg(F.max("count")).first()[0]
            or 0
        )
        if max_rows > max_batch_rows:
            n_chunks = math.ceil(2 * max_rows / max_batch_rows)
    if n_chunks is None or n_chunks <= 1:
        return proj.groupBy(group_col).applyInPandas(fit, diag_schema)

    # --- chunked scale path ---
    # Global x-range boundaries: one bounded 1-row collect. Global
    # (not per-group) boundaries keep the plan free of a
    # per-group-cardinality collect; chunks stay contiguous in x
    # within every group, which is all correctness needs. The same
    # collect fetches the global approx y-mean used as the centering
    # pivot for the block moments (MSE and the PAVA pooling
    # comparison are both shift-invariant, so ANY pivot is exact;
    # centering kills the Σy² − (Σy)²/n cancellation at large
    # |mean(y)| — round-10 ADVICE).
    probs = [i / n_chunks for i in range(1, n_chunks)]
    row = proj.select(
        F.percentile_approx(F.col(x_col), probs).alias("b"),
        F.avg(F.col(y_col)).alias("m"),
    ).first()
    # INTEGER pivot (round of the global mean): subtraction stays
    # EXACT whenever y is integer-valued (the common label case,
    # where equal-mean pooling ties are routine) or |y| is huge
    # (Sterbenz), so tie-breaking matches the raw single-batch path
    # bit-for-bit while the moments lose the 1e8-scale offset.
    pivot = 0.0
    if row["m"] is not None and math.isfinite(row["m"]):
        pivot = float(round(row["m"]))
    bounds = sorted(set(row["b"] or []))
    if not bounds:
        return proj.groupBy(group_col).applyInPandas(fit, diag_schema)
    chunk_expr = sum(
        (F.when(F.col(x_col) > F.lit(b), 1).otherwise(0) for b in bounds),
        F.lit(0),
    ).alias("__chunk")

    def fit_chunk(pdf: "pd.DataFrame") -> "pd.DataFrame":
        _guard(
            len(pdf),
            f"group {pdf[group_col].iloc[0]!r} chunk "
            f"{int(pdf['__chunk'].iloc[0])}",
        )
        _check_nulls(
            pdf,
            f"group {pdf[group_col].iloc[0]!r} chunk "
            f"{int(pdf['__chunk'].iloc[0])}",
        )
        pdf = pdf.sort_values([x_col, y_col], kind="mergesort")
        sums: list[float] = []
        cnts: list[int] = []
        ssqs: list[float] = []
        # moments on pivot-centered y — shift-invariant fit + MSEs,
        # cancellation-proof merge stage
        for v in pdf[y_col].to_numpy(dtype="float64") - pivot:
            _pava_pool(sums, cnts, ssqs, float(v), 1, float(v) * float(v))
        return pd.DataFrame(
            {
                group_col: pdf[group_col].iloc[0],
                "__chunk": int(pdf["__chunk"].iloc[0]),
                "__blk": range(len(sums)),
                "__s": sums,
                "__c": cnts,
                "__q": ssqs,
            }
        )

    blk_schema = (
        f"{group_col} {group_type}, __chunk long, __blk long, "
        "__s double, __c long, __q double"
    )
    blocks = (
        proj.withColumn("__chunk", chunk_expr)
        .groupBy(group_col, "__chunk")
        .applyInPandas(fit_chunk, blk_schema)
    )

    def merge_blocks(pdf: "pd.DataFrame") -> "pd.DataFrame":
        _guard(len(pdf), f"group {pdf[group_col].iloc[0]!r} block set")
        pdf = pdf.sort_values(["__chunk", "__blk"], kind="mergesort")
        sums: list[float] = []
        cnts: list[int] = []
        ssqs: list[float] = []
        for s, c, q in zip(pdf["__s"], pdf["__c"], pdf["__q"]):
            _pava_pool(sums, cnts, ssqs, float(s), int(c), float(q))
        n = int(sum(cnts))
        s_tot = sum(sums)
        q_tot = sum(ssqs)
        mse_before = (q_tot - s_tot * s_tot / n) / n if n else None
        # per final block: Σ(y−m)² = Σy² − (Σy)²/c, exact in moments
        sse_after = sum(
            q - s * s / c for s, c, q in zip(sums, cnts, ssqs)
        )
        mse_after = max(sse_after, 0.0) / n if n else None
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n": [n],
                "n_blocks": [len(sums)],
                "mse_before": [round(max(mse_before, 0.0), 6)],
                "mse_after": [round(mse_after, 6)],
            }
        )

    return blocks.groupBy(group_col).applyInPandas(merge_blocks, diag_schema)


def ordered_prefix_sum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "running_total",
    inclusive: bool = True,
) -> DataFrame:
    """GLOBAL running total in a caller-defined total order WITHOUT a
    single-partition window — the cumulative-sum sibling of
    `assign_dense_ids`/`grouped_doubled_ranks` (the q58/q195
    partition-offset pattern, extended from counts to SUMS):

    1. ``repartitionByRange(order_cols)`` gives a total order across
       partitions; rows sort within partitions;
    2. per-partition value sums — nparts rows — prefix-sum into
       per-partition offsets via a window over that TINY table;
    3. the within-partition running sum is
       ``Window.partitionBy(pid)`` — parallelism = nparts, never 1.

    ``Window.orderBy(...)`` with no partition key moves ALL data to
    one task (the WindowExec warning); this shape is what a 100 TB
    budget-capped selection actually runs. ``inclusive=False`` gives
    the exclusive prefix (total strictly before the row). Values
    accumulate in DECIMAL(38,6) — order-free, overflow-checked."""
    from pyspark.sql import Window

    nparts = df.sparkSession.sparkContext.defaultParallelism
    dec = "decimal(38,6)"
    tagged = (
        df.repartitionByRange(nparts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .select("*", F.spark_partition_id().alias("__pid"))
    )
    ptot = tagged.groupBy("__pid").agg(
        F.sum(F.col(value_col).cast(dec)).alias("__ptot")
    )
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # nparts rows only — bounded by contract
    offsets = ptot.select(
        "__pid",
        F.coalesce(
            F.sum("__ptot").over(w_off), F.lit(0).cast(dec)
        ).alias("__off"),
    )
    end = Window.currentRow if inclusive else -1
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    local = F.coalesce(
        F.sum(F.col(value_col).cast(dec)).over(w_local),
        F.lit(0).cast(dec),
    )
    return (
        tagged.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__off") + local).cast(dec))
        .drop("__pid", "__off")
    )
