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
from pyspark.sql.window import Window


def _md5_u32(c: Column) -> Column:
    """The module's portable lottery: first 8 md5 hex chars of the
    stringified id as a BIGINT in [0, 2³²). ONE definition — the
    DuckDB twin ('0x' || substr(md5(id), 1, 8))::BIGINT mirrors it
    exactly, so every consumer (bucket splits, PPS keys) stays
    engine-synchronized."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )


def hash_bucket(id_col: str | Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the id's md5 (portable:
    DuckDB twin is ('0x' || substr(md5(id), 1, 8))::BIGINT % n)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(_md5_u32(c), F.lit(buckets))


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


def stratified_sample(
    df: DataFrame, strata_col: str, id_col: str, k: int
) -> DataFrame:
    """Exactly ``k`` rows per stratum, chosen by smallest md5(id) —
    a deterministic uniform sample (each id's hash is its lottery
    ticket; same winners on any engine, any partitioning, any run).

    One shuffle on the stratum key. A stratum's rows funnel through
    one task — for mega-strata switch to a two-phase top-k (per-
    partition k-smallest, then merge), same semantics."""
    from pyspark.sql.window import Window

    c = F.col(id_col)
    h = F.md5(c.cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h, c)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def sequence_packing(
    df: DataFrame,
    group_col: str,
    order_col: str,
    size_col,
    capacity: int,
) -> DataFrame:
    """Assign rows to fixed-capacity training bins (sequence packing
    estimate): bin = floor(exclusive-prefix-sum(size) / capacity) in
    ``order_col`` order within each ``group_col``. The standard
    streaming approximation of greedy packing — deterministic, one
    window per group, integer-exact. Adds ``bin_idx``."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn(
        "bin_idx", F.floor(prefix / F.lit(capacity)).cast("int")
    )


def stratified_sample_scale(
    df: DataFrame, strata_col: str, id_col: str, k: int, n_salts: int = 32
) -> DataFrame:
    """Two-phase scale twin of :func:`stratified_sample` — IDENTICAL
    output (k smallest md5(id) per stratum), but no stratum ever
    funnels through a single task.

    Phase 1 splits each stratum into ``n_salts`` hash-salted shards
    and takes the k smallest per shard in parallel — any shard
    holding a global winner keeps it (k-smallest of a superset
    retains every k-smallest of the whole), so phase 2's merge window
    sees ≤ k·n_salts rows per stratum, a bounded input regardless of
    stratum size. Mega-strata (one language dominating a 100 TB
    corpus) parallelize across the salts instead of serializing into
    one window task."""
    from pyspark.sql.window import Window

    c = F.col(id_col)
    h = F.md5(c.cast("string"))
    salt = F.pmod(F.xxhash64(c), F.lit(n_salts))
    nparts = df.sparkSession.sparkContext.defaultParallelism
    w1 = Window.partitionBy(strata_col, "__salt").orderBy(h, c)
    w2 = Window.partitionBy(strata_col).orderBy(h, c)
    return (
        df.withColumn("__salt", salt)
        .repartition(nparts, F.col(strata_col), F.col("__salt"))
        .withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= k)
        .withColumn("__rn2", F.row_number().over(w2))
        .where(F.col("__rn2") <= k)
        .drop("__salt", "__rn", "__rn2")
    )


def resample_by_rate(
    df: DataFrame, id_col: str, rate_col: str | Column, buckets: int = 100
) -> DataFrame:
    """Deterministic importance resampling: keep a row iff its stable
    hash bucket falls below a PER-ROW acceptance rate (an integer
    percentage column, typically derived from a quality score or
    density ratio) — the quality-weighted downsampling step of a
    training-data mixture (DoReMi/DSIR-style reweighting, applied as
    acceptance sampling). Unlike ``mix_sources`` the rate is a
    computed column, not a static per-source weight, so any scoring
    model output can drive it.

    Per-row decision, no shuffle, reproducible across runs,
    partitionings, and engines (md5 lottery, the ``hash_bucket``
    contract); expected kept fraction per stratum equals rate/buckets
    exactly in distribution and is exactly reproducible row-wise."""
    r = F.col(rate_col) if isinstance(rate_col, str) else rate_col
    return df.where(hash_bucket(id_col, buckets) < r)


def pps_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Exact-k probability-proportional-to-size sample WITHOUT
    replacement — sequential Poisson sampling (Ohlsson 1998, the
    πps design statistics agencies run): each row draws a uniform
    u from its id's md5 (the module's portable lottery) and the k
    smallest ``u / weight`` win, so inclusion probability tracks the
    weight while the SAME rows win on every engine, run, and
    partitioning. The deterministic complement of q131's band-rate
    acceptance sampling when the budget is an exact row count, not a
    rate. Rows with weight ≤ 0 are excluded (zero mass can't be
    sampled proportionally), as are NULL ids (a NULL key would sort
    NULLS-FIRST in Spark but NULLS-LAST in the DuckDB twin — the one
    spot the portability contract could silently diverge). Appends
    ``sample_key`` (u/weight — two IEEE divisions of exact
    integers, portable bit-for-bit).

    Scale: the key is a scan-side expression; the global k-smallest
    is orderBy+limit, which Spark executes as TakeOrdered (per-
    partition top-k, then a k-row driver merge) — no global sort, no
    full shuffle."""
    c = F.col(id_col)
    u = _md5_u32(c).cast("double") / F.lit(4294967296.0)
    key = u / F.col(weight_col).cast("double")
    return (
        df.where((F.col(weight_col) > 0) & c.isNotNull())
        .withColumn("sample_key", key)
        .orderBy("sample_key", id_col)
        .limit(k)
    )


def seeded_lottery(id_col: str | Column, seed: int) -> Column:
    """Seeded variant of the module lottery: first 8 md5 hex chars
    of ``seed ~ ':' ~ id`` as BIGINT in [0, 2³²). Different seeds
    give independent permutations of the same corpus; the DuckDB
    twin is ('0x' || substr(md5(seed || ':' || id), 1, 8))::BIGINT,
    so training-order shuffles stay reproducible outside Spark."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), c.cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")


def seeded_shuffle(df: DataFrame, id_col: str, seed: int) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    ``shuffle_key`` that is a pure function of (seed, id), and the
    result is totally ordered by (shuffle_key, id). Re-running —
    on a different partitioning, a different cluster, or a
    different ENGINE — reproduces byte-identical order, which
    ``orderBy(rand(seed))`` cannot promise (Spark's rand is
    partition-indexed). Epoch k = seed + k: independent
    permutations with zero state.

    Scale: the orderBy is a range-partitioned sort (sampled
    boundaries, no single-task window); writers consume it as
    repartitionByRange(shuffle_key) + sortWithinPartitions, so
    shards come out in globally sorted order. A contiguous global
    position, when a consumer genuinely needs one, is the q58
    dense-id two-phase path over shuffle_key — deliberately NOT
    computed here (a global row_number window would serialize the
    corpus through one task)."""
    return df.select(
        seeded_lottery(id_col, seed).alias("shuffle_key"), "*"
    ).orderBy("shuffle_key", id_col)


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list, k: int
) -> DataFrame:
    """Per-group cap: the first ``k`` rows of each group under a
    TOTAL order (pass tie-breaking id columns — a non-total order
    makes the kept set partition-dependent). The RefinedWeb-style
    domain-cap primitive: cap documents per registered domain /
    source so one crawl host cannot dominate the training mix.

    Returns the input columns plus the 1-based ``rk`` rank.

    Scale: one hash-partitioned window on the group keys — rows
    stream through WindowExec's spillable buffer. Group skew (one
    domain holding 10⁸ docs) bounds at the sort, not memory; for
    pathological single-group skew pre-filter with an approximate
    per-group threshold (the q90 two-phase posture) before the
    exact window."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def pps_sample_per_group(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    group_col: str,
    k: int,
) -> DataFrame:
    """:func:`pps_sample` applied independently inside every group:
    the k smallest ``u/weight`` keys PER GROUP win — the stratified
    πps design (k weight-proportional docs from EVERY source, where
    the global variant would let one heavy stratum absorb the whole
    budget). Same portable md5 lottery, same exclusions (weight ≤
    0, NULL ids), same bit-reproducibility contract; appends
    ``sample_key`` and the 1-based in-group ``rk``.

    Scale: the global TakeOrdered is replaced by one
    hash-partitioned window on the group key — Spark rewrites the
    rank-≤-k filter to WindowGroupLimit (per-partition group top-k
    before the exchange), so the shuffle carries at most k rows per
    group per input partition, not the corpus."""
    c = F.col(id_col)
    u = _md5_u32(c).cast("double") / F.lit(4294967296.0)
    key = u / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy("sample_key", id_col)
    return (
        df.where((F.col(weight_col) > 0) & c.isNotNull())
        .withColumn("sample_key", key)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def laplace_ln5(key: Column, seed: str) -> tuple[Column, Column]:
    """Seeded deterministic Laplace building blocks for
    differentially-private releases: returns ``(cdev, ln5)`` where
    ``cdev`` ∈ (−½, ½) is the md5-lottery uniform deviate centered
    at zero (u = (u32 + ½)/2³², never exactly ½, so the log argument
    is always positive) and ``ln5`` is the inverse-CDF log term
    ``ln(1 − 2·|cdev|)`` PINNED to integer 1e-5 units (the drift
    module's _ln5 convention — one libm call, engine-portable).
    The caller scales by its sensitivity/ε and adds:
    ``noise = −sign(cdev) · b · ln5 / 1e5``.

    Determinism is the point: the same key + seed yields the same
    noise forever, across runs, partitionings, and engines (DuckDB
    twin spelled with the same md5 prefix arithmetic), so a noisy
    release is reproducible and auditable while still Laplace(b)-
    distributed across keys."""
    u32 = _md5_u32(F.concat(F.lit(seed + ":"), key.cast("string")))
    cdev = (u32.cast("double") + F.lit(0.5)) / F.lit(4294967296.0) - F.lit(
        0.5
    )
    ln5 = (
        F.round(F.log(F.lit(1.0) - F.lit(2.0) * F.abs(cdev)) * 100000)
        .cast("bigint")
    )
    return cdev, ln5


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    seed: str = "dp-v1",
) -> DataFrame:
    """ε-differentially-private group counts via the seeded Laplace
    mechanism: exact per-group counts plus Laplace(1/ε) noise keyed
    on the group value (unit sensitivity — one row moves one count).
    Output: (group, n_true, noisy_n) — callers release ``noisy_n``
    and drop ``n_true`` at the trust boundary; both are kept here so
    the release job can log calibration.

    Scale: ONE partial-combining aggregate; the noise is a map-side
    projection on the (bounded) group rows. The noise column never
    touches row data — group-keyed, so releasing repeatedly does not
    average the noise away (the classic DP-release mistake)."""
    b = 1.0 / float(epsilon)
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    cdev, ln5 = laplace_ln5(F.col(group_col), seed)
    noise = F.round(
        -F.signum(cdev) * F.lit(b) * ln5.cast("double") / F.lit(100000.0)
    ).cast("bigint")
    return agg.select(
        group_col,
        "n_true",
        (F.col("n_true") + noise).alias("noisy_n"),
    )


# Poisson(1) CDF thresholds for the deterministic bootstrap: literal
# constants (not computed at runtime) so the Spark CASE chain and the
# DuckDB oracle compare against byte-identical doubles.
POISSON1_CDF = (
    0.3678794411714423,
    0.7357588823428846,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
)


def bootstrap_weight(
    id_col: str | Column, b_col: str | Column, seed: str = "bs-v1"
) -> Column:
    """Deterministic Poisson bootstrap multiplicity: the md5-lottery
    uniform for (seed, resample b, row id) pushed through the
    Poisson(1) inverse CDF as a literal-threshold CASE chain —
    Poisson bootstrap (Hanley & MacGibbon; the big-data bootstrap
    standard) because multiplicities become independent per row, so
    a resample is ONE map-side column instead of a sample-with-
    replacement shuffle. Deterministic: the same (seed, b, id)
    yields the same weight forever, on any engine spelling the same
    md5 arithmetic — resamples are reproducible and auditable."""
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    b = F.col(b_col) if isinstance(b_col, str) else b_col
    u32 = _md5_u32(
        F.concat(F.lit(seed + ":"), b.cast("string"), F.lit(":"),
                 i.cast("string"))
    )
    u = (u32.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    expr = F.when(u < F.lit(POISSON1_CDF[0]), F.lit(0))
    for k in range(1, len(POISSON1_CDF)):
        expr = expr.when(u < F.lit(POISSON1_CDF[k]), F.lit(k))
    return expr.otherwise(F.lit(len(POISSON1_CDF))).cast("int")
