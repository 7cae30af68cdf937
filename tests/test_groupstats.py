"""Group-wise z-score: exact vs applyInPandas agreement."""

from cr_data_pipeline_project_spark.catalog import table
from cr_data_pipeline_project_spark.operators.groupstats import (
    zscore_exact,
    zscore_pandas,
)


def test_exact_and_pandas_agree(spark, sf_dir):
    ev = table(spark, "events", sf_dir)
    a = {
        r["event_id"]: r["zscore"]
        for r in zscore_exact(ev, "event_type", "value", "event_id").collect()
    }
    b = {
        r["event_id"]: r["zscore"]
        for r in zscore_pandas(ev, "event_type", "value", "event_id").collect()
    }
    assert set(a) == set(b) and len(a) == ev.count()
    worst = max(abs(a[k] - b[k]) for k in a)
    assert worst <= 1e-6, worst  # both rounded to 6dp; ties may differ 1ulp


def test_zscore_moments(spark, sf_dir):
    import math

    ev = table(spark, "events", sf_dir)
    rows = zscore_exact(ev, "event_type", "value", "event_id").collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["zscore"])
    for vals in by_type.values():
        n = len(vals)
        assert abs(sum(vals) / n) < 1e-3  # mean ≈ 0
        var = sum(v * v for v in vals) / (n - 1)
        assert abs(var - 1.0) < 1e-2  # variance ≈ 1
        assert all(not math.isnan(v) for v in vals)


def test_anomaly_gate_rejects_float_threshold(spark, sf_dir):
    """The exact-integer gate squares z_threshold against BIGINT
    moments — a float caller must fail loudly, not silently demote
    the cross-engine bit-exactness contract (round-6 advisory)."""
    import pytest

    from cr_data_pipeline_project_spark.operators.groupstats import (
        daily_count_anomaly,
    )

    ev = table(spark, "events", sf_dir)
    daily = ev.groupBy(
        ev.event_type, ev.ts.cast("date").alias("d")
    ).count().withColumnRenamed("count", "c")
    with pytest.raises(TypeError, match="z_threshold must be int"):
        daily_count_anomaly(daily, z_threshold=2.5)
    with pytest.raises(TypeError, match="z_threshold must be int"):
        daily_count_anomaly(daily, z_threshold=True)


def test_grouped_doubled_ranks_matches_window_formulation(spark):
    """The q58/q195-pattern scale path must produce bit-identical
    BIGINT doubled ranks (2*rank() + count(ties) - 1 per group) to
    the low-parallelism Window.partitionBy(group) formulation it
    replaces — ties, singleton groups, negative values and all."""
    import random

    from pyspark.sql import Window, functions as F

    from cr_data_pipeline_project_spark.operators.groupstats import (
        grouped_doubled_ranks,
    )

    rng = random.Random(239)
    rows = [
        (g, rng.choice([-3, 0, 1, 2, 2, 5, 7, 7, 7, 11]))
        for g in "ABC"
        for _ in range(200)
    ] + [("SINGLETON", 42)]
    df = spark.createDataFrame(rows, "g string, v long").repartition(8)

    counts = df.groupBy("g", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    got = {
        (r.g, r.v): (r.cnt, r.r2)
        for r in grouped_doubled_ranks(counts, "g", "v", "cnt").collect()
    }

    w = Window.partitionBy("g").orderBy("v")
    cw = Window.partitionBy("g", "v")
    want = {
        (r.g, r.v): (r.cnt, r.r2)
        for r in df.select(
            "g",
            "v",
            F.count(F.lit(1)).over(cw).cast("long").alias("cnt"),
            (2 * F.rank().over(w) + F.count(F.lit(1)).over(cw) - 1)
            .cast("long")
            .alias("r2"),
        )
        .distinct()
        .collect()
    }
    assert got == want
    # mean doubled rank over each group's rows must be n+1 exactly
    for g in "ABC":
        n = sum(c for (gg, _), (c, _) in got.items() if gg == g)
        tot = sum(c * r for (gg, _), (c, r) in got.items() if gg == g)
        assert tot == n * (n + 1)


def test_isotonic_fit_matches_pure_python_pava(spark):
    """isotonic_fit_stats vs an independent pure-Python PAVA on a
    fixed fixture: identical block counts and MSEs; fitted map is
    monotone; isotonic MSE never exceeds the constant-predictor
    MSE; a perfectly monotone group collapses to mse_after=0."""
    import random

    from cr_data_pipeline_project_spark.operators.groupstats import (
        isotonic_fit_stats,
    )

    rng = random.Random(270)
    rows = []
    for g, flip in (("a", 0.3), ("b", 0.05)):
        for i in range(300):
            x = i / 300.0
            y = 1 if (x > 0.5) ^ (rng.random() < flip) else 0
            rows.append((g, round(x, 4), y, i))
    rows += [("mono", 0.1, 0, 0), ("mono", 0.2, 0, 1),
             ("mono", 0.3, 1, 2), ("mono", 0.4, 1, 3)]
    df = spark.createDataFrame(rows, "g string, x double, y int, i int")
    got = {
        r.g: r for r in isotonic_fit_stats(df, "g", "x", "y").collect()
    }

    def pava(pairs):
        pairs = sorted(pairs)
        ys = [y for _, y in pairs]
        mean = sum(ys) / len(ys)
        before = sum((v - mean) ** 2 for v in ys) / len(ys)
        sums, cnts = [], []
        for v in ys:
            cs, cc = float(v), 1
            while sums and sums[-1] * cc >= cs * cnts[-1]:
                cs += sums.pop()
                cc += cnts.pop()
            sums.append(cs)
            cnts.append(cc)
        fitted = [s / c for s, c in zip(sums, cnts) for _ in range(c)]
        means = [s / c for s, c in zip(sums, cnts)]
        assert means == sorted(means)  # monotone fit
        after = sum((v - f) ** 2 for v, f in zip(ys, fitted)) / len(ys)
        return len(ys), len(sums), round(before, 6), round(after, 6)

    by_g = {}
    for g, x, y, _ in rows:
        by_g.setdefault(g, []).append((x, y))
    for g, pairs in by_g.items():
        n, blocks, before, after = pava(pairs)
        r = got[g]
        assert (r.n, r.n_blocks) == (n, blocks), g
        assert (r.mse_before, r.mse_after) == (before, after), g
        assert r.mse_after <= r.mse_before
    assert got["mono"].mse_after == 0.0 and got["mono"].n_blocks == 2


def test_ordered_prefix_sum_matches_global_window(spark):
    """ordered_prefix_sum must equal the single-partition
    Window.orderBy cumulative sum it replaces — inclusive and
    exclusive, with ties broken by the full order key."""
    import random

    from pyspark.sql import Window, functions as F

    from cr_data_pipeline_project_spark.operators.groupstats import (
        ordered_prefix_sum,
    )

    rng = random.Random(271)
    rows = [(i, rng.choice([5, 10, 10, 25]), rng.randrange(100))
            for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long, k long").repartition(16)

    for inclusive in (True, False):
        got = {
            r.id: float(r.rt)
            for r in ordered_prefix_sum(
                df, ["k", "id"], "v", "rt", inclusive=inclusive
            ).collect()
        }
        end = Window.currentRow if inclusive else -1
        w = Window.orderBy("k", "id").rowsBetween(
            Window.unboundedPreceding, end
        )
        want = {
            r.id: float(r.rt)
            for r in df.select(
                "id",
                F.coalesce(
                    F.sum(F.col("v").cast("decimal(38,6)")).over(w),
                    F.lit(0).cast("decimal(38,6)"),
                ).alias("rt"),
            ).collect()
        }
        assert got == want


def test_isotonic_chunked_matches_single_batch(spark):
    """The chunked (x-range pre-split + block merge) path must equal
    the single-batch fit: PAVA pooling is associative over
    contiguous segments. Exact on n/n_blocks; MSEs agree to float
    tolerance (block moments vs numpy residuals)."""
    import random

    import pytest

    from cr_data_pipeline_project_spark.operators.groupstats import (
        isotonic_fit_stats,
    )

    rng = random.Random(1010)
    rows = []
    for g in ("a", "b"):
        for i in range(2000):
            x = rng.random()
            # noisy monotone-ish signal with plateaus and reversals
            y = x + rng.choice((-0.4, -0.1, 0.0, 0.1, 0.4))
            rows.append((g, round(x, 6), round(y, 6)))
    # adversarial: strictly DECREASING group — every row pools into
    # one block globally, but each chunk emits its own single block
    rows += [("dec", i / 100.0, 1.0 - i / 100.0) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, x double, y double")

    single = {r.g: r for r in isotonic_fit_stats(df, "g", "x", "y").collect()}
    for k in (2, 7):
        chunked = {
            r.g: r
            for r in isotonic_fit_stats(df, "g", "x", "y", n_chunks=k).collect()
        }
        assert set(chunked) == set(single)
        for g, r in chunked.items():
            s = single[g]
            assert (r.n, r.n_blocks) == (s.n, s.n_blocks), (g, k)
            assert r.mse_before == pytest.approx(s.mse_before, abs=2e-6)
            assert r.mse_after == pytest.approx(s.mse_after, abs=2e-6)
    assert single["dec"].n_blocks == 1


def test_isotonic_giant_batch_guard_is_loud(spark):
    """With auto_chunk off, a group bigger than max_batch_rows fails
    LOUDLY (round-9 verdict #5: never silently OOM one worker) and
    the error carries a usable n_chunks hint — and the same data
    fits fine once n_chunks splits it."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from cr_data_pipeline_project_spark.operators.groupstats import (
        isotonic_fit_stats,
    )

    df = spark.createDataFrame(
        [("g", i / 500.0, float(i % 7)) for i in range(500)],
        "g string, x double, y double",
    )
    with pytest.raises(PythonException, match=r"n_chunks=10"):
        isotonic_fit_stats(
            df, "g", "x", "y", max_batch_rows=100, auto_chunk=False
        ).collect()
    ok = isotonic_fit_stats(
        df, "g", "x", "y", n_chunks=8, max_batch_rows=200
    ).collect()
    assert ok[0].n == 500


def test_isotonic_auto_chunk_self_heals(spark):
    """Round-10 verdict #3: an over-limit group must succeed WITHOUT
    the caller passing n_chunks — the default auto_chunk pre-pass
    derives it from the largest group's row count, and the result
    equals the unconstrained single-batch fit."""
    import pytest

    from cr_data_pipeline_project_spark.operators.groupstats import (
        isotonic_fit_stats,
    )

    import random

    rng = random.Random(1102)
    rows = [
        ("big", rng.random(), rng.random()) for _ in range(900)
    ] + [("small", i / 10.0, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    want = {
        r.g: r for r in isotonic_fit_stats(df, "g", "x", "y").collect()
    }
    healed = {
        r.g: r
        for r in isotonic_fit_stats(
            df, "g", "x", "y", max_batch_rows=200
        ).collect()
    }
    assert set(healed) == {"big", "small"}
    for g, r in healed.items():
        s = want[g]
        assert (r.n, r.n_blocks) == (s.n, s.n_blocks), g
        assert r.mse_before == pytest.approx(s.mse_before, abs=2e-6)
        assert r.mse_after == pytest.approx(s.mse_after, abs=2e-6)


def test_isotonic_null_x_raises_both_paths(spark):
    """Round-10 ADVICE: null x ordered differently in the two paths
    (pandas sorts NaN last; the chunk router sent it to chunk 0) —
    now BOTH paths reject null x (and null y, which would silently
    poison the moment sums) loudly."""
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from cr_data_pipeline_project_spark.operators.groupstats import (
        isotonic_fit_stats,
    )

    rows = [("g", float(i), float(i % 3)) for i in range(50)]
    df_nullx = spark.createDataFrame(
        rows + [("g", None, 1.0)], "g string, x double, y double"
    )
    df_nully = spark.createDataFrame(
        rows + [("g", 3.5, None)], "g string, x double, y double"
    )
    for df in (df_nullx, df_nully):
        with pytest.raises(PythonException, match="null"):
            isotonic_fit_stats(df, "g", "x", "y").collect()
        with pytest.raises(PythonException, match="null"):
            isotonic_fit_stats(df, "g", "x", "y", n_chunks=4).collect()


def test_isotonic_chunked_large_mean_no_cancellation(spark):
    """Round-10 ADVICE: raw moments Σy² − (Σy)²/n cancel
    catastrophically when |mean(y)| >> spread; the chunked path now
    centers y on a global pivot before accumulating, so it must
    match the single-batch numpy-residual MSEs at 6 dp even with
    y ≈ 1e8 and unit spread."""
    import random

    import pytest

    from cr_data_pipeline_project_spark.operators.groupstats import (
        isotonic_fit_stats,
    )

    rng = random.Random(4242)
    base = 1.0e8
    rows = [
        ("g", round(rng.random(), 6), base + round(rng.random(), 6))
        for _ in range(1500)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    single = isotonic_fit_stats(df, "g", "x", "y").collect()[0]
    for k in (3, 9):
        chunked = isotonic_fit_stats(
            df, "g", "x", "y", n_chunks=k
        ).collect()[0]
        assert (chunked.n, chunked.n_blocks) == (single.n, single.n_blocks)
        assert chunked.mse_before == pytest.approx(
            single.mse_before, abs=2e-6
        )
        assert chunked.mse_after == pytest.approx(single.mse_after, abs=2e-6)
    # sanity: the spread really is unit-scale against a 1e8 offset
    assert 0.0 < single.mse_before < 1.0


def test_isotonic_nonstring_group_key(spark):
    """Output schema derives the group column's real type (ADVICE
    r9): an int-keyed group round-trips as int."""
    from cr_data_pipeline_project_spark.operators.groupstats import (
        isotonic_fit_stats,
    )

    df = spark.createDataFrame(
        [(7, 0.1, 0.0), (7, 0.2, 1.0), (8, 0.1, 1.0), (8, 0.2, 0.0)],
        "g int, x double, y double",
    )
    out = isotonic_fit_stats(df, "g", "x", "y")
    assert dict(out.dtypes)["g"] == "int"
    got = {r.g: r for r in out.collect()}
    assert got[7].n_blocks == 2 and got[8].n_blocks == 1


def test_isotonic_chunked_property(spark):
    """Hypothesis-style randomized sweep (seeded loop — one Spark
    session, many small cases beats @given re-entering Spark): for
    random (x, y) data with ties, duplicates, plateaus and random
    chunk counts, the chunked fit must equal the single-batch fit
    exactly on (n, n_blocks) and to float tolerance on MSEs, and
    both must equal the pure-Python stack replica."""
    import random

    import pytest

    from cr_data_pipeline_project_spark.operators.groupstats import (
        isotonic_fit_stats,
    )

    rng = random.Random(2718)

    def replica(pairs):
        pairs = sorted(pairs)
        ys = [float(y) for _, y in pairs]
        sums, cnts = [], []
        for v in ys:
            cs, cc = v, 1
            while sums and sums[-1] * cc >= cs * cnts[-1]:
                cs += sums.pop()
                cc += cnts.pop()
            sums.append(cs)
            cnts.append(cc)
        fitted = [s / c for s, c in zip(sums, cnts) for _ in range(c)]
        mean = sum(ys) / len(ys)
        before = sum((v - mean) ** 2 for v in ys) / len(ys)
        after = sum((v - f) ** 2 for v, f in zip(ys, fitted)) / len(ys)
        return len(ys), len(sums), before, after

    for case in range(6):
        n = rng.randint(5, 400)
        # coarse grids force x-ties and y-plateaus (the PAVA edge
        # cases); occasional wide y forces deep pooling
        xg = rng.choice((5, 17, 1000))
        yg = rng.choice((2, 3, 100))
        rows = [
            (f"g{case}", rng.randint(0, xg) / xg, float(rng.randint(0, yg)))
            for _ in range(n)
        ]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        want = replica([(x, y) for _, x, y in rows])
        single = isotonic_fit_stats(df, "g", "x", "y").collect()[0]
        assert (single.n, single.n_blocks) == want[:2], case
        assert single.mse_before == pytest.approx(want[2], abs=2e-6)
        assert single.mse_after == pytest.approx(want[3], abs=2e-6)
        k = rng.choice((2, 3, 5, 11))
        chunked = isotonic_fit_stats(df, "g", "x", "y", n_chunks=k).collect()[0]
        assert (chunked.n, chunked.n_blocks) == want[:2], (case, k)
        assert chunked.mse_before == pytest.approx(want[2], abs=2e-6)
        assert chunked.mse_after == pytest.approx(want[3], abs=2e-6)
