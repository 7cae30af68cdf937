"""Count-min sketch (operators/sketches.py): the CMS contract —
one-sided error, exactness at sufficient width, cell-wise merge
additivity, heavy-hitter recovery."""

from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.operators import sketches


def _events(spark):
    # 1 heavy key (200 rows), a mid key (50), long tail of 100 keys
    rows = (
        [(1,)] * 200 + [(2,)] * 50 + [(100 + i,) for i in range(100)]
    )
    return spark.createDataFrame(rows, "k long")


def test_cms_one_sided_and_exact_at_width(spark):
    """est ≥ true for every key; with width ≫ distinct keys the
    probability of any collision across all 5 rows is negligible —
    and min-over-depth needs only ONE collision-free row, so
    estimates are exact here."""
    df = _events(spark)
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    part = sketches.cms_partials(df, "k", depth=5, width=16384)
    est = {
        r["k"]: r["est"]
        for r in sketches.cms_estimate(
            part, df.select("k"), "k", depth=5, width=16384
        ).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    assert est == exact  # exact at this width/key-count


def test_cms_overestimates_under_collisions_never_under(spark):
    """A deliberately tiny sketch (width 8) forces collisions: the
    one-sided bound must still hold on every key."""
    df = _events(spark)
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    est = {
        r["k"]: r["est"]
        for r in sketches.cms_estimate(
            sketches.cms_partials(df, "k", depth=3, width=8),
            df.select("k"),
            "k",
            depth=3,
            width=8,
        ).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)
    assert any(est[k] > exact[k] for k in exact)  # collisions real


def test_cms_partials_merge_additively(spark):
    """Sketch(union) == cellwise-sum(Sketch(a), Sketch(b)) — the
    property streaming/micro-batch rollups rely on."""
    df = _events(spark).withColumn(
        "half", (F.col("k") % 2 == 0).cast("int")
    )
    a = sketches.cms_partials(df.where("half = 0"), "k", 4, 64)
    b = sketches.cms_partials(df.where("half = 1"), "k", 4, 64)
    merged = (
        a.unionByName(b)
        .groupBy("d", "b")
        .agg(F.sum("c").alias("c"))
    )
    full = sketches.cms_partials(df, "k", 4, 64)
    key = lambda rows: {(r["d"], r["b"]): r["c"] for r in rows}
    assert key(merged.collect()) == key(full.collect())


def test_cms_topk_recovers_planted_heavy_hitter(spark):
    df = _events(spark)
    top = sketches.cms_topk(df, "k", k=2, depth=5, width=4096).collect()
    assert [r["k"] for r in top] == [1, 2]
    assert top[0]["est"] >= 200 and top[1]["est"] >= 50


def test_cms_weighted_counts_measure_not_rows(spark):
    rows = [(1, 10), (1, 30), (2, 5)]
    df = spark.createDataFrame(rows, "k long, bytes long")
    est = {
        r["k"]: r["est"]
        for r in sketches.cms_estimate(
            sketches.cms_partials(df, "k", 4, 1024, weight_col="bytes"),
            df.select("k"),
            "k",
            4,
            1024,
        ).collect()
    }
    assert est[1] == 40 and est[2] == 5
