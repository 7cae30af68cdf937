"""Hash-split determinism: the property randomSplit lacks."""

from cr_data_pipeline_project_spark.operators.sampling import hash_split


def test_split_stable_under_repartitioning(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            df.repartition(17), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert a == b  # same id → same split, any partitioning


def test_split_fractions_roughly_hold(spark):
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    counts = {
        r["split"]: r["n"]
        for r in hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.8) < 0.05
    assert abs(counts["val"] / 5000 - 0.1) < 0.03
    assert abs(counts["test"] / 5000 - 0.1) < 0.03


def test_mix_sources_deterministic_and_weighted(spark):
    from cr_data_pipeline_project_spark.operators.sampling import mix_sources

    rows = [(i, "heavy" if i % 2 == 0 else "light") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept1 = {
        r["doc_id"]
        for r in mix_sources(df, "doc_id", "source", {"heavy": 1.0, "light": 0.2}).collect()
    }
    kept2 = {
        r["doc_id"]
        for r in mix_sources(
            df.repartition(9), "doc_id", "source", {"heavy": 1.0, "light": 0.2}
        ).collect()
    }
    assert kept1 == kept2  # partitioning-independent
    heavy = sum(1 for i in kept1 if i % 2 == 0)
    light = len(kept1) - heavy
    assert heavy == 1000  # weight 1.0 keeps everything
    assert abs(light / 1000 - 0.2) < 0.05
    # default weight drops unknown sources entirely
    df2 = spark.createDataFrame([(1, "mystery")], "doc_id long, source string")
    assert mix_sources(df2, "doc_id", "source", {"heavy": 1.0}).count() == 0


def test_splits_are_disjoint_and_total(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", {"train": 0.5, "test": 0.5})
    assert out.count() == 1000
    assert out.where("split NOT IN ('train','test')").count() == 0


def test_stratified_scale_twin_identical(spark, sf_dir):
    """Two-phase salted top-k must equal the single-window sample
    exactly — same winners, any partitioning."""
    from cr_data_pipeline_project_spark.catalog import table
    from cr_data_pipeline_project_spark.operators.sampling import (
        stratified_sample,
        stratified_sample_scale,
    )

    docs = table(spark, "documents", sf_dir)
    a = sorted(
        (r.lang, r.doc_id)
        for r in stratified_sample(docs, "lang", "doc_id", 7).collect()
    )
    b = sorted(
        (r.lang, r.doc_id)
        for r in stratified_sample_scale(
            docs, "lang", "doc_id", 7, n_salts=5
        ).collect()
    )
    assert a == b
    assert len(a) > 0


def test_resample_by_rate_deterministic_and_rate_obeyed(spark):
    """Per-row acceptance sampling: kept set is exactly the rows
    whose hash bucket falls under their OWN rate column, stable
    under repartitioning; rate 0 keeps nothing, rate 100 keeps
    everything."""
    from pyspark.sql import functions as F

    from cr_data_pipeline_project_spark.operators.sampling import (
        hash_bucket,
        resample_by_rate,
    )

    df = spark.range(0, 3000).withColumnRenamed("id", "doc_id").withColumn(
        "rate",
        F.when(F.col("doc_id") % 3 == 0, F.lit(0))
        .when(F.col("doc_id") % 3 == 1, F.lit(40))
        .otherwise(F.lit(100)),
    )
    kept = {r["doc_id"] for r in resample_by_rate(df, "doc_id", "rate").collect()}
    again = {
        r["doc_id"]
        for r in resample_by_rate(df.repartition(13), "doc_id", "rate").collect()
    }
    assert kept == again  # partitioning-invariant

    buckets = {
        r["doc_id"]: r["b"]
        for r in df.withColumn("b", hash_bucket("doc_id")).collect()
    }
    for i in range(3000):
        want = (i % 3 == 2) or (i % 3 == 1 and buckets[i] < 40)
        assert (i in kept) == want, i
    n_mid = sum(1 for i in kept if i % 3 == 1)
    assert 0.25 * 1000 < n_mid < 0.55 * 1000  # ~40% of the 1000 mid rows


def test_pps_sample_exact_k_deterministic_positive_weights(spark):
    from cr_data_pipeline_project_spark.operators.sampling import pps_sample

    df = spark.createDataFrame(
        [(i, float(i % 7) - 1.0) for i in range(300)], "id long, w double"
    )
    got = pps_sample(df, "id", "w", k=50)
    rows = got.collect()
    assert len(rows) == 50
    assert all(r["w"] > 0 for r in rows)          # nonpositive excluded
    assert all(r["sample_key"] > 0 for r in rows)
    again = {r["id"] for r in pps_sample(df, "id", "w", k=50).collect()}
    assert again == {r["id"] for r in rows}        # deterministic

    # inclusion tracks weight: sampling the SAME population with all
    # weights doubled changes no winner (keys scale uniformly) …
    doubled = df.selectExpr("id", "w * 2 AS w")
    same = {r["id"] for r in pps_sample(doubled, "id", "w", 50).collect()}
    assert same == again
    # … while boosting ONE loser's weight 1000x pulls it in
    loser = (
        df.where("w > 0")
        .join(got.select("id"), "id", "left_anti")
        .limit(1)
        .collect()[0]["id"]
    )
    boosted = df.selectExpr(
        "id", f"CASE WHEN id = {loser} THEN w * 1000 ELSE w END AS w"
    )
    assert loser in {
        r["id"] for r in pps_sample(boosted, "id", "w", 50).collect()
    }


def test_seeded_shuffle_deterministic_and_seed_independent(spark):
    """The shuffle order is a pure function of (seed, id): stable
    across repartitionings, different across seeds, and the key
    matches the portable md5 formula."""
    import hashlib

    from cr_data_pipeline_project_spark.operators.sampling import (
        seeded_shuffle,
    )

    df = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    a = [r["doc_id"] for r in seeded_shuffle(df, "doc_id", 7).collect()]
    b = [
        r["doc_id"]
        for r in seeded_shuffle(df.repartition(13), "doc_id", 7).collect()
    ]
    c = [r["doc_id"] for r in seeded_shuffle(df, "doc_id", 8).collect()]
    assert a == b  # partitioning-independent
    assert a != c  # seed changes the permutation
    assert sorted(a) == list(range(50))  # it IS a permutation

    # the key matches the documented md5 convention
    row = seeded_shuffle(df, "doc_id", 7).where("doc_id = 3").first()
    expect = int(hashlib.md5(b"7:3").hexdigest()[:8], 16)
    assert row["shuffle_key"] == expect


def test_top_k_per_group_total_order(spark):
    """Per-group cap keeps exactly k rows under the total order and
    breaks score ties on the id column."""
    from pyspark.sql import functions as F

    from cr_data_pipeline_project_spark.operators.sampling import (
        top_k_per_group,
    )

    rows = [
        ("a", 1, 0.9), ("a", 2, 0.9), ("a", 3, 0.5), ("a", 4, 0.1),
        ("b", 5, 0.2),
    ]
    df = spark.createDataFrame(rows, "src string, id int, score double")
    got = top_k_per_group(
        df, ["src"], [F.desc("score"), F.col("id")], 2
    ).collect()
    kept = {(r["src"], r["id"]): r["rk"] for r in got}
    assert kept == {("a", 1): 1, ("a", 2): 2, ("b", 5): 1}


def test_leakage_safe_split_keeps_pairs_together(spark, sf_dir):
    """The q205 invariant the oracle can't state: EVERY near-dup
    pair's two members carry the same split label (no train/test
    leakage through paraphrases), and singleton docs get exactly
    q52's row-level label (component_id == doc_id degrades to the
    plain hash split)."""
    from cr_data_pipeline_project_spark.operators import dedup
    from cr_data_pipeline_project_spark.operators.sampling import (
        split_column,
    )
    from cr_data_pipeline_project_spark.catalog import table
    from cr_data_pipeline_project_spark.plans import all_queries
    from pyspark.sql import functions as F

    qs = all_queries()
    out = {
        r["doc_id"]: (r["component_id"], r["split"])
        for r in qs["q205_leakage_safe_split"](spark, sf_dir).collect()
    }
    docs = table(spark, "documents", sf_dir)
    pairs = dedup.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=5, threshold=0.5
    ).collect()
    assert pairs, "fixture should contain planted near-dups"
    for r in pairs:
        assert out[r["doc_a"]][1] == out[r["doc_b"]][1]

    # singletons degrade to the row-level q52 lottery
    singles = [d for d, (c, _) in out.items() if c == d]
    ref = {
        r["doc_id"]: r["split"]
        for r in docs.select(
            "doc_id",
            split_column(
                F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}
            ).alias("split"),
        ).collect()
    }
    clustered = {
        d for r in pairs for d in (r["doc_a"], r["doc_b"])
    }
    for d in singles:
        if d not in clustered:
            assert out[d][1] == ref[d]


def test_dp_noisy_counts_deterministic_and_scaled(spark):
    """Seeded Laplace release: bit-identical across runs, noise
    magnitude scales like 1/epsilon, and the noise matches the
    md5-lottery inverse-CDF computed independently in Python."""
    import hashlib
    import math

    from cr_data_pipeline_project_spark.operators.sampling import (
        dp_noisy_counts,
    )

    df = spark.createDataFrame(
        [(f"s{i % 7}", i) for i in range(200)], "source string, x int"
    )
    r1 = {
        r.source: (r.n_true, r.noisy_n)
        for r in dp_noisy_counts(df, "source", epsilon=0.5).collect()
    }
    r2 = {
        r.source: (r.n_true, r.noisy_n)
        for r in dp_noisy_counts(
            df.repartition(13), "source", epsilon=0.5
        ).collect()
    }
    assert r1 == r2  # partitioning-independent, rerun-stable

    for source, (n_true, noisy_n) in r1.items():
        u32 = int(
            hashlib.md5(f"dp-v1:{source}".encode()).hexdigest()[:8], 16
        )
        cdev = (u32 + 0.5) / 4294967296.0 - 0.5
        ln5 = round(math.log(1.0 - 2.0 * abs(cdev)) * 100000)
        want = n_true + round(-math.copysign(1.0, cdev) * 2.0 * ln5 / 100000.0)
        assert noisy_n == want, source

    # epsilon=5 noise is 10x smaller than epsilon=0.5 noise
    hi = {
        r.source: abs(r.noisy_n - r.n_true)
        for r in dp_noisy_counts(df, "source", epsilon=5.0).collect()
    }
    lo = {s: abs(n - t) for s, (t, n) in r1.items()}
    assert sum(hi.values()) <= sum(lo.values())


def test_bootstrap_weight_poisson1_properties(spark):
    """Poisson(1) multiplicities: mean ~1, P(0) ~ 1/e, deterministic
    across partitionings, and resamples are mutually distinct."""
    import math

    from pyspark.sql import functions as F

    from cr_data_pipeline_project_spark.operators.sampling import (
        bootstrap_weight,
    )

    df = spark.range(0, 20000).select(
        F.col("id"), F.explode(F.sequence(F.lit(0), F.lit(3))).alias("b")
    )
    w = df.select("id", "b", bootstrap_weight("id", "b").alias("w"))
    stats = w.groupBy("b").agg(
        F.avg("w").alias("m"),
        F.avg((F.col("w") == 0).cast("double")).alias("p0"),
    ).collect()
    for r in stats:
        assert abs(r.m - 1.0) < 0.03
        assert abs(r.p0 - math.exp(-1)) < 0.02
    a = sorted(w.collect(), key=lambda r: (r.b, r.id))
    b2 = sorted(
        w.repartition(17).collect(), key=lambda r: (r.b, r.id)
    )
    assert [(r.b, r.id, r.w) for r in a] == [(r.b, r.id, r.w) for r in b2]
    by_b = {}
    for r in a:
        by_b.setdefault(r.b, []).append(r.w)
    assert by_b[0] != by_b[1]  # resamples differ
