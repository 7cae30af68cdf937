"""End-to-end corpus curation: one-call chain with per-stage audit."""

from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.catalog import table
from cr_data_pipeline_project_spark.curation import curate_corpus


def test_curate_corpus_accounting_and_determinism(spark, sf_dir):
    docs = table(spark, "documents", sf_dir)
    holdout = docs.where(F.col("source") == "src6")
    train_side = docs.where(F.col("source") != "src6")

    curated, stats = curate_corpus(train_side, holdout=holdout)
    srows = {r.stage: r.n_dropped for r in stats.collect()}
    total = train_side.count()
    # audit sums to the input corpus
    assert sum(srows.values()) == total
    assert set(srows) == {"rules", "exact_dedup", "neardup", "decontam", "kept"}
    assert srows["kept"] > 0
    # split column present, only declared labels
    labels = {r.split for r in curated.select("split").distinct().collect()}
    assert labels <= {"train", "val", "test"}
    # deterministic end to end
    a = sorted((r.doc_id, r.split) for r in curated.select("doc_id", "split").collect())
    curated2, _ = curate_corpus(train_side, holdout=holdout)
    b = sorted((r.doc_id, r.split) for r in curated2.select("doc_id", "split").collect())
    assert a == b


def test_curate_corpus_stage_semantics(spark):
    base = (
        "the quick brown fox jumps over the lazy dog near the spark engine "
        "shuffling rows across partitions and joining tables with hash keys "
        "while the optimizer prunes columns and pushes filters to the scan"
    )
    rows = [
        (1, base, "en"),                       # kept
        (2, base, "en"),                       # exact dup of 1
        (3, base + " tail", "en"),             # near-dup of 1
        (4, "short", "en"),                    # rules: too short
        (5, base.replace("quick", "schnelle"), "zz"),  # rules: bad lang
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    curated, stats = curate_corpus(
        docs, min_chars=50, max_chars=1000, neardup_threshold=0.7
    )
    kept = sorted(r.doc_id for r in curated.select("doc_id").collect())
    assert kept == [1]
    srows = {r.stage: r.n_dropped for r in stats.collect()}
    assert srows == {
        "rules": 2,
        "exact_dedup": 1,
        "neardup": 1,
        "decontam": 0,
        "kept": 1,
    }


def test_curate_corpus_leakage_safe_split(spark):
    """With split_safety_threshold set, no surviving near-dup pair
    (at the SAFETY threshold) may straddle splits, and singleton
    docs must get exactly the plain doc-id split labels."""
    from cr_data_pipeline_project_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog near the spark "
        "engine shuffling rows across partitions and joining tables "
        "with hash keys while the optimizer prunes columns and pushes "
        "filters to the scan"
    )
    rows = [(i, f"{base} variant {i % 7} tail {i % 3}", "en") for i in range(200)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    curated, _ = curate_corpus(
        docs,
        min_chars=50,
        max_chars=1000,
        neardup_threshold=0.95,        # dedup bar: high — keeps variants
        split_safety_threshold=0.5,    # split safety: lower
        with_stats=False,
    )
    out = curated.select("doc_id", "split")
    pairs = minhash_lsh_pairs(
        curated, "text", "doc_id", threshold=0.5
    )
    crossing = (
        pairs.join(
            out.select(
                F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
            ),
            "doc_a",
        )
        .join(
            out.select(
                F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
            ),
            "doc_b",
        )
        .where(F.col("sa") != F.col("sb"))
        .count()
    )
    assert crossing == 0
    # default path unchanged: a corpus with no safety pairs splits
    # identically with and without the option
    lone = spark.createDataFrame(
        [(i, f"totally unique document number {i} " + " ".join(
            f"w{i}x{j}" for j in range(30)), "en") for i in range(50)],
        "doc_id long, text string, lang string",
    )
    a, _ = curate_corpus(
        lone, min_chars=10, max_chars=10_000, with_stats=False
    )
    b, _ = curate_corpus(
        lone, min_chars=10, max_chars=10_000,
        split_safety_threshold=0.5, with_stats=False,
    )
    assert sorted(map(tuple, a.select("doc_id", "split").collect())) == \
        sorted(map(tuple, b.select("doc_id", "split").collect()))


def test_curate_corpus_html_stage_zero(spark):
    """html_col= runs boilerplate extraction before the rules: the
    markup-wrapped corpus curates identically to the clean-text
    corpus (same survivors, same split), because stage 0 recovers
    the same text the rules would have seen."""
    from pyspark.sql import functions as F

    from cr_data_pipeline_project_spark.curation import curate_corpus

    base = [
        (i, "en", "word" + " tok" * 60 + f" doc{i}") for i in range(20)
    ]
    clean = spark.createDataFrame(base, "doc_id long, lang string, text string")
    wrapped = clean.select(
        "doc_id",
        "lang",
        F.concat(
            F.lit("<html><head><title>t</title><script>var a=1;</script>"
                  "</head><body><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).alias("page"),
    )
    a, _ = curate_corpus(
        clean, min_chars=10, max_chars=10_000, with_stats=False
    )
    b, _ = curate_corpus(
        wrapped.withColumn("text", F.lit(None).cast("string")),
        html_col="page",
        min_chars=10,
        max_chars=10_000,
        with_stats=False,
    )
    ka = {(r.doc_id, r.split) for r in a.collect()}
    kb = {(r.doc_id, r.split) for r in b.collect()}
    assert ka == kb and len(ka) > 0
