"""Round-2 curation operators: repetition ratio, PII redaction,
stratified sampling, sequence packing, int8 quantization."""

from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.operators import textstats
from cr_data_pipeline_project_spark.operators.sampling import (
    sequence_packing,
    stratified_sample,
)
from cr_data_pipeline_project_spark.operators.similarity import quantize_int8


def test_repetition_ratio_degenerate_doc(spark):
    rows = [
        (1, "spam spam spam spam spam spam"),   # one distinct 3-gram
        (2, "all words here are fully unique"), # no repeats
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textstats.repetition_ratio(df, "text").collect()}
    assert got[1]["n_grams"] == 4 and got[1]["n_distinct"] == 1
    assert got[1]["rep_ratio"] == 0.75
    assert got[2]["rep_ratio"] == 0.0


def test_pii_redact_masks_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail a.user@site.org or ring 123456 now"), (2, "clean text")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textstats.pii_redact(df, "text").collect()}
    assert got[1]["redacted"] == "mail <EMAIL> or ring <NUM> now"
    assert got[1]["n_redactions"] == 2
    assert got[2]["redacted"] == "clean text" and got[2]["n_redactions"] == 0


def test_stratified_sample_exact_k_and_deterministic(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("lang")
    )
    s1 = stratified_sample(df, "lang", "doc_id", 7)
    s2 = stratified_sample(df, "lang", "doc_id", 7)
    counts = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 7, "1": 7, "2": 7}
    assert sorted(r["doc_id"] for r in s1.collect()) == sorted(
        r["doc_id"] for r in s2.collect()
    )


def test_sequence_packing_bins_respect_capacity_estimate(spark):
    rows = [(i, "g", 100) for i in range(10)]  # 100 tokens each, cap 250
    df = spark.createDataFrame(rows, "doc_id long, grp string, n_tok int")
    out = sequence_packing(df, "grp", "doc_id", F.col("n_tok"), 250)
    bins = {r["doc_id"]: r["bin_idx"] for r in out.collect()}
    # exclusive prefix sums: 0,100,200,300,... → bins 0,0,0,1,1,2,2,2,3,3
    assert [bins[i] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]


def test_quantize_int8_roundtrip_error_bounded(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    row = quantize_int8(df).collect()[0]
    assert row["qvec"] == [64, -32, 0, 127]  # floor(x*127+0.5), -31.75→-32
    assert row["dequant_err"] <= 0.01
