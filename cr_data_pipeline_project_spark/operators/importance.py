"""DSIR-style hashed n-gram importance scoring (Xie et al. 2023,
"Data Selection via Importance Resampling", arXiv:2302.03169) — ONE
implementation shared by the batch report (plans/llm_queries.py:
q172_dsir_importance) and the streaming maintenance path
(streaming/incremental.py: feature partials + serve scoring), the
same single-kernel discipline as daily_count_anomaly.

The statistic: per hash bucket f of each bigram occurrence,
lambda_f = ln p_target(f) - ln p_raw(f) with add-1 smoothing; a
document scores its occurrence-weighted mean lambda. ln() wobbles
1 ulp across engines for ~3% of inputs (measured), so lambda is
pinned to integer 1e-5 units (``LAMBDA_SCALE``) and everything
downstream is BIGINT-exact — the property that lets the DuckDB
oracle hash-match and lets streamed partials aggregate without
float drift.

At 100 TB: the only corpus-sized shuffle carries (doc_id, f) ints
(the bucket hash is map-side); per-feature tables are
``buckets``-row frames that broadcast; raise ``buckets`` toward
DSIR's 10k as the corpus grows — still broadcast-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import ngram_positions
from .sampling import hash_bucket

# lambda lives in integer 1e-5 units: coarse enough that a 1-ulp
# ln() difference sits ~2e-10 (relative) from the nearest rounding
# half-boundary, fine enough that doc scores keep 5 significant
# decimals before their final 6-dp rounding.
LAMBDA_SCALE = 100_000


def bigram_feature_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    buckets: int = 256,
) -> DataFrame:
    """(id, lang, f, c): occurrence counts of md5-bucketed word
    bigrams per document — the working table every other kernel
    consumes. Bucketing uses the portable sampling.hash_bucket
    lottery so external systems (and the DuckDB oracle) can
    reproduce feature ids exactly."""
    return (
        ngram_positions(df, text_col, id_col, n=2)
        .join(df.select(id_col, lang_col), id_col)
        .groupBy(
            id_col, lang_col, hash_bucket(F.col("gram"), buckets).alias("f")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def per_feature_counts(
    docf: DataFrame, lang_col: str = "lang", target_lang: str = "en"
) -> DataFrame:
    """(f, rc, tc): raw and target bigram-occurrence totals per
    feature, in ONE pass over the doc-feature table. ADDITIVE —
    partials from disjoint document slices sum to the full-corpus
    table, which is what the streaming maintenance path relies on."""
    return docf.groupBy("f").agg(
        F.sum("c").alias("rc"),
        F.coalesce(
            F.sum(F.when(F.col(lang_col) == target_lang, F.col("c"))),
            F.lit(0),
        ).alias("tc"),
    )


def lambda_table(per_f: DataFrame, buckets: int = 256) -> DataFrame:
    """(f, lam5): the smoothed log-likelihood ratio per feature,
    pinned to integer ``LAMBDA_SCALE`` units, DENSE over all
    ``buckets`` feature ids — buckets unobserved in the fitting
    corpus get the add-1-smoothing default ln((r_tot+B)/(t_tot+B))
    rather than being absent. Density is what makes the table a
    MODEL: a serve-side consumer (streaming_dsir_score_append)
    scoring documents the fit never saw must find every bucket, or
    an inner join silently drops their grams (review-flagged). On
    the fitting corpus itself every gram's bucket is observed, so
    densification changes no batch result. Corpus totals come from
    the per-feature table itself (bounded input), never from
    another corpus pass."""
    spark = per_f.sparkSession
    dense = spark.range(buckets).select(
        F.col("id").cast("bigint").alias("f")  # hash_bucket emits bigint
    )
    per_f = dense.join(per_f, "f", "left").select(
        "f",
        F.coalesce("rc", F.lit(0)).alias("rc"),
        F.coalesce("tc", F.lit(0)).alias("tc"),
    )
    tot = per_f.agg(F.sum("rc").alias("r_tot"), F.sum("tc").alias("t_tot"))
    return per_f.crossJoin(F.broadcast(tot)).select(
        "f",
        F.round(
            (
                F.log(
                    (F.col("tc") + 1).cast("double")
                    / (F.col("t_tot") + buckets).cast("double")
                )
                - F.log(
                    (F.col("rc") + 1).cast("double")
                    / (F.col("r_tot") + buckets).cast("double")
                )
            )
            * LAMBDA_SCALE
        )
        .cast("bigint")
        .alias("lam5"),
    )


def dsir_scores(
    docf: DataFrame, lam: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_grams, dsir_score): occurrence-weighted mean lambda
    per document. BIGINT sums of c*lam5 products; the 6-digit
    half-up rounding of wsum5/(n_grams*1e5) is computed as exact
    BIGINT rational arithmetic — round_half_up(x, 6) with x =
    wsum5*10/n_grams means (20*wsum5 + n_grams) div (2*n_grams),
    sign-split so truncating div is away-from-zero like both
    engines' ROUND. Rounding the IEEE quotient instead is 1-ulp
    luck: a corpus whose score lands exactly on a half boundary
    (wsum5=47943, n_grams=60 → 0.0079905 — const adversary, round
    11) rounds differently per engine. The final r/1e6 division is
    one exact small-integer IEEE op, identical everywhere."""
    w = (
        docf.join(F.broadcast(lam), "f")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_grams"),
            F.sum(F.col("c") * F.col("lam5")).alias("wsum5"),
        )
    )
    r6 = F.when(
        F.col("wsum5") >= 0,
        F.expr("(20 * wsum5 + n_grams) div (2 * n_grams)"),
    ).otherwise(-F.expr("(20 * -wsum5 + n_grams) div (2 * n_grams)"))
    return w.select(
        id_col,
        "n_grams",
        (r6.cast("double") / F.lit(1_000_000.0)).alias("dsir_score"),
    )
