"""Sketch-based approximate aggregates: error bounds the gate can't
hash-check."""

from cr_data_pipeline_project_spark.plans import all_queries


def test_approx_distinct_within_5pct(spark, sf_dir):
    row = all_queries()["q47_approx_distinct"](spark, sf_dir).collect()[0]
    approx, exact = row["approx_parts"], row["exact_parts"]
    assert exact > 0
    assert abs(approx - exact) / exact < 0.05, (approx, exact)


def test_tfidf_float_scores_tolerance(spark, sf_dir):
    """q85 (float tf·ln(N/df)) against an independent pandas
    recomputation: every returned score within 1e-6 relative, and the
    per-doc ranking consistent with the recomputed scores."""
    import math

    import pandas as pd

    rows = all_queries()["q85_tfidf_float_scores"](spark, sf_dir).collect()
    assert rows

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    toks = (
        docs.assign(term=docs["text"].str.lower().str.split(" "))
        .explode("term")[["doc_id", "term"]]
    )
    toks = toks[toks["term"] != ""]
    tf = toks.groupby(["doc_id", "term"]).size()
    df = toks.drop_duplicates().groupby("term").size()
    n_docs = docs["doc_id"].nunique()

    for r in rows:
        want_tf = int(tf.loc[(r["doc_id"], r["term"])])
        want_df = int(df.loc[r["term"]])
        assert (r["tf"], r["df"]) == (want_tf, want_df)
        want = want_tf * math.log(n_docs / want_df)
        assert abs(r["score"] - want) <= 1e-6 * max(1.0, abs(want)), (
            r, want,
        )
    # top-1 per doc matches the recomputed argmax score (ties by term)
    scores = (
        tf.reset_index(name="tf")
        .merge(df.reset_index(name="df"), on="term")
    )
    scores["score"] = scores["tf"] * (n_docs / scores["df"]).map(math.log)
    best = scores.sort_values(
        ["doc_id", "score", "term"], ascending=[True, False, True]
    ).groupby("doc_id").first()
    for r in rows:
        if r["rnk"] == 1:
            assert r["term"] == best.loc[r["doc_id"], "term"], r
