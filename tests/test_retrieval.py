"""BM25 retrieval (operators/retrieval.py): score parity against an
independent pandas recomputation, index-reuse equivalence, and the
posting-build contract q153's oracle can't see (full-table shape)."""

import math

import pandas as pd
import pytest

from cr_data_pipeline_project_spark.operators import retrieval
from cr_data_pipeline_project_spark.plans import all_queries


def _reference_bm25(sf_dir, terms, k1=1.2, b=0.75):
    """Independent BM25: pandas + math.log, no Spark code shared."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    tok = docs.assign(toks=docs["text"].str.lower().str.split(" "))
    tok["toks"] = tok["toks"].map(lambda ts: [t for t in ts if t])
    dl = tok.set_index("doc_id")["toks"].map(len)
    avgdl = dl.sum() / len(dl)
    n_docs = len(docs)
    scores: dict[int, float] = {}
    hits: dict[int, int] = {}
    for term in terms:
        tf = tok.set_index("doc_id")["toks"].map(
            lambda ts: sum(1 for t in ts if t == term)
        )
        tf = tf[tf > 0]
        df = len(tf)
        if df == 0:
            continue
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for doc_id, f in tf.items():
            norm = k1 * (1.0 - b + b * dl.loc[doc_id] / avgdl)
            contrib = idf * (f * (k1 + 1.0) / (f + norm))
            scores[doc_id] = scores.get(doc_id, 0.0) + contrib
            hits[doc_id] = hits.get(doc_id, 0) + 1
    return scores, hits


TERMS = ["spark", "join", "window", "vector"]


def test_bm25_scores_match_reference(spark, sf_dir):
    rows = all_queries()["q154_bm25_topk"](spark, sf_dir).collect()
    assert rows
    want_scores, want_hits = _reference_bm25(sf_dir, TERMS)
    for r in rows:
        want = want_scores[r["doc_id"]]
        assert abs(r["score"] - want) <= 1e-6 * max(1.0, abs(want)), (
            r,
            want,
        )
        assert r["n_terms_hit"] == want_hits[r["doc_id"]], r
    # exact top-k id sequence under the (score desc, doc_id) order
    ranked = sorted(
        want_scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0])
    )
    assert [r["doc_id"] for r in rows] == [d for d, _ in ranked[: len(rows)]]


def test_bm25_prebuilt_index_equals_inline(spark, sf_dir, tmp_path):
    """The standing-index serve path (postings MATERIALIZED to
    parquet and read back, then passed via ``index=``) returns the
    identical ranking — the round-trip makes this a real serve-path
    test: schema/dtype drift through the write/read or a stale-index
    doc_id mismatch would surface here, which an in-memory lineage
    (identical to the inline plan) could never catch."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    inline = retrieval.bm25_topk(docs, TERMS, k=10).collect()
    ipath = str(tmp_path / "postings_idx")
    retrieval.postings(docs).write.parquet(ipath)
    idx = spark.read.parquet(ipath)
    served = retrieval.bm25_topk(docs, TERMS, k=10, index=idx).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in served]


def test_bm25_repeated_query_terms_weight(spark, sf_dir):
    """Bag-of-words semantics: a term repeated in the query weights
    its contribution by query-side frequency — a single-term query
    doubled scores exactly 2x (one float multiply, bit-exact), and
    n_terms_hit still counts distinct terms."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    single = retrieval.bm25_topk(docs, ["spark"], k=5).collect()
    doubled = retrieval.bm25_topk(docs, ["spark", "spark"], k=5).collect()
    assert [r["doc_id"] for r in single] == [r["doc_id"] for r in doubled]
    for s, d in zip(single, doubled):
        assert d["score"] == 2.0 * s["score"]
        assert d["n_terms_hit"] == s["n_terms_hit"] == 1


def test_bm25_query_terms_required(spark):
    with pytest.raises(ValueError):
        retrieval.bm25_topk(None, [])


def test_postings_tf_totals_match_doc_lengths(spark, sf_dir):
    """Σ tf over a doc's postings == its token count (nothing lost
    or double-counted by the (term, doc) aggregate)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = (
        retrieval.postings(docs)
        .groupBy("doc_id")
        .sum("tf")
        .withColumnRenamed("sum(tf)", "total")
    )
    dls = retrieval.doc_lengths(docs)
    bad = (
        p.join(dls, "doc_id")
        .where(p["total"] != dls["dl"])
        .count()
    )
    assert bad == 0


def test_rrf_fuse_union_and_missing_side(spark):
    """RRF sums only the present lists' terms: a doc in both lists
    beats docs in one list at comparable ranks; union candidates
    from either side all appear; ties break on doc_id."""
    from cr_data_pipeline_project_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [(1, 10, 2), (1, 13, 1)],
        "query_id long, doc_id long, rank int",
    )
    got = rrf_fuse(a, b, k_rrf=60, topk=10).collect()
    scores = {r["doc_id"]: r["rrf_score"] for r in got}
    assert set(scores) == {10, 11, 12, 13}
    assert scores[10] == round(1 / 61 + 1 / 62, 9)  # both lists
    assert scores[13] == round(1 / 61, 9)  # sem-only candidate
    assert scores[10] > scores[13] > scores[11] > scores[12]


def test_lexical_overlap_ranks_by_idf_not_raw_overlap(spark):
    """A doc sharing one RARE query term outranks a doc sharing one
    CORPUS-WIDE term (idf weighting), and the query never matches
    itself."""
    from cr_data_pipeline_project_spark.operators.retrieval import (
        lexical_overlap_topk,
    )

    rows = [
        (0, "zebra common alpha"),          # the query doc
        (1, "zebra unrelated words here"),  # shares rare 'zebra'
        (2, "common filler tokens common"), # shares ubiquitous 'common'
        (3, "common stuff"),
        (4, "common things"),
        (5, "nothing shared at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = docs.where("doc_id = 0").selectExpr(
        "doc_id AS query_id", "text"
    )
    got = lexical_overlap_topk(docs, q, k=10).collect()
    ranked = [r["doc_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert 0 not in ranked  # no self-match
    assert ranked[0] == 1  # rare-term doc first
    assert set(ranked) == {1, 2, 3, 4}  # doc 5 shares nothing
