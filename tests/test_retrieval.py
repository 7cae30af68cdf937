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


# ------------------------------------------------------------------ #
# MMR diversification                                                 #
# ------------------------------------------------------------------ #


def _reference_mmr(cands, k, lam):
    """Independent pure-Python MMR greedy: dict/list arithmetic, no
    numpy, no Spark code shared. cands = list of (query_id,
    neighbor_id, score, vec)."""
    import math

    by_q: dict = {}
    for qid, nid, score, vec in cands:
        by_q.setdefault(qid, []).append((nid, score, vec))
    out = {}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r[0])

        def unit(v):
            n = math.sqrt(sum(x * x for x in v)) or 1.0
            return [x / n for x in v]

        units = [unit(r[2]) for r in rows]
        rel6 = [round(r[1] * 1e6) for r in rows]

        def sim6(i, j):
            return round(sum(a * b for a, b in zip(units[i], units[j])) * 1e6)

        picked: list[int] = []
        max_s: list[float] = [float("-inf")] * len(rows)
        sel = []
        for rank in range(min(k, len(rows))):
            best, best_obj = None, None
            for i in range(len(rows)):
                if i in picked:
                    continue
                obj = lam * rel6[i] - (
                    (1.0 - lam) * max_s[i] if picked else 0.0
                )
                if best_obj is None or obj > best_obj:
                    best, best_obj = i, obj
            picked.append(best)
            sel.append((rows[best][0], rank + 1))
            for i in range(len(rows)):
                max_s[i] = max(max_s[i], sim6(best, i))
        out[qid] = sel
    return out


def _mmr_fixture_cands(spark, sf_dir):
    from cr_data_pipeline_project_spark.operators import similarity
    from cr_data_pipeline_project_spark.catalog import table
    from pyspark.sql import functions as F

    emb = table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < 6)
    shortlist = similarity.brute_force_topk(emb, queries, k=20)
    return shortlist.join(
        emb.select(
            F.col("vec_id").alias("neighbor_id"),
            similarity.as_double_vec("embedding").alias("emb"),
        ),
        "neighbor_id",
    )


def test_mmr_matches_python_replica(spark, sf_dir):
    cands = _mmr_fixture_cands(spark, sf_dir)
    got = {
        (r.query_id, r.mmr_rank): r.neighbor_id
        for r in retrieval.mmr_rerank(cands, k=8, lam=0.7).collect()
    }
    raw = [
        (r.query_id, r.neighbor_id, r.score, list(r.emb))
        for r in cands.collect()
    ]
    want = _reference_mmr(raw, k=8, lam=0.7)
    assert got == {
        (qid, rank): nid for qid, sel in want.items() for nid, rank in sel
    }


def test_mmr_partitioning_invariant_and_shape(spark, sf_dir):
    cands = _mmr_fixture_cands(spark, sf_dir)
    a = retrieval.mmr_rerank(cands, k=8, lam=0.7).collect()
    b = retrieval.mmr_rerank(cands.repartition(17), k=8, lam=0.7).collect()
    key = lambda r: (r.query_id, r.mmr_rank, r.neighbor_id, r.mmr_score)
    assert sorted(map(key, a)) == sorted(map(key, b))
    per_q: dict = {}
    for r in a:
        per_q.setdefault(r.query_id, []).append(r)
    shortlist = {
        (r.query_id, r.neighbor_id) for r in cands.collect()
    }
    for qid, rows in per_q.items():
        assert sorted(r.mmr_rank for r in rows) == list(range(1, 9))
        assert all((qid, r.neighbor_id) in shortlist for r in rows)


def test_mmr_rank1_is_top_relevance_and_lam1_is_identity(spark, sf_dir):
    """λ=1 disables the diversity term: MMR must reproduce the
    relevance order exactly; at any λ the first pick is the
    top-relevance candidate."""
    cands = _mmr_fixture_cands(spark, sf_dir)
    base = {
        (r.query_id, r.rank): r.neighbor_id
        for r in cands.select(
            "query_id", "rank", "neighbor_id"
        ).collect()
    }
    lam1 = retrieval.mmr_rerank(cands, k=8, lam=1.0).collect()
    for r in lam1:
        assert base[(r.query_id, r.mmr_rank)] == r.neighbor_id
    lam7 = retrieval.mmr_rerank(cands, k=8, lam=0.7).collect()
    for r in lam7:
        if r.mmr_rank == 1:
            assert base[(r.query_id, 1)] == r.neighbor_id
