"""Sparse lexical retrieval: inverted-index postings and BM25
ranking over the document corpus.

The reference stores raw documents and serves exact-match scans
(api_requests.py:21-60's fetch-then-filter loop); a training-data
engine additionally needs *ranked* retrieval — "which documents
match this query, best first" — both to serve data-exploration
queries and to mine hard negatives / near-matches for curation.
This module is the classic two-piece stack:

- ``postings``: the inverted index, (term, doc_id, tf) — built with
  explode + groupBy only, so the build is one shuffle on (term,
  doc_id) and stays inside whole-stage codegen.
- ``bm25_topk``: Okapi BM25 (Robertson/Sparck Jones; the Lucene
  ``k1``/``b`` parameterization with the +1-smoothed idf) evaluated
  as pure column expressions over the postings of the QUERY TERMS
  ONLY — the term filter is applied before the tf aggregate, so a
  4-term query aggregates 4 posting lists, never the whole index.

Scale notes (100 TB corpus):
- The query-term filter pushes below the tf groupBy: only rows whose
  term is in the query ever shuffle. Posting lists for common terms
  are the residual hot spot — exactly the real engine's problem —
  and cap out at |docs containing t|, never |corpus tokens|.
- N / avgdl / per-term df are 1-row / |query|-row aggregates that
  broadcast back; the final per-doc score sum shuffles (doc_id,
  partial score) pairs for candidate docs only.
- For a standing index, materialize ``postings`` once (hive-
  partitioned or bucketed by term) and pass it in — every query then
  prunes to its terms' partitions; the build never reruns.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def postings(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverted-index posting rows ``(term, doc_id, tf)``.

    Tokenization matches the corpus-wide convention (q70/q75):
    lowercase, single-space split, empty tokens dropped.
    """
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token count ``(doc_id, dl)`` — computed as a
    size(filter(split(...))) expression, no explode/shuffle."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    dl = F.size(F.filter(toks, lambda t: t != ""))
    return docs.select(
        F.col(id_col).alias("doc_id"), dl.cast("bigint").alias("dl")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    index: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under Okapi BM25.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    idf(t)   = ln(1 + (N − df + 0.5) / (df + 0.5))

    ``index`` (optional) is a prebuilt ``postings`` table — the
    standing-index serve path; when omitted the index is derived
    inline (correct, but rebuilds per query — bench/serve deployments
    should materialize it). Returns (doc_id, score, n_terms_hit)
    ranked by score desc with doc_id as the deterministic tie-break.
    Repeated query terms weight that term's contribution by its
    query-side frequency (classic bag-of-words BM25: each query-term
    occurrence scores); ``n_terms_hit`` counts DISTINCT terms hit.

    Rows-only by design: idf is ``ln`` and the per-doc sum is a
    float aggregate — both engine-ULP-dependent (the q85 precedent);
    ``tests/test_retrieval.py`` pins parity against an independent
    pandas/math reference at 1e-6 absolute-relative tolerance on the
    6-decimal-rounded scores q154 emits, plus the exact ranked id
    sequence.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qtf = Counter(t.lower() for t in query_terms)
    p = index if index is not None else postings(
        docs, id_col=id_col, text_col=text_col
    )
    qp = p.where(F.col("term").isin(list(qtf)))
    dls = doc_lengths(docs, id_col=id_col, text_col=text_col)
    # 1-row corpus stats, broadcast by the scalar-subquery pattern.
    stats = dls.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    dfreq = qp.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    # Literal term -> query-tf map: a constant-folded lookup, no join.
    wmap = F.create_map(
        *[F.lit(v) for t, n_q in qtf.items() for v in (t, float(n_q))]
    )
    contrib = F.element_at(wmap, F.col("term")) * idf * (
        F.col("tf") * F.lit(k1 + 1.0) / (F.col("tf") + norm)
    )
    scored = (
        qp.join(F.broadcast(dfreq), "term")
        .join(dls, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", contrib.alias("__c"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("__c").alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )


def lexical_overlap_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    k: int = 20,
) -> DataFrame:
    """Exact-arithmetic lexical ranker: score(q, d) = Σ over the
    DISTINCT query terms present in d of idf5(t), where idf5 =
    round(ln((N+1)/(df_t+1)) · 1e5) as BIGINT — the idf-weighted
    term-overlap retrieval model (BM25 minus the float tf/length
    saturation). The BIGINT score sum is combine-order free, so the
    ranking — unlike BM25's float sum (rows-only by contract) — is
    bit-reproducible cross-engine, which is what lets the RRF
    fusion built on top stay fully oracled. Ranks tie-break on
    doc_id; a query never matches itself.

    Returns (query_id, doc_id, rank) with rank ≤ k.

    Scale: the postings build is the standing-index artifact (see
    module header); query terms semi-join-filter the postings
    BEFORE any aggregate, so only candidate (query, doc) pairs with
    ≥1 shared term ever shuffle; idf needs one |terms|-bounded df
    aggregate and a 1-row N; the per-query window is over candidate
    docs only."""
    n_docs = docs.count()
    post = postings(docs, id_col=id_col, text_col=text_col).select(
        "term", "doc_id"
    )
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower(F.col(text_col)), " "),
                        lambda t: t != "",
                    )
                )
            ).alias("term"),
        )
    )
    df_t = post.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    idf5 = F.round(
        F.log(
            (F.lit(n_docs).cast("double") + 1.0)
            / (F.col("df").cast("double") + 1.0)
        )
        * 100000
    ).cast("bigint")
    scored = (
        qterms.join(post, "term")
        .join(df_t, "term")
        .where(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(idf5).alias("score5"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score5"), "doc_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank")
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    *,
    k_rrf: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two per-query rankings (Cormack,
    Clarke & Buettcher, SIGIR 2009): rrf(d) = Σ_lists 1/(k + rank_d)
    — the standard hybrid-retrieval combiner (lexical ∪ semantic
    lists surface different candidates; RRF needs only RANKS, no
    score calibration between incommensurable scorers). Candidates
    missing from one list contribute only their present term
    (classic RRF over the union).

    Inputs are (query_id, doc_id, rank) with deterministic ranks;
    the fused score is a FIXED two-term IEEE chain (coalesce each
    side, one addition, round once), so fusion of exact rankers
    stays exact cross-engine. Ties break on doc_id.

    Returns (query_id, doc_id, rrf_score) with the top ``topk``
    rows per query.

    Scale: one full-outer equi-join on (query_id, doc_id) between
    two k-bounded lists (≤ k rows per query each) and a per-query
    window over ≤ 2k candidates — negligible next to the rankers
    themselves."""
    a = ranked_a.select("query_id", "doc_id", F.col("rank").alias("ra"))
    b = ranked_b.select("query_id", "doc_id", F.col("rank").alias("rb"))
    term = lambda r: F.when(
        r.isNotNull(), 1.0 / (F.lit(k_rrf) + r.cast("double"))
    ).otherwise(F.lit(0.0))
    fused = a.join(b, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        F.round(term(F.col("ra")) + term(F.col("rb")), 9).alias(
            "rrf_score"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), "doc_id"
    )
    return (
        fused.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= topk)
        .select("query_id", "doc_id", "rrf_score")
    )


MMR_SCHEMA = (
    "query_id long, neighbor_id long, mmr_rank int, mmr_score double"
)


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.7,
    *,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    score_col: str = "score",
    vec_col: str = "emb",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) of a per-query candidate shortlist: greedily pick the
    candidate maximizing ``λ·relevance − (1−λ)·max cosine to the
    already-picked set`` — the standard diversification pass between
    ANN retrieval and context assembly (near-duplicate passages
    burn context tokens without adding evidence; MMR keeps the
    relevant-but-distinct ones).

    Input: one row per (query, candidate) with the retrieval score
    and the candidate's embedding; BOUNDED shortlists by contract
    (the output of brute_force_topk / ivf_topk / rrf_fuse, k ≤ a few
    hundred) — the greedy loop is O(shortlist²·d) per query and runs
    inside ONE Arrow batch per query group. Determinism: relevance
    and pairwise cosines pin to integer 1e-6 units before the
    argmax, ties break on candidate id — so the selection is
    bit-stable across partitionings and replicas (verified by the
    pure-Python replica in test_retrieval).

    Scale: ``applyInPandas`` over the query key — embarrassingly
    parallel across queries, shuffle carries shortlist rows only
    (never the corpus), and the quadratic term is bounded by the
    shortlist contract, not data volume."""
    import pandas as pd

    lam = float(lam)

    def pick(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        nrm = np.linalg.norm(vecs, axis=1)
        nrm[nrm == 0.0] = 1.0
        unit = vecs / nrm[:, None]
        # integer 1e-6 pinning for a partitioning-proof argmax
        rel6 = np.round(pdf[score_col].to_numpy(np.float64) * 1e6)
        sim6 = np.round((unit @ unit.T) * 1e6)
        n = len(pdf)
        picked: list[int] = []
        max_sim = np.full(n, -np.inf)
        avail = np.ones(n, dtype=bool)
        for rank in range(min(k, n)):
            if picked:
                obj = lam * rel6 - (1.0 - lam) * max_sim
            else:
                obj = lam * rel6
            obj = np.where(avail, obj, -np.inf)
            best = int(np.argmax(obj))  # ties -> lowest index = lowest id
            picked.append(best)
            avail[best] = False
            max_sim = np.maximum(max_sim, sim6[best])
        sel = pdf.iloc[picked]
        mmr6 = [
            lam * rel6[i]
            - (1.0 - lam) * (max(sim6[i][picked[:r]]) if r else 0.0)
            for r, i in enumerate(picked)
        ]
        return pd.DataFrame(
            {
                "query_id": sel[query_col].to_numpy(),
                "neighbor_id": sel[id_col].to_numpy(),
                "mmr_rank": np.arange(1, len(picked) + 1, dtype="int32"),
                "mmr_score": [round(s / 1e6, 6) for s in mmr6],
            }
        )

    return candidates.groupBy(query_col).applyInPandas(pick, MMR_SCHEMA)
