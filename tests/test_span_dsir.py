"""Round-7 document-pipeline additions, checked against independent
pure-Python recomputes (oracle parity can't catch a bug both engine
implementations share — the q161 lesson), plus contract tests for
the chunk plan and the shared ngram_positions helper."""

import hashlib
import math

from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.catalog import table
from cr_data_pipeline_project_spark.operators import dedup
from cr_data_pipeline_project_spark.plans.llm_queries import (
    q172_dsir_importance,
    q173_dup_span_census,
    q174_chunk_plan,
)


def test_ngram_positions_contract(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "x"), (3, "a b c d")], ["doc_id", "text"]
    )
    rows = dedup.ngram_positions(df, "text", "doc_id", n=3).collect()
    got = {(r["doc_id"], r["pos"]): (r["gram"], r["n_tokens"]) for r in rows}
    # doc 1: two trigrams at pos 1, 2
    assert got[(1, 1)] == ("a b c", 4)
    assert got[(1, 2)] == ("b c d", 4)
    # sub-n doc contributes full text at pos 1
    assert got[(2, 1)] == ("x", 1)
    # occurrences, not a distinct set: doc 3 repeats doc 1's grams
    assert got[(3, 1)] == ("a b c", 4)
    assert len(rows) == 5


def _py_dup_census(texts: dict[int, str], n: int = 8):
    """Independent brute-force recompute of q173: gram occurrence
    counts, then per-doc union of duplicated [pos, pos+n-1] spans."""
    grams: dict[str, int] = {}
    doc_grams: dict[int, list[tuple[int, str]]] = {}
    for doc_id, text in texts.items():
        words = text.split(" ")
        idxs = range(1, max(len(words) - (n - 1), 1) + 1)
        gs = [(i, " ".join(words[i - 1 : i - 1 + n])) for i in idxs]
        doc_grams[doc_id] = gs
        for _, g in gs:
            grams[g] = grams.get(g, 0) + 1
    out = {}
    for doc_id, text in texts.items():
        words = text.split(" ")
        L = len(words)
        spans = [
            (i, min(i + n - 1, L))
            for i, g in doc_grams[doc_id]
            if grams[g] >= 2
        ]
        covered = set()
        for s, e in spans:
            covered.update(range(s, e + 1))
        out[doc_id] = (L, len(spans), len(covered))
    return out


def test_dup_span_census_matches_bruteforce(spark, sf_dir):
    texts = {
        r["doc_id"]: r["text"]
        for r in table(spark, "documents", sf_dir)
        .select("doc_id", "text")
        .collect()
    }
    expected = _py_dup_census(texts)
    got = {
        r["doc_id"]: r for r in q173_dup_span_census(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for doc_id, (L, n_dup, covered) in expected.items():
        r = got[doc_id]
        assert r["n_tokens"] == L, doc_id
        assert r["n_dup_grams"] == n_dup, doc_id
        assert r["covered_tokens"] == covered, doc_id
        assert abs(r["dup_fraction"] - round(covered / L, 6)) < 1e-9, doc_id


def _py_dsir(docs: list[tuple[int, str, str]], buckets: int = 256):
    """Independent recompute of q172's score pipeline (python md5 +
    math.log; log can wobble 1 ulp vs the JVM, hence the caller's
    tolerance)."""

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % buckets

    occ: list[tuple[int, str, int]] = []
    for doc_id, lang, text in docs:
        words = text.split(" ")
        idxs = range(1, max(len(words) - 1, 1) + 1)
        for i in idxs:
            occ.append((doc_id, lang, bucket(" ".join(words[i - 1 : i + 1]))))
    r_tot = len(occ)
    t_tot = sum(1 for _, lang, _ in occ if lang == "en")
    rc: dict[int, int] = {}
    tc: dict[int, int] = {}
    for _, lang, f in occ:
        rc[f] = rc.get(f, 0) + 1
        if lang == "en":
            tc[f] = tc.get(f, 0) + 1
    lam5 = {
        f: round(
            (
                math.log((tc.get(f, 0) + 1) / (t_tot + buckets))
                - math.log((c + 1) / (r_tot + buckets))
            )
            * 10**5
        )
        for f, c in rc.items()
    }
    scores = {}
    for doc_id, _, _ in docs:
        fs = [f for d, _, f in occ if d == doc_id]
        scores[doc_id] = sum(lam5[f] for f in fs) / (len(fs) * 10**5)
    return scores


def test_dsir_matches_bruteforce_and_prefers_target(spark, sf_dir):
    docs = [
        (r["doc_id"], r["lang"], r["text"])
        for r in table(spark, "documents", sf_dir)
        .select("doc_id", "lang", "text")
        .collect()
    ]
    expected = _py_dsir(docs)
    got = {r["doc_id"]: r["dsir_score"] for r in
           q172_dsir_importance(spark, sf_dir).collect()}
    # the query returns the top 200 — every returned score must match
    # the independent recompute (tolerance: lam5 rounding can differ
    # by 1 unit of 1e-5 when ln wobbles an ulp at the half boundary)
    for doc_id, s in got.items():
        assert abs(s - round(expected[doc_id], 6)) <= 2e-5, doc_id
    # and the selection must actually prefer target-looking data:
    # mean score of English docs exceeds mean score of the rest
    lang = {d: l for d, l, _ in docs}
    en = [s for d, s in expected.items() if lang[d] == "en"]
    rest = [s for d, s in expected.items() if lang[d] != "en"]
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_chunk_plan_covers_and_overlaps(spark, sf_dir):
    chunks = q174_chunk_plan(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in table(spark, "documents", sf_dir)
        .select("doc_id", "text")
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rs in by_doc.items():
        words = docs[doc_id]
        rs.sort(key=lambda r: r["chunk_idx"])
        # stride arithmetic + tail-chunk shortening
        for i, r in enumerate(rs):
            assert r["chunk_idx"] == i
            assert r["start_tok"] == 1 + i * 48
            want = words[r["start_tok"] - 1 : r["start_tok"] - 1 + 64]
            assert r["n_chunk_tokens"] == len(want)
            assert (
                r["chunk_md5"]
                == hashlib.md5(" ".join(want).encode()).hexdigest()
            )
        # full coverage: last chunk reaches the final token
        last = rs[-1]
        assert last["start_tok"] + last["n_chunk_tokens"] - 1 == len(words)
        # consecutive chunks overlap by 16 tokens (64 - 48) unless
        # the tail chunk ran short
        for a, b in zip(rs, rs[1:]):
            if a["n_chunk_tokens"] == 64:
                assert b["start_tok"] == a["start_tok"] + 48
        # no redundant chunks: every chunk after the first must add
        # coverage beyond its predecessor's end (review finding:
        # tails shorter than the overlap were emitted as strict
        # sub-spans of the previous chunk)
        for a, b in zip(rs, rs[1:]):
            a_end = a["start_tok"] + a["n_chunk_tokens"] - 1
            b_end = b["start_tok"] + b["n_chunk_tokens"] - 1
            assert b_end > a_end, (doc_id, a_end, b_end)
