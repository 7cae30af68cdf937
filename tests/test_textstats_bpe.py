"""BPE-family text statistics (operators/textstats.py):
adjacent-pair counts and iterative merge learning, checked against a
pure-Python reference implementation of the same (public, Sennrich
et al. 2016) algorithm."""

from collections import Counter

from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.catalog import table
from cr_data_pipeline_project_spark.operators.textstats import (
    adjacent_pair_counts,
    bpe_encode,
    bpe_learn,
    bpe_merge_fold,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new low",
]


def _py_pairs(texts):
    c: Counter = Counter()
    for t in texts:
        toks = t.split(" ")
        for a, b in zip(toks, toks[1:]):
            c[(a, b)] += 1
    return c


def _py_bpe(texts, n_merges):
    """Reference BPE: count pairs, merge the (count-desc, then
    lexicographic) argmax greedily left-to-right, repeat."""
    docs = [t.split(" ") for t in texts]
    merges = []
    for _ in range(n_merges):
        c: Counter = Counter()
        for toks in docs:
            for a, b in zip(toks, toks[1:]):
                c[(a, b)] += 1
        if not c:
            break
        (a, b), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((a, b, n))
        fused = a + "▁" + b
        out_docs = []
        for toks in docs:
            out = []
            for x in toks:
                if out and out[-1] == a and x == b:
                    out[-1] = fused
                else:
                    out.append(x)
            out_docs.append(out)
        docs = out_docs
    return merges


def _df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_adjacent_pairs_match_python(spark):
    got = {
        (r["first"], r["second"]): r["n_pairs"]
        for r in adjacent_pair_counts(_df(spark, CORPUS)).collect()
    }
    assert got == dict(_py_pairs(CORPUS))


def test_adjacent_pairs_single_token_docs_drop(spark):
    out = adjacent_pair_counts(_df(spark, ["solo", "a b"])).collect()
    assert {(r["first"], r["second"]) for r in out} == {("a", "b")}


def test_bpe_matches_python_reference(spark):
    got = bpe_learn(_df(spark, CORPUS), n_merges=6)
    assert got == _py_bpe(CORPUS, 6)
    # the corpus supports exactly two merges before every remaining
    # pair count drops under the stop threshold
    assert got == [("low", "low", 4), ("newest", "newest", 4)]


def test_bpe_greedy_overlap_semantics(spark):
    # "a a a a" + merge(a,a): greedy left-to-right -> [aa, aa], so
    # the second round's top pair is (a▁a, a▁a)
    got = bpe_learn(_df(spark, ["a a a a", "a a a a"]), n_merges=2)
    assert got == _py_bpe(["a a a a", "a a a a"], 2)
    assert got[0][:2] == ("a", "a")
    assert got[1][:2] == ("a▁a", "a▁a")


def test_bpe_stops_when_no_repeating_pair(spark):
    got = bpe_learn(_df(spark, ["x y", "p q"]), n_merges=5)
    assert got == []


def test_bpe_fixture_matches_python(spark, sf_dir):
    docs = table(spark, "documents", sf_dir).select("text")
    texts = [r["text"] for r in docs.collect()]
    assert bpe_learn(docs, n_merges=3) == _py_bpe(texts, 3)


def test_bpe_local_matches_distributed(spark, sf_dir):
    """The size-gated driver-local fast path (small_corpus_max) must
    produce a merge table IDENTICAL to the distributed per-round fold
    — same winners, same tie-breaks, same counts, same stop point."""
    docs = table(spark, "documents", sf_dir).select("text")
    local = bpe_learn(docs, n_merges=4)  # fixture is under the bound
    dist = bpe_learn(docs, n_merges=4, small_corpus_max=0)
    assert local == dist


def test_bpe_local_incremental_matches_python_reference(spark):
    # the incremental pair-diff bookkeeping vs the recount-everything
    # reference, on a corpus whose merges cascade (fused symbols join
    # new pairs that then win later rounds)
    corpus = ["a a a a b", "a b a b a b", "b b a a b b", "c a b c a b"]
    got = bpe_learn(_df(spark, corpus), n_merges=5)
    assert got == _py_bpe(corpus, 5)


# ------------------------------------------------------------------ #
# BPE encode (the serve path): apply a learned merge table            #
# ------------------------------------------------------------------ #


def _py_apply(texts, merges):
    """Reference encode: replay each merge in rank order, greedy
    left-to-right — identical semantics to _py_bpe's rewrite."""
    out_docs = []
    for t in texts:
        if t is None:
            out_docs.append(None)
            continue
        toks = t.split(" ")
        for a, b, *_ in merges:
            nxt = []
            for x in toks:
                if nxt and nxt[-1] == a and x == b:
                    nxt[-1] = a + "▁" + b
                else:
                    nxt.append(x)
            toks = nxt
        out_docs.append(toks)
    return out_docs


def test_bpe_encode_matches_python(spark):
    merges = _py_bpe(CORPUS, 6)
    assert merges  # the corpus supports merges — a vacuous pass hides bugs
    got = [
        r["bpe_tokens"]
        for r in bpe_encode(_df(spark, CORPUS), merges)
        .orderBy("text")
        .collect()
    ]
    want = _py_apply(sorted(CORPUS), merges)
    assert got == want


def test_bpe_encode_matches_fold_expr_chain(spark):
    """The Arrow kernel and the codegen fold are the same function:
    replaying the merge table as chained bpe_merge_fold expressions
    yields token-for-token identical arrays."""
    # include a merge-of-merged-symbols case: learn on a corpus where
    # round 2's winner contains round 1's fused symbol
    corpus = ["a a a a b", "a a a a b", "c a a b"]
    merges = bpe_learn(_df(spark, corpus), n_merges=3)
    assert any("▁" in a or "▁" in b for a, b, _ in merges)
    df = _df(spark, corpus)
    col = F.split(F.col("text"), " ")
    for a, b, _ in merges:
        col = bpe_merge_fold(col, a, b)
    expr_out = [
        r["t"] for r in df.select(col.alias("t")).orderBy("text").collect()
    ]
    kern_out = [
        r["bpe_tokens"]
        for r in bpe_encode(df, merges).orderBy("text").collect()
    ]
    assert kern_out == expr_out


def test_bpe_encode_null_and_edge_rows(spark):
    merges = [("a", "b", 2)]
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "a b"), (3, "x y"), (4, "b a")],
        "i long, text string",
    )
    got = {
        r["i"]: r["bpe_tokens"]
        for r in bpe_encode(df, merges).collect()
    }
    assert got[0] is None          # NULL text -> NULL, not []
    assert got[1] == [""]          # split("", " ") == [""]
    assert got[2] == ["a▁b"]
    assert got[3] == ["x", "y"]    # symbols absent: unchanged
    assert got[4] == ["b", "a"]    # wrong order: no merge


def test_bpe_encode_chained_merge_symbol_set(spark):
    """A later merge whose symbol only EXISTS after an earlier merge
    fires must not be skipped by the absence guard (the per-doc
    symbol set gains fused symbols as passes fire)."""
    merges = [("a", "b", 9), ("a▁b", "c", 9)]
    df = _df(spark, ["a b c", "c a b"])
    got = {
        r["text"]: r["bpe_tokens"]
        for r in bpe_encode(df, merges).collect()
    }
    assert got["a b c"] == ["a▁b▁c"]
    assert got["c a b"] == ["c", "a▁b"]


def test_bpe_encode_preexisting_separator_excess_conservation(spark):
    """Raw text already containing ▁ (SentencePiece-style corpora):
    encoding still works and the EXCESS separator count — after
    minus before — equals the token-count drop, the invariant q156
    reports."""
    merges = [("a", "b", 9)]
    df = _df(spark, ["a▁x a b", "a▁b a b"])
    rows = bpe_encode(df, merges).collect()
    by_text = {r["text"]: r["bpe_tokens"] for r in rows}
    assert by_text["a▁x a b"] == ["a▁x", "a▁b"]
    assert by_text["a▁b a b"] == ["a▁b", "a▁b"]
    for r in rows:
        raw = r["text"].split(" ")
        toks = r["bpe_tokens"]
        seps_before = r["text"].count("▁")
        seps_after = sum(t.count("▁") for t in toks)
        assert len(raw) - len(toks) == seps_after - seps_before


def test_bpe_encode_fixture_conservation_and_roundtrip(spark, sf_dir):
    """On the fixture corpus with learned merges: every merge event
    drops the token count by exactly one (raw − encoded = Σ '▁'
    separators), and un-fusing reconstructs the original text."""
    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    merges = bpe_learn(docs, n_merges=4)
    assert merges
    rows = bpe_encode(docs, merges).collect()
    assert len(rows) > 100
    fused_seen = 0
    for r in rows:
        toks = r["bpe_tokens"]
        raw = r["text"].split(" ")
        seps = sum(t.count("▁") for t in toks)
        fused_seen += seps
        assert len(raw) - len(toks) == seps, r["doc_id"]
        assert " ".join(t.replace("▁", " ") for t in toks) == r["text"]
    assert fused_seen > 0  # the learned merges actually fire


def test_q156_source_stats_conservation(spark, sf_dir):
    from cr_data_pipeline_project_spark.plans.llm_queries import (
        q156_bpe_encode_stats,
    )

    rows = q156_bpe_encode_stats(spark, sf_dir).collect()
    assert len(rows) >= 2
    for r in rows:
        assert r["raw_tokens"] - r["bpe_tokens"] == r["merge_events"]
        assert 0 < r["compression"] <= 1.0
        assert r["fused_tokens"] <= r["merge_events"]


# ------------------------------------------------------------------ #
# bigram-LM perplexity scoring                                        #
# ------------------------------------------------------------------ #


def _py_bigram_scores(train_texts, score_texts):
    """Pure-Python add-one-smoothed bigram LM reference."""
    import math

    cu: Counter = Counter()
    cb: Counter = Counter()
    for t in train_texts:
        toks = t.split(" ")
        cu.update(toks)
        cb.update(zip(toks, toks[1:]))
    v = len(cu)
    out = {}
    for i, t in enumerate(score_texts):
        toks = t.split(" ")
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            out[i] = (0, None, None)
            continue
        lp = sum(
            math.log((cb.get(p, 0) + 1) / (cu.get(p[0], 0) + v))
            for p in pairs
        ) / len(pairs)
        out[i] = (len(pairs), lp, math.exp(-lp))
    return out


def test_bigram_logprob_matches_python(spark):
    from cr_data_pipeline_project_spark.operators.textstats import (
        bigram_logprob,
    )

    train = ["a b c a b", "b c d", "a a b"]
    score = ["a b c", "d d a", "zz unseen tokens", "solo"]
    tdf = _df(spark, train)
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_pairs"], r["avg_logprob"], r["ppl"])
        for r in bigram_logprob(tdf, sdf).collect()
    }
    want = _py_bigram_scores(train, score)
    assert set(got) == set(want)
    for k, (np_, lp, ppl) in want.items():
        gn, glp, gppl = got[k]
        assert gn == np_, k
        if lp is None:
            assert glp is None and gppl is None
        else:
            assert abs(glp - lp) < 1e-9, k
            assert abs(gppl - ppl) < 1e-9 * max(1.0, ppl), k


def test_bigram_logprob_fixture_matches_python(spark, sf_dir):
    from cr_data_pipeline_project_spark.catalog import table as _table
    from cr_data_pipeline_project_spark.operators.textstats import (
        bigram_logprob,
    )

    docs = _table(spark, "documents", sf_dir)
    train = docs.where(docs["source"] != "src6")
    test = docs.where(docs["source"] == "src6")
    rows = docs.select("doc_id", "source", "text").collect()
    train_texts = [r["text"] for r in rows if r["source"] != "src6"]
    score_rows = [(r["doc_id"], r["text"]) for r in rows if r["source"] == "src6"]
    ref = _py_bigram_scores(train_texts, [t for _, t in score_rows])
    ref_by_id = {
        did: ref[i] for i, (did, _) in enumerate(score_rows)
    }
    got = {
        r["doc_id"]: (r["n_pairs"], r["avg_logprob"])
        for r in bigram_logprob(train, test).collect()
    }
    assert set(got) == set(ref_by_id) and len(got) > 10
    for did, (np_, lp, _) in ref_by_id.items():
        assert got[did][0] == np_
        assert abs(got[did][1] - lp) < 1e-9
    # sanity: every score sits above the smoothed floor — the lowest
    # possible per-pair logprob is an unseen bigram after the
    # most frequent unigram: ln(1 / (max_unigram_count + V))
    import math

    cu = Counter(" ".join(train_texts).split(" "))
    floor = math.log(1.0 / (max(cu.values()) + len(cu)))
    assert all(lp > floor for _, lp in got.values())


def test_surprisal_pinned_tracks_float_logprob(spark, sf_dir):
    """q184's pinned-integer mean surprisal must equal q143's float
    -avg_logprob to within the 1e-5 pinning grid (same model, same
    smoothing) — the twin contract that lets a threshold filter on
    either column select the same documents."""
    from pyspark.sql import functions as F

    from cr_data_pipeline_project_spark.catalog import table
    from cr_data_pipeline_project_spark.operators.textstats import (
        bigram_logprob,
        bigram_surprisal_pinned,
    )

    docs = table(spark, "documents", sf_dir)
    train = docs.where(F.col("source") != "src6")
    test = docs.where(F.col("source") == "src6")
    flt = {
        r["doc_id"]: r
        for r in bigram_logprob(train, test).collect()
    }
    pin = {
        r["doc_id"]: r
        for r in bigram_surprisal_pinned(train, test).collect()
    }
    assert set(flt) == set(pin) and len(pin) > 0
    for doc_id, p in pin.items():
        f = flt[doc_id]
        assert p["n_pairs"] == f["n_pairs"]
        if f["avg_logprob"] is None:
            assert p["mean_surprisal"] is None
        else:
            assert abs(p["mean_surprisal"] - (-f["avg_logprob"])) < 1e-5


def test_bpe_decode_roundtrip(spark, sf_dir):
    """decode(encode(text)) == text — the BPE reversibility
    contract — on the learned fixture tokenizer, plus NULL text
    decodes to NULL."""
    docs = table(spark, "documents", sf_dir).select("doc_id", "text")
    merges = bpe_learn(docs, n_merges=4)
    from cr_data_pipeline_project_spark.operators.textstats import (
        bpe_decode,
    )

    enc = bpe_encode(docs, merges)
    out = bpe_decode(enc)
    bad = out.where(
        F.col("text_decoded").isNull()
        | (F.col("text_decoded") != F.col("text"))
    ).count()
    assert bad == 0
    nul = spark.createDataFrame(
        [(1, None)], "doc_id long, text string"
    )
    row = bpe_decode(bpe_encode(nul, merges)).collect()[0]
    assert row["text_decoded"] is None


def test_compression_ratio_census_closed_forms(spark):
    """q269's census on pinned fixtures: constant text compresses
    under 0.1, random-looking hex stays above 0.5, ratios are
    deterministic across runs, and the under-0.3 counter counts
    exactly the repetitive docs."""
    import random

    from cr_data_pipeline_project_spark.plans.llm_queries import (
        q269_compression_ratio_census,
    )

    rng = random.Random(269)
    rows = (
        [(i, "aaaa " * 200, "rep", 1000) for i in range(5)]
        + [
            (
                100 + i,
                "".join(rng.choice("0123456789abcdef") for _ in range(1000)),
                "rand",
                1000,
            )
            for i in range(5)
        ]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out1 = {
            r.source: r for r in q269_compression_ratio_census(spark, d).collect()
        }
        out2 = {
            r.source: r for r in q269_compression_ratio_census(spark, d).collect()
        }
    assert out1["rep"].mean_ratio < 0.1
    assert out1["rand"].mean_ratio > 0.5
    assert out1["rep"].n_under_03 == 5 and out1["rand"].n_under_03 == 0
    for s in ("rep", "rand"):
        assert tuple(out1[s]) == tuple(out2[s])  # deterministic
