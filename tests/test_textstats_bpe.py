"""BPE-family text statistics (operators/textstats.py):
adjacent-pair counts and iterative merge learning, checked against a
pure-Python reference implementation of the same (public, Sennrich
et al. 2016) algorithm."""

from collections import Counter

from cr_data_pipeline_project_spark.catalog import table
from cr_data_pipeline_project_spark.operators.textstats import (
    adjacent_pair_counts,
    bpe_learn,
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
