"""Property-based tests (hypothesis) for the algebraic invariants the
oracle gate can't express: calendar tiling for arbitrary dates,
upsert algebra, jaccard bounds/symmetry."""

import datetime as dt

from hypothesis import HealthCheck, given, settings, strategies as st

from cr_data_pipeline_project_spark.functions.calendar import season_calendar
from cr_data_pipeline_project_spark.operators import dedup, mutations

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    year=st.integers(2000, 2030),
    month=st.integers(1, 12),
    n_months=st.integers(2, 8),
)
@SLOW
def test_calendar_tiles_any_range(spark, year, month, n_months):
    rows = season_calendar(
        spark, f"{year:04d}-{month:02d}-01", n_months
    ).collect()
    assert len(rows) == n_months
    rows.sort(key=lambda r: r["sn_start_date"])
    for r in rows:
        s = r["sn_start_date"]
        assert s.weekday() == 0  # first Monday
        assert (s.hour, s.minute, s.second) == (9, 5, 0)
        assert s.day <= 7
        assert r["season_id"] == s.strftime("%Y-%m")
    for a, b in zip(rows, rows[1:]):
        assert a["sn_end_date"] + dt.timedelta(seconds=1) == b["sn_start_date"]


@given(
    target_keys=st.sets(st.integers(0, 20), max_size=8),
    source_keys=st.sets(st.integers(0, 20), max_size=8),
)
@SLOW
def test_upsert_algebra(spark, target_keys, source_keys):
    target = spark.createDataFrame(
        [(k, "old") for k in sorted(target_keys)], "k long, v string"
    )
    source = spark.createDataFrame(
        [(k, "new") for k in sorted(source_keys)], "k long, v string"
    )
    out = {r["k"]: r["v"] for r in mutations.upsert(target, source, ["k"]).collect()}
    # key set is the union; source wins on overlap
    assert set(out) == target_keys | source_keys
    for k in source_keys:
        assert out[k] == "new"
    for k in target_keys - source_keys:
        assert out[k] == "old"


@given(
    words_a=st.lists(st.sampled_from("a b c d e f g h".split()), min_size=5, max_size=20),
    words_b=st.lists(st.sampled_from("a b c d e f g h".split()), min_size=5, max_size=20),
)
@SLOW
def test_jaccard_bounds_and_identity(spark, words_a, words_b):
    df = spark.createDataFrame(
        [(1, " ".join(words_a)), (2, " ".join(words_b)), (3, " ".join(words_a))],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, "text", "doc_id", n=3, threshold=0.0
        ).collect()
    }
    for j in pairs.values():
        assert 0.0 < j <= 1.0
    assert pairs[(1, 3)] == 1.0  # identical docs
    if (1, 2) in pairs:
        assert pairs[(1, 2)] == pairs.get((1, 2))  # computed once per pair


@given(
    ids=st.lists(
        st.text(
            alphabet=st.sampled_from("#%23ABCxyz019 _"), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=10,
    )
)
@SLOW
def test_url_encode_decode_roundtrip(spark, ids):
    """decode(encode(x)) == x for any id WITHOUT a literal '%23'
    (the reference's ids are '#TAG'-shaped, never pre-encoded —
    api_extract.py:62,128); encode removes every '#'."""
    from pyspark.sql import functions as F

    from cr_data_pipeline_project_spark.functions.scalar import (
        url_decode_id,
        url_encode_id,
    )

    clean = [s for s in ids if "%23" not in s]
    if not clean:
        return
    df = spark.createDataFrame([(s,) for s in clean], "id string")
    out = df.select(
        "id",
        url_decode_id(url_encode_id(F.col("id"))).alias("rt"),
        url_encode_id(F.col("id")).alias("enc"),
    ).collect()
    for r in out:
        assert r["rt"] == r["id"]
        assert "#" not in r["enc"]


@given(
    buckets=st.lists(
        st.tuples(
            st.integers(0, 3),  # bucket key
            st.lists(st.integers(0, 30), min_size=0, max_size=8),  # member ids
        ),
        min_size=1,
        max_size=6,
    ),
    cap=st.integers(2, 6),
)
@SLOW
def test_bucket_pairs_equals_naive_self_join(spark, buckets, cap):
    """_bucket_pairs (one-shuffle array pairing) must produce exactly
    the pairs of the textbook self-join with a bucket-size cap."""
    from pyspark.sql import functions as F

    rows = [
        (f"d{i}", key)
        for key, members in buckets
        for i in members
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc string, k int").distinct()
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup._bucket_pairs(df, ["k"], "doc", max_bucket=cap).collect()
    }
    # naive: per bucket, all ordered pairs, buckets over cap dropped
    from collections import defaultdict

    members = defaultdict(set)
    for r in df.collect():
        members[r["k"]].add(r["doc"])
    want = set()
    for k, ms in members.items():
        if len(ms) > cap:
            continue
        ms = sorted(ms)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                want.add((ms[i], ms[j]))
    assert got == want


def test_chunk_dedup_reassembly_invariants(spark):
    """Structural invariants of sub-document dedup, independent of
    data: (1) the min-id document survives intact; (2) every distinct
    chunk content appears EXACTLY once across all clean_texts;
    (3) n_kept sums to the number of distinct chunk contents."""
    from cr_data_pipeline_project_spark.operators.dedup import chunk_dedup_keep

    W = 4
    vocab = ["a", "b", "c", "d", "e"]
    rows = []
    for doc in range(12):
        n = 3 + (doc * 7) % 9
        toks = [vocab[(doc * 31 + i * 13) % 5] for i in range(n * W)]
        rows.append((doc, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in chunk_dedup_keep(df, "text", "doc_id", W).collect()}

    def chunks(text):
        t = text.split()
        return [" ".join(t[i : i + W]) for i in range(0, len(t), W)]

    all_chunks = [c for _, txt in rows for c in chunks(txt)]
    distinct = set(all_chunks)
    # (1) doc 0's earliest-indexed copy of each content wins before
    # any later doc; its own duplicates collapse to first occurrence
    seen = set()
    expect0 = [c for c in chunks(rows[0][1]) if not (c in seen or seen.add(c))]
    assert out[0].clean_text == " ".join(expect0)
    # (2) + (3)
    kept_all = [c for r in out.values() for c in chunks(r.clean_text)]
    assert sorted(kept_all) == sorted(distinct)
    assert sum(r.n_kept for r in out.values()) == len(distinct)


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=0,
        max_size=60,
    )
)
@SLOW
def test_connected_components_matches_reachability(spark, edges):
    """CC labels (fast path) equal the min id of each node's
    reachability closure computed by a pure-Python BFS — on
    arbitrary random graphs including self-loops, duplicate edges,
    and isolated nodes."""
    from cr_data_pipeline_project_spark.operators.graph import (
        connected_components,
    )

    n = 41
    ndf = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edf = spark.createDataFrame(
        edges or [(0, 0)], "src long, dst long"
    )
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(ndf, edf).collect()
    }
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for start in range(n):
        seen, stack = {start}, [start]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        want[start] = min(seen)
    assert got == want


@given(
    data=st.lists(
        st.tuples(
            st.integers(1, 4),            # key
            st.sampled_from(["a", "b", "c"]),  # value
            st.booleans(),                # is_delete
        ),
        min_size=1,
        max_size=14,
    ),
    split=st.integers(1, 13),
)
@SLOW
def test_scd2_delete_batch_split_equals_oneshot(spark, tmp_path_factory, data, split):
    """For ANY delete-carrying feed and ANY time-ordered batch split,
    the batched streaming merge must equal the one-shot delete-aware
    interval derivation (modulo frontier-tombstone markers). Events
    get strictly increasing timestamps, so every split point is a
    valid watermark boundary."""
    import os

    from pyspark.sql import functions as F

    from cr_data_pipeline_project_spark.operators.scd import scd2_intervals
    from cr_data_pipeline_project_spark.streaming.incremental import (
        scd2_apply_batch,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (k, None if d else v, d, base + dt.timedelta(hours=i))
        for i, (k, v, d) in enumerate(data)
    ]
    schema = "user_id long, state string, is_del boolean, ts timestamp"

    hist = str(tmp_path_factory.mktemp("scd")) + "/hist"
    cut = min(split, len(rows))
    for part in (rows[:cut], rows[cut:]):
        if part:
            scd2_apply_batch(
                spark.createDataFrame(part, schema), hist,
                "user_id", "state", "ts", delete_col="is_del",
            )

    want = sorted(
        (r.user_id, r.state, str(r.valid_from), r.valid_to and str(r.valid_to))
        for r in scd2_intervals(
            spark.createDataFrame(rows, schema),
            "user_id", "state", "ts", delete_col="is_del",
        ).collect()
    )
    got = sorted(
        (r.user_id, r.state, str(r.valid_from), r.valid_to and str(r.valid_to))
        for r in spark.read.parquet(hist)
        .where(
            F.col("state").isNotNull()
            | F.col("valid_to").isNull()
            | (F.col("valid_to") != F.col("valid_from"))
        )
        .collect()
    ) if os.path.exists(hist) else []
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "ab", "a▁b", "x"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    ),
    n_merges=st.integers(min_value=1, max_value=4),
)
@SLOW
def test_bpe_encode_matches_python_reference(spark, docs, n_merges):
    """For ANY corpus (including tokens that collide with the fused
    separator) and merges learned from it, the Arrow encode kernel
    equals the pure-Python rank-order replay token-for-token — the
    full learn→apply contract, not just the fixture's happy path."""
    from cr_data_pipeline_project_spark.operators.textstats import (
        bpe_encode,
        bpe_learn,
    )

    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    merges = bpe_learn(df, n_merges=n_merges)

    # pure-Python replay in rank order (same greedy semantics)
    def apply(toks, a, b):
        out = []
        for x in toks:
            if out and out[-1] == a and x == b:
                out[-1] = a + "▁" + b
            else:
                out.append(x)
        return out

    want = []
    for t in texts:
        toks = t.split(" ")
        for a, b, _ in merges:
            toks = apply(toks, a, b)
        want.append(toks)

    got = {
        r["i"]: r["bpe_tokens"] for r in bpe_encode(df, merges).collect()
    }
    assert [got[i] for i in range(len(texts))] == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcdefg"), min_size=1, max_size=12
        ).map(lambda ws: " ".join(ws)),
        min_size=2,
        max_size=5,
    )
)
@SLOW
def test_containment_jaccard_relations(spark, docs):
    """Algebraic invariants binding the two near-dup scores computed
    over the same shingle sets: 0 < C ≤ 1; both directions of a pair
    agree on the intersection (C_ab·|A| == C_ba·|B|); and Jaccard
    never exceeds either direction's containment."""
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    n = 2
    cont = {
        (r["src"], r["sup"]): r["containment"]
        for r in dedup.containment_pairs(
            df, "text", "doc_id", n=n, threshold=0.0
        ).collect()
    }
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, "text", "doc_id", n=n, threshold=0.0
        ).collect()
    }

    def shingles(t):
        ws = t.split(" ")
        if len(ws) < n:
            return {t}
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    sets = {i: shingles(t) for i, t in rows}
    for (a, b), c_ab in cont.items():
        assert 0.0 < c_ab <= 1.0
        inter = len(sets[a] & sets[b])
        # one IEEE division of exact ints — reproducible exactly
        assert c_ab == inter / len(sets[a])
        c_ba = cont[(b, a)]
        assert round(c_ab * len(sets[a]), 6) == round(
            c_ba * len(sets[b]), 6
        )
    for (a, b), j in jac.items():
        assert j <= cont[(a, b)] + 1e-12
        assert j <= cont[(b, a)] + 1e-12


@given(
    counts=st.lists(
        st.tuples(
            st.integers(0, 30), st.integers(0, 30)
        ),
        min_size=1,
        max_size=8,
    ).filter(lambda cs: sum(a for a, _ in cs) > 0 and sum(b for _, b in cs) > 0)
)
@SLOW
def test_kl_nonnegative_and_zero_on_self(spark, counts):
    """Gibbs' inequality survives the 1e-5 ln pinning: KL(live‖ref)
    ≥ −2·quantum for any count tables, and KL(p‖p) sits within the
    pinning quantum of zero."""
    from cr_data_pipeline_project_spark.operators.drift import (
        kl_from_merged,
    )

    rows = [(f"v{i}", a, b) for i, (a, b) in enumerate(counts)]
    pts = spark.createDataFrame(rows, "v string, ca long, cb long")
    kl = kl_from_merged(pts).collect()[0]["kl_nats"]
    assert kl >= -2e-4, kl

    self_rows = [(f"v{i}", a, a) for i, (a, _) in enumerate(counts)]
    pts2 = spark.createDataFrame(self_rows, "v string, ca long, cb long")
    kl_self = kl_from_merged(pts2).collect()[0]["kl_nats"]
    assert abs(kl_self) < 1e-4, kl_self


# ------------------------------------------------------------------ #
# Codec roundtrips: arbitrary pixel grids through the real PNG / GIF  #
# byte-level coders must reproduce exactly (no Spark; pure kernels)   #
# ------------------------------------------------------------------ #


@given(
    data=st.data(),
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    color_type=st.sampled_from([0, 2, 4, 6]),
)
@settings(max_examples=30, deadline=None)
def test_png_roundtrip_property(data, h, w, color_type):
    import numpy as np

    from cr_data_pipeline_project_spark.operators import multimodal

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    flat = data.draw(
        st.lists(
            st.integers(0, 255), min_size=h * w * ch, max_size=h * w * ch
        )
    )
    grid = np.array(flat, dtype=np.uint8).reshape(h, w, ch)
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    payload = multimodal._png_encode(
        grid,
        color_type=color_type,
        filters=filters,
        interlace=data.draw(st.booleans()),
    )
    W, H, C, out = multimodal._parse_png(payload)
    assert (W, H, C) == (w, h, ch)
    assert np.array_equal(out, grid)


@given(
    data=st.data(),
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    npal=st.integers(1, 256),
)
@settings(max_examples=30, deadline=None)
def test_gif_lzw_roundtrip_property(data, h, w, npal):
    import numpy as np

    from cr_data_pipeline_project_spark.operators import multimodal

    pal = np.arange(768, dtype=np.uint8)[: npal * 3].reshape(npal, 3)
    flat = data.draw(
        st.lists(st.integers(0, npal - 1), min_size=h * w, max_size=h * w)
    )
    grid = np.array(flat, dtype=np.uint8).reshape(h, w)
    W, H, P, out = multimodal._parse_gif(multimodal._gif_encode(grid, pal))
    assert (W, H) == (w, h)
    assert np.array_equal(out, grid)
    assert np.array_equal(P[:npal], pal)


@given(seq=st.lists(st.integers(0, 255), min_size=1, max_size=4000))
@settings(max_examples=30, deadline=None)
def test_gif_lzw_codes_roundtrip_property(seq):
    """The raw LZW coder pair on arbitrary byte streams — dictionary
    growth, width widening, and 12-bit CLEAR resets all land here."""
    from cr_data_pipeline_project_spark.operators import multimodal

    enc = multimodal._lzw_encode(bytes(seq), 8)
    assert multimodal._lzw_decode(enc, 8) == seq
