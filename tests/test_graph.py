"""Connected components (operators/graph.py): chains, isolated nodes,
partition-layout determinism."""

from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.operators import graph


def _cc(spark, nodes, edges, **kw):
    ndf = spark.createDataFrame([(n,) for n in nodes], "node string")
    edf = spark.createDataFrame(edges, "src string, dst string")
    out = graph.connected_components(ndf, edf, **kw)
    return {r["node"]: r["component_id"] for r in out.collect()}


def test_chain_collapses_to_min_label(spark):
    # a-b-c-d is a path: diameter 3, needs multiple propagation rounds
    got = _cc(
        spark,
        ["a", "b", "c", "d", "z"],
        [("b", "a"), ("b", "c"), ("d", "c")],
    )
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "z": "z"}


def test_two_components_and_self_loop(spark):
    got = _cc(
        spark,
        ["1", "2", "3", "4"],
        [("1", "2"), ("2", "1"), ("3", "3"), ("3", "4")],
    )
    assert got == {"1": "1", "2": "1", "3": "3", "4": "3"}


def test_partition_layout_invariance(spark):
    nodes = [f"n{i:02d}" for i in range(20)]
    # ring of 10 + star of 10 → two components
    edges = [(f"n{i:02d}", f"n{(i + 1) % 10:02d}") for i in range(10)]
    edges += [("n10", f"n{i:02d}") for i in range(11, 20)]
    ndf = spark.createDataFrame([(n,) for n in nodes], "node string").repartition(7)
    edf = spark.createDataFrame(edges, "src string, dst string").repartition(5)
    out = graph.connected_components(ndf, edf)
    got = {r["node"]: r["component_id"] for r in out.collect()}
    assert all(got[f"n{i:02d}"] == "n00" for i in range(10))
    assert all(got[f"n{i:02d}"] == "n10" for i in range(10, 20))


def test_dedup_clusters_covers_all_docs(spark):
    docs = spark.createDataFrame(
        [("d1", "x"), ("d2", "x"), ("d3", "y"), ("d4", "z")],
        "doc_id string, text string",
    )
    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3")], "doc_a string, doc_b string"
    )
    out = graph.dedup_clusters(docs, pairs)
    got = {r["doc_id"]: r["component_id"] for r in out.collect()}
    assert got == {"d1": "d1", "d2": "d1", "d3": "d1", "d4": "d4"}


def test_symmetrize_drops_self_loops_and_dedups(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "a")], "src string, dst string"
    )
    sym = graph.symmetrize(e)
    rows = {(r["src"], r["dst"]) for r in sym.collect()}
    assert rows == {("a", "b"), ("b", "a")}


def test_fast_path_and_distributed_loop_agree(spark):
    """The driver union-find fast path and the iterative min-label
    loop must produce identical labels (the q66 oracle equality is
    path-independent). small_graph_max=0 forces the distributed
    loop on the same input."""
    import random

    rng = random.Random(11)
    nodes = [(i,) for i in range(200)]
    # random chains + rings → multi-hop components, some isolated
    edges = [
        (i, rng.randrange(200)) for i in range(0, 150, 2)
    ] + [(i, i + 1) for i in range(150, 160)]
    ndf = spark.createDataFrame(nodes, "node long").repartition(5)
    edf = spark.createDataFrame(edges, "src long, dst long").repartition(3)
    fast = {
        (r["node"], r["component_id"])
        for r in graph.connected_components(ndf, edf).collect()
    }
    dist = {
        (r["node"], r["component_id"])
        for r in graph.connected_components(
            ndf, edf, small_graph_max=0
        ).collect()
    }
    assert fast == dist
    assert len(fast) == 200


def test_textrank_matches_python_reference(spark):
    """Integer TextRank vs an independent pure-Python power
    iteration on a small weighted graph — exact equality, since the
    whole point of the BIGINT formulation is bit-determinism."""
    edges = [
        ("a", "b", 3), ("b", "c", 2), ("c", "a", 1),
        ("c", "d", 5), ("d", "e", 1), ("a", "e", 2),
        ("e", "e", 9),  # self-loop must be dropped
        ("b", "a", 4),  # parallel reverse edge must aggregate
    ]
    edf = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {
        r["token"]: r["r"] for r in graph.textrank_topk(edf, k=10)
    }

    # reference: symmetrize, drop self-loops, integer iterate
    sym: dict[tuple, int] = {}
    for s, d, w in edges:
        if s == d:
            continue
        sym[(s, d)] = sym.get((s, d), 0) + w
        sym[(d, s)] = sym.get((d, s), 0) + w
    wout: dict[str, int] = {}
    for (s, _), w in sym.items():
        wout[s] = wout.get(s, 0) + w
    p = {
        (s, d): (w * graph.TEXTRANK_PROB_SCALE) // wout[s]
        for (s, d), w in sym.items()
    }
    r = {n: graph.TEXTRANK_SCALE for n in wout}
    for _ in range(10):
        incoming: dict[str, int] = {n: 0 for n in wout}
        for (s, d), pp in p.items():
            incoming[d] += (r[s] * pp) // graph.TEXTRANK_PROB_SCALE
        r = {
            n: graph.TEXTRANK_BASE
            + (graph.TEXTRANK_DAMP_NUM * incoming[n]) // 100
            for n in wout
        }
    assert got == r
    # the heaviest-degree hub ('a': wout 3+4+1+2 = 10) tops the list
    assert max(got, key=got.get) == "a"
    assert all(v > 0 for v in got.values())


def test_textrank_releases_persisted_generations(spark):
    edges = [("a", "b", 1), ("b", "c", 1)]
    edf = spark.createDataFrame(edges, "src string, dst string, w long")
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    graph.textrank_topk(edf, k=5, n_iter=3)
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after <= before


def test_textrank_fast_path_equals_distributed(spark):
    """The driver-local small-graph path and the distributed
    iteration produce identical scores (same BIGINT recurrence —
    the connected_components fast-path contract applied to
    TextRank)."""
    edges = [
        ("a", "b", 3), ("b", "c", 2), ("c", "a", 1),
        ("c", "d", 5), ("d", "e", 1), ("a", "e", 2),
    ]
    edf = spark.createDataFrame(edges, "src string, dst string, w long")
    fast = {r["token"]: r["r"] for r in graph.textrank_topk(edf, k=10)}
    dist = {
        r["token"]: r["r"]
        for r in graph.textrank_topk(edf, k=10, small_graph_max=0)
    }
    assert fast == dist and len(fast) == 5


def test_triangle_count_known_graphs(spark):
    from cr_data_pipeline_project_spark.operators.graph import triangle_count

    def tri(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        return triangle_count(df).collect()[0].n_triangles

    # K4 has C(4,3) = 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert tri(k4) == 4
    # a path has none
    assert tri([(1, 2), (2, 3), (3, 4)]) == 0
    # two triangles sharing an edge
    assert tri([(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)]) == 2
    # duplicate / reversed / self-loop edges must not change the count
    noisy = k4 + [(b, a) for a, b in k4] + [(0, 1), (2, 2)]
    assert tri(noisy) == 4


def test_triangle_count_hub_star(spark):
    """A star (hub + leaves, no leaf-leaf edges) has zero triangles —
    the degree-ordered orientation must not explode or miscount on
    the hub."""
    from cr_data_pipeline_project_spark.operators.graph import triangle_count

    edges = [(0, i) for i in range(1, 40)] + [(1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert triangle_count(df).collect()[0].n_triangles == 1


def test_clustering_stats_closed_forms(spark):
    """clustering_stats on pinned shapes: K4 (cc=1), a path (cc=0),
    and a triangle with a pendant vertex (T=1, W=5, cc=0.6)."""
    from cr_data_pipeline_project_spark.operators.graph import (
        clustering_stats,
    )

    def stats(pairs):
        df = spark.createDataFrame(pairs, "src long, dst long")
        return clustering_stats(df).collect()[0]

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = stats(k4)
    assert (r.n_edges, r.n_wedges, r.n_triangles, r.global_cc) == (
        6, 12, 4, 1.0,
    )
    path = [(0, 1), (1, 2), (2, 3)]
    r = stats(path)
    assert (r.n_edges, r.n_wedges, r.n_triangles, r.global_cc) == (
        3, 2, 0, 0.0,
    )
    tri_pendant = [(0, 1), (1, 2), (0, 2), (2, 3)]
    r = stats(tri_pendant)
    assert (r.n_edges, r.n_wedges, r.n_triangles) == (4, 5, 1)
    assert r.global_cc == 0.6
