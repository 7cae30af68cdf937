"""Capture explain('formatted') for the INTERNAL stages of eager
operators (q231/q257-class: their declared DataFrame is a 1-row
ExistingRDD, so the query-level dump proves nothing — VERDICT r11
item 8). Each named capture builds the operator's internal frame(s)
exactly as the query does and dumps the plan of the heavy aggregate.

Usage: python tools/explain_internal.py q231_triangle_core [...] \
          --explain-dir plans/r12 --suffix before
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cr_data_pipeline_project_spark.catalog import table  # noqa: E402
from cr_data_pipeline_project_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _copurchase_edges(spark):
    from cr_data_pipeline_project_spark.operators.graph import (
        cooccurrence_edges,
    )

    li = table(spark, "lineitem", SF_DIR).select("l_orderkey", "l_partkey")
    return cooccurrence_edges(li, "l_orderkey", "l_partkey")


def q231_triangle_core(spark):
    """The triangle-sum aggregate q231 collects (internal frame of
    graph.triangle_count), built on the live module's plan shape."""
    from cr_data_pipeline_project_spark.operators import graph as g

    und = g._canonical_edges(_copurchase_edges(spark), "src", "dst").persist()
    deg = g._degrees(und)
    ranked = und.join(
        deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u"
    ).join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("hi"),
    ).persist()
    adj = oriented.groupBy("lo").agg(
        F.sort_array(F.collect_list("hi")).alias("nbrs")
    )
    return (
        oriented.join(
            adj.select(F.col("lo").alias("lo"), F.col("nbrs").alias("nu")),
            "lo",
        )
        .join(adj.select(F.col("lo").alias("hi"), F.col("nbrs").alias("nv")), "hi")
        .select(F.size(F.array_intersect("nu", "nv")).cast("bigint").alias("k"))
        .agg(F.coalesce(F.sum("k"), F.lit(0)).cast("bigint").alias("n_triangles"))
    )


def q231_triangle_core_live(spark):
    """Same aggregate, but built by the CURRENT graph module internals
    (use after the module's shape changes; falls back to the frozen
    shape above when the internals match)."""
    from cr_data_pipeline_project_spark.operators import graph as g

    und = g._canonical_edges(
        _copurchase_edges(spark), "src", "dst", assume_canonical=True
    ).persist()
    adj = g._adjacency(und, g._degrees(und)).persist()
    return g._triangle_sum_frame(adj)


def q103_index_build_core(spark):
    """The (id, bands, shingles) index frame q103 writes — the frozen
    round-11 shape of dedup.build_neardup_index (two groupBy-id
    passes over the shingle table joined back on id)."""
    from cr_data_pipeline_project_spark.operators import dedup
    from cr_data_pipeline_project_spark.plans.llm_queries import (
        _neardup_corpus_split,
    )

    old, _ = _neardup_corpus_split(spark, SF_DIR)
    n, num_hashes, bands, seed = 5, 64, 32, 42
    rows_per_band = num_hashes // bands
    sh = dedup.shingle_set(old, "text", "doc_id", n)
    sigs = dedup.minhash_signatures(
        old, "text", "doc_id", n, num_hashes, seed, shingles=sh
    )
    band_arr = F.array(
        *[
            F.xxhash64(
                *[
                    F.col("sig")[j * rows_per_band + r]
                    for r in range(rows_per_band)
                ]
            )
            for j in range(bands)
        ]
    )
    sets_ = sh.groupBy("doc_id").agg(
        F.collect_set(F.xxhash64("shingle")).alias("shingles")
    )
    return sigs.select(F.col("doc_id"), band_arr.alias("bands")).join(
        sets_, "doc_id"
    )


def q103_index_build_core_live(spark):
    """Same index frame built by the CURRENT dedup module internals."""
    from cr_data_pipeline_project_spark.operators import dedup
    from cr_data_pipeline_project_spark.plans.llm_queries import (
        _neardup_corpus_split,
    )

    old, _ = _neardup_corpus_split(spark, SF_DIR)
    return dedup.build_neardup_index_frame(old, "text", "doc_id")


CAPTURES = {
    "q231_triangle_core": q231_triangle_core,
    "q231_triangle_core_live": q231_triangle_core_live,
    "q103_index_build_core": q103_index_build_core,
    "q103_index_build_core_live": q103_index_build_core_live,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--explain-dir", default="plans/r12")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    spark = get_session("explain-internal")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.explain_dir, exist_ok=True)
    for name in args.names:
        df = CAPTURES[name](spark)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
