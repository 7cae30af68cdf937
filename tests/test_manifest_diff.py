"""Structural properties of the snapshot-diff and shard-manifest
queries beyond hash parity (tests/test_oracle_parity.py covers the
exact oracle match)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.catalog import table
from cr_data_pipeline_project_spark.plans.llm_queries import (
    q96_snapshot_diff,
    q98_shard_manifest,
)


def test_snapshot_diff_statuses_partition_the_sim(spark, sf_dir):
    """Every diff status matches its simulation rule exactly: added =
    docs absent from the prior snapshot, removed = docs absent from
    the current one, changed = truncated-text docs present in both
    (and long enough for the truncation to bite)."""
    rows = q96_snapshot_diff(spark, sf_dir).collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r.status, set()).add(r.doc_id)
    docs = {
        r.doc_id: r.n_chars
        for r in table(spark, "documents", sf_dir)
        .select("doc_id", "n_chars")
        .collect()
    }
    added = {d for d in docs if d % 11 == 0 and d % 13 != 5}
    removed = {d for d in docs if d % 13 == 5 and d % 11 != 0}
    changed = {
        d
        for d, n in docs.items()
        if d % 7 == 0 and d % 11 != 0 and d % 13 != 5 and n > 20
    }
    assert by_status.get("added", set()) == added
    assert by_status.get("removed", set()) == removed
    assert by_status.get("changed", set()) == changed


def test_shard_manifest_balanced(spark, sf_dir):
    """Round-robin by descending token rank keeps shard token sums
    within one max-document of each other, and every doc lands in
    exactly one shard."""
    docs = table(spark, "documents", sf_dir)
    n_docs = docs.count()
    max_tok = docs.select(
        F.max(F.size(F.split("text", " "))).alias("m")
    ).collect()[0].m
    rows = q98_shard_manifest(spark, sf_dir).collect()
    assert len(rows) == 16
    assert sum(r.n_docs for r in rows) == n_docs
    sums = [r.sum_tokens for r in rows]
    assert max(sums) - min(sums) <= max_tok
