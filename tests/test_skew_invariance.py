"""Key-skew invariance gate — the data-shape adversary.

Round-10 closed order-luck (tools/shuffle_fixtures.py); the
remaining untested data-shape risk was KEY SKEW (round-10 verdict
#5). This test skews the sf0.001 fixtures (tools/skew_fixtures.py,
seeded: one user holds ~30% of events, one source ~30% of documents
— with a shared boilerplate prefix as the hot token — and one part
~30% of lineitem) and re-runs oracle parity for the skew-PRONE
subset of the surface: salted joins, sessionization, hot LSH/dedup
buckets, per-source caps/sampling/mixing, concentration and skew
censuses. The full-surface skewed sweep is a one-liner documented in
the tool's docstring and recorded in docs/SCALE.md round 11.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


skew_fixtures = _load_tool("skew_fixtures")
check_oracle = _load_tool("check_oracle")

# Every query whose plan meets a hot key head-on: salted/equi joins
# on the skewed key, per-user sessionization/windows, shingle/band
# dedup (hot buckets), per-source caps/sampling/mixing, and the
# skew/concentration censuses themselves.
SKEW_PRONE = [
    "q29_sessionization",
    "q33_ngram_jaccard_pairs",
    "q34_minhash_lsh_pairs",
    "q35_simhash_pairs",
    "q51_salted_join",
    "q66_dedup_clusters",
    "q80_per_source_dup_stats",
    "q92_cluster_representatives",
    "q116_windowed_heavy_hitters",
    "q126_source_token_mix",
    "q133_sessionization",
    "q148_top_supplier_revenue",
    "q188_per_source_quality_cap",
    "q202_key_skew_census",
    "q206_pps_sample_per_source",
    "q210_effective_tokens_per_source",
]


@pytest.fixture(scope="module")
def skewed_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("skewed") / "sf0.001")
    hot = skew_fixtures.skew_dir("/root/testdata/sf0.001", dst, seed=2027)
    assert set(hot) == {"events", "documents", "lineitem"}
    return dst


@pytest.fixture(scope="module")
def duck(skewed_dir):
    con = duckdb.connect()
    for t in skew_fixtures.TABLES:
        p = os.path.join(skewed_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


def test_skew_tool_actually_skews(skewed_dir):
    """The adversary must be real: the hot key holds >= 25% of rows
    in each skewed table, and documents metadata stays truthful
    (n_chars == len(text))."""
    import collections

    import pyarrow.parquet as pq

    ev = pq.read_table(os.path.join(skewed_dir, "events.parquet"))
    top = collections.Counter(ev["user_id"].to_pylist()).most_common(1)[0][1]
    assert top >= 0.25 * ev.num_rows
    docs = pq.read_table(os.path.join(skewed_dir, "documents.parquet"))
    top = collections.Counter(docs["source"].to_pylist()).most_common(1)[0][1]
    assert top >= 0.25 * docs.num_rows
    li = pq.read_table(os.path.join(skewed_dir, "lineitem.parquet"))
    top = collections.Counter(li["l_partkey"].to_pylist()).most_common(1)[0][1]
    assert top >= 0.25 * li.num_rows
    for text, n in zip(docs["text"].to_pylist(), docs["n_chars"].to_pylist()):
        assert (n is None) == (text is None)
        if text is not None:
            assert n == len(text)


def test_skew_prone_queries_survive_hot_keys(spark, skewed_dir, duck):
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = [n for n in SKEW_PRONE if n not in qs or n not in oracles]
    assert not missing, f"subset names drifted: {missing}"

    failures = []
    for name in SKEW_PRONE:
        spark_pdf = qs[name](spark, skewed_dir).toPandas()
        duck_pdf = duck.execute(oracles[name]).fetchdf()
        problems = check_oracle.compare(name, spark_pdf, duck_pdf)
        if problems:
            failures.append((name, problems))
    assert not failures, failures
