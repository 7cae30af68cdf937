"""Every declared query hash-matches its DuckDB oracle at sf0.001
(the driver runs the same comparison at sf0.01 — tools/check_oracle.py
runs that heavier pass on demand)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.check_oracle import TABLES, compare

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


ALL = sorted(entrymod.queries())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(name, spark, duck_con):
    fn = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    sdf = fn(spark, SF)
    spark_pdf = sdf.toPandas()
    if name not in oracles:
        # rows-only contract: must run and return a stable schema
        assert spark_pdf is not None
        return
    duck_pdf = duck_con.execute(oracles[name]).df()
    problems = compare(name, spark_pdf, duck_pdf, verbose=True)
    assert not problems, f"{name}: " + "\n".join(problems)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "usage_rate" in df.columns
