"""Missing-value invariance gate — the third data-shape adversary.

Round 10 killed order-luck (shuffle), round 11 killed hot-key luck
(skew); this gate kills CLEAN-COLUMN luck: seeded ~5% nulls into the
plausibly-optional attribute columns (events.value/props,
documents.lang, customer.c_acctbal/c_mktsegment, supplier.s_acctbal,
part.p_size, orders.o_orderpriority — tools/nullify_fixtures.py) and
oracle parity re-checked for the null-PRONE subset: every query that
aggregates, windows, joins, bands, or groups over a nulled column.

This adversary found FIVE real divergences in round 11. Attribute
nulls: q233's SQL NOT-EXISTS put every null-size point on the
Pareto frontier while the Spark sweep dropped them; q256's
cumulative EMD ordered null bands differently per engine (plus a
shared flaw — a null-QI group's cells silently vanished from the
densified grid). Label nulls (event_type): q170 CRASHED with an
ANSI divide-by-zero (the null-type group's calendar spine never
re-joined its counts), q167's oracle JOIN USING dropped the
null-type group the engine's window kept, and q116's rank tiebreak
put the null label at opposite ends per engine (Spark nulls-first
asc, DuckDB nulls-last), shifting every rank below it. Each now
carries an explicit null contract, pinned here.
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


nullify_fixtures = _load_tool("nullify_fixtures")
check_oracle = _load_tool("check_oracle")

# Queries that aggregate/window/band/group over a nulled column:
# events.value (percentiles, z-scores, windows, anomaly tripwire),
# events.props (JSON extraction), events.event_type (label censuses,
# calendar spines, rank tiebreaks — the round-11 catches),
# documents.lang + source (lang joins, MI, kappa truth, per-source
# rollups), customer.c_acctbal + c_mktsegment (governance triptych,
# idle-premium threshold), part.p_size (skyline, Q16/Q19 shapes),
# orders.o_orderpriority (priority shares/splits).
NULL_PRONE = [
    "q17_json_extract",
    "q22_priority_share",
    "q28_tumbling_window",
    "q46_rollup",
    "q53_group_zscore",
    "q71_event_percentiles",
    "q81_event_funnel",
    "q116_windowed_heavy_hitters",
    "q126_source_token_mix",
    "q137_daily_event_anomaly",
    "q150_disjunctive_parts_revenue",
    "q152_idle_premium_customers",
    "q159_supplier_part_breadth",
    "q167_cusum_changepoint",
    "q169_daily_autocorrelation",
    "q170_dow_seasonality",
    "q175_kanon_census",
    "q203_event_transition_matrix",
    "q224_source_lang_mutual_info",
    "q233_pareto_frontier",
    "q249_l_diversity_census",
    "q256_t_closeness_audit",
    "q259_langid_cohens_kappa",
]


@pytest.fixture(scope="module")
def nullified_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("nullified") / "sf0.001")
    injected = nullify_fixtures.nullify_dir(
        "/root/testdata/sf0.001", dst, seed=3301
    )
    # the adversary must be real: nulls actually landed in the
    # event/document/customer/part/order attribute columns
    assert injected.get("events.value", 0) > 0
    assert injected.get("events.event_type", 0) > 0
    assert injected.get("documents.lang", 0) > 0
    assert injected.get("documents.source", 0) > 0
    assert injected.get("customer.c_acctbal", 0) > 0
    assert injected.get("part.p_size", 0) > 0
    assert injected.get("orders.o_orderpriority", 0) > 0
    return dst


@pytest.fixture(scope="module")
def duck(nullified_dir):
    con = duckdb.connect()
    for t in nullify_fixtures.TABLES:
        p = os.path.join(nullified_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


def test_null_prone_queries_survive_missing_values(
    spark, nullified_dir, duck
):
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = [n for n in NULL_PRONE if n not in qs or n not in oracles]
    assert not missing, f"subset names drifted: {missing}"

    failures = []
    for name in NULL_PRONE:
        spark_pdf = qs[name](spark, nullified_dir).toPandas()
        duck_pdf = duck.execute(oracles[name]).fetchdf()
        problems = check_oracle.compare(name, spark_pdf, duck_pdf)
        if problems:
            failures.append((name, problems))
    assert not failures, failures
