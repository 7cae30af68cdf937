"""The driver's correctness gate reads only the first GATE_SLOTS
entries of ``queries()`` — assert the registration order keeps every
slot oracled and the critical queries inside the window."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import glob
import json
import re

import __spark_entry__ as entrymod
from cr_data_pipeline_project_spark.plans import GATE_OVERFLOW, GATE_SLOTS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_gate_window_is_all_oracled():
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    window = names[:GATE_SLOTS]
    not_oracled = [n for n in window if n not in oracles]
    assert not not_oracled, f"rows-only queries inside gate window: {not_oracled}"


def test_only_driver_attested_queries_parked():
    """Rotation policy (round-2 verdict): the overflow set must hold
    only queries the driver itself attested green in the most recent
    round — parking a never- or red-attested query would hide it
    from the hard signal indefinitely."""
    benches = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not benches:
        return  # round 1: no driver record yet
    with open(benches[-1]) as f:
        latest = json.load(f)
    bad = [
        n
        for n in GATE_OVERFLOW
        if not latest.get(n, {}).get("hash_match")
    ]
    assert not bad, f"parked without a driver-green row in {benches[-1]}: {bad}"


def test_rows_only_registered_last():
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    rows_only_idx = [i for i, n in enumerate(names) if n not in oracles]
    assert rows_only_idx == list(
        range(len(names) - len(rows_only_idx), len(names))
    )


def test_overflow_names_exist():
    names = set(entrymod.queries())
    stale = [n for n in GATE_OVERFLOW if n not in names]
    assert not stale, f"GATE_OVERFLOW references unknown queries: {stale}"
