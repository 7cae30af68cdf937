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
from cr_data_pipeline_project_spark.plans import (
    GATE_OVERFLOW,
    GATE_PENDING,
    GATE_SLOTS,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_gate_window_is_all_oracled():
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    window = names[:GATE_SLOTS]
    not_oracled = [n for n in window if n not in oracles]
    assert not not_oracled, f"rows-only queries inside gate window: {not_oracled}"


def test_only_driver_attested_queries_parked():
    """Rotation policy (round-2 verdict): the overflow set must hold
    only queries the driver itself attested green in a past round —
    parking a never- or red-attested query would hide it from the
    hard signal indefinitely.

    Each driver CORRECTNESS file contains only the queries that were
    inside the gate window THAT round, so a parked query is resolved
    against the most recent file that *contains* it (round-3 verdict,
    "What's wrong #1") — checking only the latest file would turn the
    suite red every time the driver emits a new file.
    """
    benches = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
        reverse=True,
    )
    if not benches:
        return  # round 1: no driver record yet
    records = []
    for path in benches:
        with open(path) as f:
            records.append((path, json.load(f)))

    def latest_row(name):
        for path, rec in records:
            if name in rec:
                return path, rec[name]
        return None, None

    bad = []
    for n in GATE_OVERFLOW:
        path, row = latest_row(n)
        if row is None:
            bad.append(f"{n} (no driver row in any CORRECTNESS file)")
        elif not row.get("hash_match"):
            bad.append(f"{n} (not green in {os.path.basename(path)})")
    assert not bad, f"parked without a driver-green row: {bad}"


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


def test_pending_queries_never_driver_attested():
    """GATE_PENDING is ONLY for brand-new oracled queries awaiting
    their first rotation: a query with any past driver row belongs in
    the window or GATE_OVERFLOW — letting it sit in pending would
    dodge re-attestation indefinitely."""
    benches = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    seen = set()
    for path in benches:
        with open(path) as f:
            seen |= set(json.load(f))
    stale = [n for n in GATE_PENDING if n in seen]
    assert not stale, (
        f"GATE_PENDING holds driver-attested queries (rotate them "
        f"into the window or GATE_OVERFLOW): {stale}"
    )


def test_cadence_comment_count():
    """The rotation-cadence comment in plans/__init__.py states the
    oracled-query count in prose ("… N oracled queries share 50
    slots"). That number drifted three rounds in a row (r8-r10
    ADVICE), so parse it out of the source and assert it against the
    real surface: len(GATE_OVERFLOW) + GATE_SLOTS must equal the
    total oracled count, and the prose number must match both."""
    import cr_data_pipeline_project_spark.plans as plansmod

    src_path = plansmod.__file__
    with open(src_path) as f:
        src = f.read()
    m = re.search(r"(\d+) oracled queries\s*#?\s*\n?#? ?share", src)
    assert m, "cadence comment ('N oracled queries share …') missing"
    stated = int(m.group(1))
    oracled = len(plansmod.all_oracles())
    assert stated == oracled, (
        f"plans/__init__.py cadence comment says {stated} oracled "
        f"queries but the surface has {oracled} — update the comment"
    )
    assert len(GATE_OVERFLOW) + len(GATE_PENDING) + GATE_SLOTS == oracled, (
        f"window arithmetic drifted: {len(GATE_OVERFLOW)} parked + "
        f"{len(GATE_PENDING)} pending + {GATE_SLOTS} slots != {oracled}"
    )
    # COVERAGE.md states the parked count in prose too — same drift
    # class (round-11: it said 173 while GATE_OVERFLOW held 193)
    with open(os.path.join(REPO, "docs", "COVERAGE.md")) as f:
        cov = f.read()
    m = re.search(r"the (\d+) oracled\s*\n?queries past the window", cov)
    assert m, "COVERAGE.md parked-count sentence missing"
    assert int(m.group(1)) == len(GATE_OVERFLOW), (
        f"COVERAGE.md says {m.group(1)} parked oracled queries but "
        f"GATE_OVERFLOW holds {len(GATE_OVERFLOW)}"
    )


def test_pending_registered_right_after_window():
    """Pending queries sit immediately after the gate window (so the
    next rotation naturally pulls them in) and are all oracled."""
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    tail = names[GATE_SLOTS : GATE_SLOTS + len(GATE_PENDING)]
    assert tail == [n for n in GATE_PENDING if n in names]
    assert all(n in oracles for n in GATE_PENDING)
