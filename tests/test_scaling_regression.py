"""Per-round scaling regression gate (round-4 verdict #5): the 50×
sweep (tools/scaling_probe.py --replicas 50 --out
docs/metrics/scaling_50x.json) is re-recorded each round; this test
compares each query's measured exponent alpha (t ~ n^alpha between
the 5k fixture and the 50× synthesized corpus) against the COMMITTED
baseline in docs/metrics/scaling_baseline.json and fails when one
regresses beyond the threshold — a plan-shape change that turns a
sublinear operator quadratic can't slip through on green fixtures.

Alpha is a log-ratio of two wall-clock minima, so it inherits bench
noise (the repo's documented 2-4× same-code spikes compress to
~±0.2 in alpha at 50×); the threshold is set above that band. A
genuinely quadratic regression moves alpha by ~+1 — far past it.
"""

import json
import math
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP = os.path.join(REPO, "docs", "metrics", "scaling_50x.json")
BASELINE = os.path.join(REPO, "docs", "metrics", "scaling_baseline.json")

# Noise band for a min-of-2 log-ratio at 50x plus headroom; a real
# complexity regression (alpha +~1) is unmissable at this setting.
ALPHA_REGRESSION_THRESHOLD = 0.25

# Linear-BY-CONTRACT probes (round-9 verdict #6): their work is
# Θ(edges) / Θ(corpus bytes) with the probe generator holding
# per-unit cost constant (q108: fixed probe set scans the whole
# corpus; q231: constant average degree ~120, so triangle work is
# Θ(E); q242: every MP3 byte is walked once), so alpha ≈ 1.0 is the
# honest exponent, not a regression. Naming them here keeps the
# global sublinear backstop strict for everything else while giving
# these a dedicated explicit bound — a genuinely superlinear slip
# (alpha ≥ 1.2, e.g. an accidental quadratic wedge set) still
# fails loudly instead of being silently tolerated.
LINEAR_BY_CONTRACT = {
    "q108_verbatim_decontamination",
    "q231_copurchase_triangles",
    "q242_mp3_frame_census",
    # q257 shares q231's contract: triangle/wedge work is Θ(E) with
    # the probe generator holding average degree constant
    "q257_copurchase_clustering",
}
LINEAR_CONTRACT_ALPHA_MAX = 1.2


def _load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def test_scaling_alphas_do_not_regress():
    sweep = _load(SWEEP)
    base = _load(BASELINE)
    if sweep is None:
        pytest.skip("no 50x sweep artifact yet this round — run "
                    "tools/scaling_probe.py --replicas 50 --out " + SWEEP)
    assert base is not None, "committed baseline missing: " + BASELINE
    alphas = base["alphas"]
    regressions = []
    for name, rec in sweep["queries"].items():
        a = rec.get("alpha_vs_5k")
        if a is None:
            regressions.append(f"{name}: sweep recorded no alpha ({rec.get('error')})")
            continue
        b = alphas.get(name)
        if b is None:
            # new probe without a committed baseline: must still be
            # sublinear, and flagged so the baseline gets updated
            limit = (
                LINEAR_CONTRACT_ALPHA_MAX
                if name in LINEAR_BY_CONTRACT
                else 1.0
            )
            assert a < limit, f"{name}: new probe superlinear (alpha={a})"
            continue
        if a > b + ALPHA_REGRESSION_THRESHOLD:
            regressions.append(f"{name}: alpha {a} vs baseline {b}")
    assert not regressions, "scaling exponents regressed: " + "; ".join(regressions)


def test_all_sweep_queries_sublinear():
    """Absolute backstop independent of the baseline: every probed
    operator must scale sublinearly between 5k and 50x — alpha >= 1
    means per-row cost is growing with corpus size, the thing every
    bucketing/pruning design in this repo exists to prevent."""
    sweep = _load(SWEEP)
    if sweep is None:
        pytest.skip("no 50x sweep artifact yet this round")
    bad = {
        name: rec["alpha_vs_5k"]
        for name, rec in sweep["queries"].items()
        if rec.get("alpha_vs_5k") is not None
        and rec["alpha_vs_5k"]
        >= (
            LINEAR_CONTRACT_ALPHA_MAX
            if name in LINEAR_BY_CONTRACT
            else 1.0
        )
    }
    assert not bad, f"superlinear operators at 50x: {bad}"
