"""Write an EXTREME-MAGNITUDE copy of a fixture directory — the
fourth data-shape adversary (shuffle → order luck, skew → hot-key
luck, nullify → clean-column luck, extremes → benign-magnitude luck).

Real numeric columns are not benign: a metric counter wraps into the
millions, a refund posts a large negative balance, one bad sensor
emits 2^24. Code that is only exact on [0, 330]-scale doubles hides
three classes of bug until production:

- **cancellation** — raw-moment kernels (Σx² − (Σx)²/n) lose all
  precision when |mean| ≫ spread; centered kernels survive. One
  event_type group gets a +65536.0 shift so its variance-class
  statistics run at mean ≈ 6.5e4 with spread ≈ 60.
- **domain edges** — log/sqrt/division paths meeting their first
  NEGATIVE value (Spark `F.log` returns NULL, DuckDB `ln()` raises —
  engines genuinely diverge unless the query pins a contract).
- **range blow-ups** — histogram/bin-width/z-score code that derives
  a scale from (max − min) suddenly sees a 1.7e7 range; percentile
  and rank paths see a heavy tail.

Injected values are EXACT POWERS OF TWO (±2^19 … 2^24): exactly
representable as doubles, exact under decimal(38,6) casts, so any
engine/oracle divergence on the mutated copy is a real semantics bug,
never float noise.

Scope: the STATISTICS columns only —
    events.value      (~2% outliers, one event_type group +65536 shift)
    customer.c_acctbal, supplier.s_acctbal (~2% outliers)
Join keys, ids, timestamps, text payloads, and the TPC-H revenue
measures (l_extendedprice etc.) stay untouched: the revenue chains
are decimal end-to-end (exact at any magnitude by construction), and
mutating keys changes the question, not the robustness of the answer.

    python tools/extreme_fixtures.py --src /root/testdata/sf0.001 \
        --dst /tmp/sf0.001_extreme
    python tools/check_oracle.py --sf /tmp/sf0.001_extreme

`tests/test_extreme_invariance.py` runs the magnitude-prone subset of
the surface against an extreme copy on every suite run.
"""

from __future__ import annotations

import argparse
import collections
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# Exact powers of two: bit-exact as double AND under decimal(38,6).
OUTLIERS = (
    1048576.0,  # 2^20
    8388608.0,  # 2^23
    16777216.0,  # 2^24
    -524288.0,  # -2^19
    -2097152.0,  # -2^21
)
GROUP_SHIFT = 65536.0  # 2^16 — mean >> spread for one event_type


def _modal(values) -> object:
    return collections.Counter(v for v in values if v is not None).most_common(1)[0][0]


def _inject(vals, mask, rng: np.random.Generator):
    """Returns (mutated_values, n_injected)."""
    # guarantee the adversary is real at tiny SF: if the Bernoulli
    # mask missed every non-null row (e.g. a 10-row supplier table at
    # sf0.001), force one seeded hit so the column is always stressed
    if not any(m and v is not None for v, m in zip(vals, mask)):
        live = [i for i, v in enumerate(vals) if v is not None]
        if live:
            mask = list(mask)
            mask[live[int(rng.integers(0, len(live)))]] = True
    picks = rng.integers(0, len(OUTLIERS), size=len(vals))
    out = [
        (OUTLIERS[p] if (m and v is not None) else v)
        for v, m, p in zip(vals, mask, picks)
    ]
    n = sum(1 for v, m in zip(vals, mask) if m and v is not None)
    return out, n


def _set(tab: pa.Table, col: str, out) -> pa.Table:
    idx = tab.schema.get_field_index(col)
    return tab.set_column(
        idx, tab.schema.field(col), pa.array(out, tab.schema.field(col).type)
    )


def extremify_dir(
    src: str, dst: str, seed: int = 2029, frac: float = 0.02
) -> dict[str, object]:
    """Mutate `src` into `dst`; returns {'shift_type': <event_type>,
    'n_outliers': {table: count}} describing what moved (other tables
    copy through). Row groups re-chunk like the sibling adversaries so
    physical layout moves too."""
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    info: dict[str, object] = {"n_outliers": {}}
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        tab = pq.read_table(p)
        n = tab.num_rows
        if t == "events":
            vals = tab["value"].to_pylist()
            types = tab["event_type"].to_pylist()
            shift_type = _modal(types)
            info["shift_type"] = shift_type
            # shift the modal group first (exact double arithmetic:
            # v + 2^16 is exact for |v| < 2^37), then overlay outliers
            vals = [
                (v + GROUP_SHIFT) if (ty == shift_type and v is not None) else v
                for v, ty in zip(vals, types)
            ]
            mask = rng.random(n) < frac
            vals, k = _inject(vals, mask, rng)
            info["n_outliers"][t] = int(k)
            tab = _set(tab, "value", vals)
        elif t == "customer":
            mask = rng.random(n) < frac
            vals, k = _inject(tab["c_acctbal"].to_pylist(), mask, rng)
            info["n_outliers"][t] = int(k)
            tab = _set(tab, "c_acctbal", vals)
        elif t == "supplier":
            mask = rng.random(n) < frac
            vals, k = _inject(tab["s_acctbal"].to_pylist(), mask, rng)
            info["n_outliers"][t] = int(k)
            tab = _set(tab, "s_acctbal", vals)
        pq.write_table(
            tab,
            os.path.join(dst, f"{t}.parquet"),
            row_group_size=max(1, n // 3 + 1),
        )
    return info


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default="/tmp/sf0.001_extreme")
    ap.add_argument("--seed", type=int, default=2029)
    ap.add_argument("--frac", type=float, default=0.02)
    args = ap.parse_args()
    info = extremify_dir(args.src, args.dst, args.seed, args.frac)
    print(f"extremified {args.src} into {args.dst}: {info}")


if __name__ == "__main__":
    main()
