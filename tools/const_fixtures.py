"""Write a CONSTANT-COLLAPSE copy of a fixture directory — the
seventh data-shape adversary (shuffle → order, skew → hot keys,
nullify → missing values, extremes → magnitudes, ties → equal
timestamps, unitext → ASCII-only luck, const → variance luck).

Every statistics kernel divides by something: stddev (z-scores,
t-tests, Pearson/Spearman r), Σ(x−x̄)² (OLS slope, autocorrelation,
Durbin-Watson), max−min (range bins, PSI/KS edges), distinct counts
(entropy, vocabulary ratios). The clean fixtures guarantee every
group is dispersed, so every denominator has been accidentally
nonzero — the 0/0 contracts have never executed. Real data
collapses constantly: a stuck sensor emits one value for a week, a
mirrored source uploads the same document ten thousand times, a
promo prices every order identically. Under Spark 4 ANSI mode an
unguarded /0 is a CRASH, not a NaN — exactly the q170 failure class
the null adversary caught.

Mutations (seeded, sf-proportional):
- **one flat event_type group**: every `value` of the modal
  event_type becomes exactly 42.0 — zero variance inside the group
  z-scores, t-tests, correlations, calibration and anomaly kernels
  partition by.
- **one flat DAY**: every value on the modal calendar day becomes
  16.0 — daily aggregation/anomaly/autocorrelation series get a
  zero-dispersion point (day-level kernels partition by day, not
  type, so the type collapse alone never reaches them).
- **one mirrored source**: every documents.text of the modal source
  becomes one fixed sentence (n_chars recomputed) — token stats
  lose their variance, per-source entropy hits 0·log0, and the
  dedup family gets a source-sized exact-duplicate cluster (the
  degenerate limit the 30% skew adversary only approaches).
All constants are small exact integers-as-doubles: bit-exact under
double AND decimal(38,6), so any divergence is semantics.

    python tools/const_fixtures.py --src /root/testdata/sf0.001 \
        --dst /tmp/sf0.001_const
    python tools/check_oracle.py --sf /tmp/sf0.001_const

`tests/test_const_invariance.py` runs the variance-prone subset of
the surface against a collapsed copy on every suite run.
"""

from __future__ import annotations

import argparse
import collections
import os

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

FLAT_TYPE_VALUE = 42.0
FLAT_DAY_VALUE = 16.0
MIRROR_TEXT = (
    "the mirrored source uploads the same boilerplate sentence "
    "every time the crawler returns"
)


def _modal(values) -> object:
    return collections.Counter(v for v in values if v is not None).most_common(1)[0][0]


def _set(tab: pa.Table, col: str, out) -> pa.Table:
    idx = tab.schema.get_field_index(col)
    return tab.set_column(
        idx, tab.schema.field(col), pa.array(out, tab.schema.field(col).type)
    )


def constify_dir(src: str, dst: str) -> dict[str, object]:
    """Mutate `src` into `dst`; returns {'flat_type', 'flat_day',
    'mirror_source', 'n_flat_type', 'n_flat_day', 'n_mirrored'}.
    Deterministic (modal groups), no RNG needed."""
    os.makedirs(dst, exist_ok=True)
    info: dict[str, object] = {}
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        tab = pq.read_table(p)
        n = tab.num_rows
        if t == "events":
            vals = tab["value"].to_pylist()
            types = tab["event_type"].to_pylist()
            days = [x.date() if x is not None else None for x in tab["ts"].to_pylist()]
            flat_type = _modal(types)
            flat_day = _modal(days)
            n_ft = n_fd = 0
            for i in range(n):
                if vals[i] is None:
                    continue
                if types[i] == flat_type:
                    vals[i] = FLAT_TYPE_VALUE
                    n_ft += 1
                elif days[i] == flat_day:
                    vals[i] = FLAT_DAY_VALUE
                    n_fd += 1
            info.update(
                flat_type=flat_type,
                flat_day=str(flat_day),
                n_flat_type=n_ft,
                n_flat_day=n_fd,
            )
            tab = _set(tab, "value", vals)
        elif t == "documents":
            texts = tab["text"].to_pylist()
            sources = tab["source"].to_pylist()
            mirror = _modal(sources)
            n_m = 0
            for i in range(n):
                if sources[i] == mirror and texts[i] is not None:
                    texts[i] = MIRROR_TEXT
                    n_m += 1
            info.update(mirror_source=mirror, n_mirrored=n_m)
            tab = _set(tab, "text", texts)
            tab = _set(
                tab,
                "n_chars",
                [
                    len(x) if x is not None else None
                    for x in texts
                ],
            )
        pq.write_table(
            tab,
            os.path.join(dst, f"{t}.parquet"),
            row_group_size=max(1, n // 3 + 1),
        )
    return info


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default="/tmp/sf0.001_const")
    args = ap.parse_args()
    info = constify_dir(args.src, args.dst)
    print(f"constified {args.src} into {args.dst}: {info}")


if __name__ == "__main__":
    main()
