"""Write a SINGLETON-GROUP copy of a fixture directory — the eighth
data-shape adversary (shuffle → order, skew → hot keys, nullify →
missing values, extremes → magnitudes, ties → equal timestamps,
unitext → ASCII-only luck, const → variance luck, singleton →
group-size luck).

The const adversary zeroed VARIANCE (many rows, one value); this one
zeroes the SAMPLE SIZE: a group with exactly ONE row makes every
n−1 denominator zero (sample stddev/variance, autocorrelation,
regression residual df, Welch components), every min==max range
empty, every "previous row" window frame NULL, and every
distribution a point mass. That is a DIFFERENT zero from zero
variance — stddev of a singleton is 0/0, not 0 — and real catalogs
are full of it: a brand-new event type fires once, a source uploads
its first document, a label appears once in a census. Clean
fixtures have no singleton event_type / source / segment /
priority, so every n−1 contract has been accidentally unexecuted.

Mutations (deterministic, no RNG):
- **one singleton event_type**: the LAST event row (max event_id)
  is relabeled 'singleton_type' — a label whose group has n=1 in
  every type-partitioned statistic, census, spine, and rank.
- **one trailing singleton day**: that same row's ts moves to
  midnight 3 days after the fixture's max ts — a day with one
  event AND a two-day gap before it, so calendar spines, daily
  series, trailing windows, and forecast backtests meet a hole
  followed by a point.
- **one singleton source**: the max-doc_id document's source
  becomes 'src_singleton' — per-source rollups, caps, sampling,
  drift and entropy kernels meet a 1-doc source.
- **one singleton market segment / order priority**: the
  max-key customer and order are relabeled the same way.

    python tools/singleton_fixtures.py --src /root/testdata/sf0.001 \
        --dst /tmp/sf0.001_singleton
    python tools/check_oracle.py --sf /tmp/sf0.001_singleton

`tests/test_singleton_invariance.py` runs the group-size-prone
subset of the surface against a singleton copy on every suite run.
"""

from __future__ import annotations

import argparse
import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

SINGLETON_TYPE = "singleton_type"
SINGLETON_SOURCE = "src_singleton"
SINGLETON_SEGMENT = "SINGLETON"
SINGLETON_PRIORITY = "9-SINGLETON"


def _set(tab: pa.Table, col: str, out) -> pa.Table:
    idx = tab.schema.get_field_index(col)
    return tab.set_column(
        idx, tab.schema.field(col), pa.array(out, tab.schema.field(col).type)
    )


def singletonify_dir(src: str, dst: str) -> dict[str, object]:
    """Mutate `src` into `dst`; returns the injected singleton keys
    and the moved timestamp."""
    os.makedirs(dst, exist_ok=True)
    info: dict[str, object] = {}
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        tab = pq.read_table(p)
        n = tab.num_rows
        if t == "events" and n:
            ids = tab["event_id"].to_pylist()
            types = tab["event_type"].to_pylist()
            ts = tab["ts"].to_pylist()
            i = max(range(n), key=lambda k: ids[k])
            types[i] = SINGLETON_TYPE
            max_ts = max(x for x in ts if x is not None)
            lonely = (max_ts + datetime.timedelta(days=3)).replace(
                hour=0, minute=0, second=0, microsecond=0
            )
            ts[i] = lonely
            info.update(
                singleton_event_id=ids[i],
                singleton_day=lonely.isoformat(),
            )
            tab = _set(tab, "event_type", types)
            tab = _set(tab, "ts", ts)
        elif t == "documents" and n:
            ids = tab["doc_id"].to_pylist()
            sources = tab["source"].to_pylist()
            i = max(range(n), key=lambda k: ids[k])
            sources[i] = SINGLETON_SOURCE
            info["singleton_doc_id"] = ids[i]
            tab = _set(tab, "source", sources)
        elif t == "customer" and n:
            ids = tab["c_custkey"].to_pylist()
            segs = tab["c_mktsegment"].to_pylist()
            i = max(range(n), key=lambda k: ids[k])
            segs[i] = SINGLETON_SEGMENT
            info["singleton_custkey"] = ids[i]
            tab = _set(tab, "c_mktsegment", segs)
        elif t == "orders" and n:
            ids = tab["o_orderkey"].to_pylist()
            prios = tab["o_orderpriority"].to_pylist()
            i = max(range(n), key=lambda k: ids[k])
            prios[i] = SINGLETON_PRIORITY
            info["singleton_orderkey"] = ids[i]
            tab = _set(tab, "o_orderpriority", prios)
        pq.write_table(
            tab,
            os.path.join(dst, f"{t}.parquet"),
            row_group_size=max(1, n // 3 + 1),
        )
    return info


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default="/tmp/sf0.001_singleton")
    args = ap.parse_args()
    info = singletonify_dir(args.src, args.dst)
    print(f"singletonified {args.src} into {args.dst}: {info}")


if __name__ == "__main__":
    main()
