"""Write a key-SKEWED copy of a fixture directory — the data-shape
adversary that complements tools/shuffle_fixtures.py.

The shuffle adversary (round 10) killed order-luck; the remaining
untested data-shape risk is KEY SKEW: real corpora concentrate — one
power user emits a third of the events, one crawler source dominates
the documents, one popular part dominates the order lines, one
boilerplate header repeats across a third of the crawl. A query
whose parity or plan only holds on near-uniform keys (a hot LSH
bucket that explodes, a per-user window that serializes, a salted
join whose salt never engages) hides until production. This tool
deterministically (seeded) reassigns ~`frac` of the rows in each
skew-prone table to ONE hot key:

- ``events.user_id``   → the modal user (sessionization, windows,
  heavy hitters, retention all see one giant per-user group)
- ``documents.source`` → the modal source (per-source caps, PPS
  sampling, mixing, skew census see one dominant source), AND the
  same rows' ``text`` gains a shared boilerplate PREFIX (a hot
  token: near-dup shingles/minhash bands go hot, exercising the
  `_drop_hot_buckets` caps; ``n_chars`` is recomputed so the
  metadata column stays truthful)
- ``lineitem.l_partkey`` → the modal part (hot equi-join key:
  salted join, part-revenue rollups)

All other tables copy through byte-identical semantics (single-file
parquet, like the shuffle tool, so DuckDB `read_parquet` view
registration in tools/check_oracle.py works unchanged). Oracle
parity on the skewed copy is then a one-liner:

    python tools/skew_fixtures.py --src /root/testdata/sf0.001 \
        --dst /tmp/sf0.001_skewed
    python tools/check_oracle.py --sf /tmp/sf0.001_skewed

`tests/test_skew_invariance.py` runs the skew-prone subset of the
surface against a skewed copy on every suite run.
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

BOILERPLATE = (
    "Subscribe to our newsletter for weekly updates. "
    "All rights reserved. Terms of service apply. "
)


def _modal(values) -> object:
    return collections.Counter(v for v in values if v is not None).most_common(1)[0][0]


def _hot_mask(n: int, frac: float, rng: np.random.Generator) -> np.ndarray:
    return rng.random(n) < frac


def _skew_column(tab: pa.Table, col: str, mask: np.ndarray) -> pa.Table:
    vals = tab[col].to_pylist()
    hot = _modal(vals)
    out = [hot if m else v for v, m in zip(vals, mask)]
    idx = tab.schema.get_field_index(col)
    return tab.set_column(idx, tab.schema.field(col), pa.array(out, tab.schema.field(col).type))


def skew_dir(src: str, dst: str, seed: int = 2027, frac: float = 0.30) -> dict[str, object]:
    """Skew `src` into `dst`; returns {table: hot_key} for the tables
    that were skewed (others copy through). Row groups re-chunk to
    ~1/3 of the table so layout moves too."""
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    hot_keys: dict[str, object] = {}
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        tab = pq.read_table(p)
        n = tab.num_rows
        if t == "events":
            mask = _hot_mask(n, frac, rng)
            hot_keys[t] = _modal(tab["user_id"].to_pylist())
            tab = _skew_column(tab, "user_id", mask)
        elif t == "lineitem":
            mask = _hot_mask(n, frac, rng)
            hot_keys[t] = _modal(tab["l_partkey"].to_pylist())
            tab = _skew_column(tab, "l_partkey", mask)
        elif t == "documents":
            mask = _hot_mask(n, frac, rng)
            hot_keys[t] = _modal(tab["source"].to_pylist())
            tab = _skew_column(tab, "source", mask)
            texts = tab["text"].to_pylist()
            texts = [
                (BOILERPLATE + v) if (m and v is not None) else v
                for v, m in zip(texts, mask)
            ]
            ti = tab.schema.get_field_index("text")
            tab = tab.set_column(
                ti, tab.schema.field("text"), pa.array(texts, pa.string())
            )
            # keep the metadata column truthful after the mutation
            ni = tab.schema.get_field_index("n_chars")
            n_chars = pa.array(
                [len(v) if v is not None else None for v in texts],
                tab.schema.field("n_chars").type,
            )
            tab = tab.set_column(ni, tab.schema.field("n_chars"), n_chars)
        pq.write_table(
            tab,
            os.path.join(dst, f"{t}.parquet"),
            row_group_size=max(1, n // 3 + 1),
        )
    return hot_keys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default="/tmp/sf0.001_skewed")
    ap.add_argument("--seed", type=int, default=2027)
    ap.add_argument("--frac", type=float, default=0.30)
    args = ap.parse_args()
    hot = skew_dir(args.src, args.dst, args.seed, args.frac)
    print(f"skewed {args.src} into {args.dst}: hot keys {hot}")


if __name__ == "__main__":
    main()
