"""Write a row-PERMUTED copy of a fixture directory — the
order-invariance adversary.

Hash-exact oracle parity must not depend on the physical layout of
the input parquet: row order, row-group boundaries, and file-internal
ordering are all storage accidents, and any query whose result
changes when they change is depending on luck (an un-tiebroken
row_number, a first()/limit without order, a float fold whose
partial order follows input order). This tool deterministically
permutes every table's rows (seeded), re-chunks the row groups, and
writes SINGLE-file parquet (so DuckDB's `read_parquet('<file>')`
view registration in tools/check_oracle.py works unchanged). Running
the full oracle sweep against the shuffled copy is then a one-liner:

    python tools/shuffle_fixtures.py --src /root/testdata/sf0.001 \
        --dst /tmp/sf0.001_shuffled
    python tools/check_oracle.py --sf /tmp/sf0.001_shuffled

`tests/test_order_invariance.py` runs the order-sensitive-prone
subset of the surface against a shuffled copy on every suite run.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def shuffle_dir(src: str, dst: str, seed: int = 1009) -> list[str]:
    """Permute every table in `src` into `dst`; returns the tables
    written. Row groups are re-chunked to ~1/3 of the table so the
    group boundaries move too (a query depending on row-group-local
    luck also fails the sweep)."""
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    written = []
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        tab = pq.read_table(p)
        n = tab.num_rows
        perm = rng.permutation(n)
        shuffled = tab.take(perm)
        pq.write_table(
            shuffled,
            os.path.join(dst, f"{t}.parquet"),
            row_group_size=max(1, n // 3 + 1),
        )
        written.append(t)
    return written


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default="/tmp/sf0.001_shuffled")
    ap.add_argument("--seed", type=int, default=1009)
    args = ap.parse_args()
    written = shuffle_dir(args.src, args.dst, args.seed)
    print(f"shuffled {len(written)} tables from {args.src} into {args.dst}")


if __name__ == "__main__":
    main()
