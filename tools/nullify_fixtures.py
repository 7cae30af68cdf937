"""Write a NULL-injected copy of a fixture directory — the missing-
value adversary that completes the data-shape trio (shuffle → order
luck, skew → hot keys, nullify → missing values).

Real pipelines see nulls long before 100 TB: a tracker that stopped
sending `value`, a crawler that never filled `lang`, a JSON payload
field that is simply absent. A query is null-correct when the ENGINE
(Spark DataFrame code) and its SQL oracle agree on the same nulled
input — any disagreement is a real bug hiding behind clean fixtures
(a pandas kernel that chokes on NaN, an un-coalesced division, a
comparison that silently drops null rows on one engine only).

Scope: seeded ~`frac` nulls into OPTIONAL ATTRIBUTE and CATEGORY
LABEL columns —
    events.value, events.props, events.event_type,
    documents.lang, documents.source,
    customer.c_acctbal, customer.c_mktsegment,
    supplier.s_acctbal, part.p_size, orders.o_orderpriority
Join keys, ids, timestamps, the revenue measures that define the
TPC-H shapes, and text/embedding payloads stay non-null: nulling
those changes the QUESTION (what does a null join key even mean?),
not the robustness of the answer. Category labels (event_type,
source) ARE in scope — an unlabeled event or an unattributed crawl
page is routine upstream, and the label columns drive
groupBy/window/rank paths where the engines' null-ordering and
null-join semantics genuinely differ (this axis caught q116, q167
and q170 in round 11; each now carries an explicit null contract).

    python tools/nullify_fixtures.py --src /root/testdata/sf0.001 \
        --dst /tmp/sf0.001_nullified
    python tools/check_oracle.py --sf /tmp/sf0.001_nullified

`tests/test_null_invariance.py` runs the null-prone subset of the
surface against a nullified copy on every suite run.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# table -> columns that may plausibly arrive null from upstream
NULLABLE = {
    "events": ["value", "props", "event_type"],
    "documents": ["lang", "source"],
    "orders": ["o_orderpriority"],
    "customer": ["c_acctbal", "c_mktsegment"],
    "supplier": ["s_acctbal"],
    "part": ["p_size"],
}


def nullify_dir(src: str, dst: str, seed: int = 3301, frac: float = 0.05) -> dict[str, int]:
    """Null ~frac of each curated column in `src` into `dst`;
    returns {table.column: nulls_injected}. Single-file parquet so
    DuckDB view registration in tools/check_oracle.py works
    unchanged; row groups re-chunk so layout moves too."""
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    injected: dict[str, int] = {}
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        tab = pq.read_table(p)
        n = tab.num_rows
        for col in NULLABLE.get(t, []):
            idx = tab.schema.get_field_index(col)
            if idx < 0:
                continue
            mask = rng.random(n) < frac
            vals = tab[col].to_pylist()
            vals = [None if m else v for v, m in zip(vals, mask)]
            tab = tab.set_column(
                idx,
                tab.schema.field(col),
                pa.array(vals, tab.schema.field(col).type),
            )
            injected[f"{t}.{col}"] = int(mask.sum())
        pq.write_table(
            tab,
            os.path.join(dst, f"{t}.parquet"),
            row_group_size=max(1, n // 3 + 1),
        )
    return injected


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default="/tmp/sf0.001_nullified")
    ap.add_argument("--seed", type=int, default=3301)
    ap.add_argument("--frac", type=float, default=0.05)
    args = ap.parse_args()
    injected = nullify_dir(args.src, args.dst, args.seed, args.frac)
    print(f"nullified {args.src} into {args.dst}: {injected}")


if __name__ == "__main__":
    main()
