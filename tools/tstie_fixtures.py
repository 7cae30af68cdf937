"""Write a TIMESTAMP-TIE copy of a fixture directory — the fifth
data-shape adversary (shuffle → order, skew → hot keys, nullify →
missing values, extremes → magnitudes, ties → equal timestamps).

The clean fixtures have a dirty secret: every `events.ts` is unique
(1000/1000 distinct at sf0.001), so every `Window.orderBy(ts)`,
sessionization lag, as-of probe, and "latest event" argmax in the
engine has been accidentally TOTAL — a missing tiebreak can never
show. Real event streams tie constantly (second-granularity client
clocks, batched flushes, backfilled midnights), and at 100 TB a
window whose intra-tie order is engine-dependent returns different
rows on every run. This tool manufactures three tie shapes, seeded:

- **within-user ties** (~10% of rows): a row's ts is overwritten
  with the ts of another row of the SAME user — lag/lead, session
  gap, first/last-in-session and rank-by-recency paths all see
  equal-ts neighbours inside one ordered group.
- **midnight snaps** (~3%): ts truncated to 00:00:00.000000 of its
  own day — rows land EXACTLY on tumbling-window / date_trunc /
  calendar-spine boundaries (boundary must be half-open the same
  way on both engines) and tie with each other across users.
- **one hot instant** (~1%): a single seeded midnight shared by rows
  across ALL users — a global tie spike for global orderings,
  windowed heavy hitters, and as-of joins probing exactly that
  boundary.

Only `events.ts` moves; every other column and table copies through
(single-file parquet, same as the sibling adversaries, so DuckDB
view registration in tools/check_oracle.py works unchanged).

    python tools/tstie_fixtures.py --src /root/testdata/sf0.001 \
        --dst /tmp/sf0.001_tsties
    python tools/check_oracle.py --sf /tmp/sf0.001_tsties

`tests/test_tstie_invariance.py` runs the order-by-ts subset of the
surface against a tied copy on every suite run.
"""

from __future__ import annotations

import argparse
import collections
import datetime
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _midnight(ts: datetime.datetime) -> datetime.datetime:
    return ts.replace(hour=0, minute=0, second=0, microsecond=0)


def tieify_dir(
    src: str,
    dst: str,
    seed: int = 2031,
    frac_user: float = 0.10,
    frac_midnight: float = 0.03,
    frac_hot: float = 0.01,
) -> dict[str, object]:
    """Mutate `src` into `dst`; returns {'hot_instant': ts, 'n_user_ties':
    k, 'n_midnight': k, 'n_hot': k, 'n_distinct_before'/'after': k}."""
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    info: dict[str, object] = {}
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        tab = pq.read_table(p)
        n = tab.num_rows
        if t == "events":
            ts = tab["ts"].to_pylist()
            users = tab["user_id"].to_pylist()
            info["n_distinct_before"] = len(set(ts))

            by_user: dict[object, list[int]] = collections.defaultdict(list)
            for i, u in enumerate(users):
                by_user[u].append(i)

            # 1) within-user ties: overwrite with a donor row's ts
            #    from the same user (donor keeps its own ts → a tie).
            n_user = 0
            u_mask = rng.random(n) < frac_user
            for i in range(n):
                if not u_mask[i]:
                    continue
                peers = by_user[users[i]]
                if len(peers) < 2:
                    continue
                j = peers[int(rng.integers(0, len(peers)))]
                if j == i:
                    j = peers[(peers.index(i) + 1) % len(peers)]
                ts[i] = ts[j]
                n_user += 1
            info["n_user_ties"] = n_user

            # 2) midnight snaps: exactly on the day boundary.
            m_mask = rng.random(n) < frac_midnight
            n_mid = 0
            for i in range(n):
                if m_mask[i] and not u_mask[i]:
                    ts[i] = _midnight(ts[i])
                    n_mid += 1
            info["n_midnight"] = n_mid

            # 3) one hot instant shared across users: the midnight of
            #    the median day (stays inside the fixture's range).
            days = sorted(_midnight(x) for x in ts)
            hot = days[len(days) // 2]
            h_mask = rng.random(n) < frac_hot
            n_hot = 0
            for i in range(n):
                if h_mask[i]:
                    ts[i] = hot
                    n_hot += 1
            info["n_hot"] = n_hot
            info["hot_instant"] = hot.isoformat()
            info["n_distinct_after"] = len(set(ts))

            idx = tab.schema.get_field_index("ts")
            tab = tab.set_column(
                idx, tab.schema.field("ts"), pa.array(ts, tab.schema.field("ts").type)
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
    ap.add_argument("--dst", default="/tmp/sf0.001_tsties")
    ap.add_argument("--seed", type=int, default=2031)
    args = ap.parse_args()
    info = tieify_dir(args.src, args.dst, args.seed)
    print(f"tie-ified {args.src} into {args.dst}: {info}")


if __name__ == "__main__":
    main()
