"""Blacklist JSON state (S6/S7): the reference persists failed player
ids in ``dropped_data/dropped_players.json``, read + unioned +
rewritten each run (/root/reference/etl_pipeline_script.py:63-70) and
consulted during extraction (src/api_extract.py:69-70,79).

Here the state is a single JSON array file managed driver-side (it is
O(10²) ids — broadcasting beats distributing), with the union+rewrite
kept atomic via write-to-temp + rename."""

from __future__ import annotations

import json
import os
import tempfile


def read_blacklist(path: str) -> list[str]:
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return list(json.load(f))


def filter_blacklisted(df, id_col: str, blacklist: list[str]):
    """P7 — pre-extraction blacklist filter (api_extract.py:79):
    drop ids on the blacklist BEFORE fetching, so no API budget is
    wasted. Broadcast ~isin for the O(10²) list; switch to a
    left-anti join if the blacklist ever grows large."""
    from pyspark.sql import functions as F

    if not blacklist:
        return df
    return df.where(~F.col(id_col).isin(blacklist))


def merge_blacklist(path: str, new_ids: list[str]) -> list[str]:
    """Union + dedup + rewrite (A8; etl_pipeline_script.py:66-69).
    Returns the merged list (sorted for determinism)."""
    merged = sorted(set(read_blacklist(path)) | set(new_ids))
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(merged, f)
    os.replace(tmp, path)
    return merged
