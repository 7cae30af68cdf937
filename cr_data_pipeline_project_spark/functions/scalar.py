"""Scalar column functions re-expressing the reference's row-wise
Python (SURVEY.md §2.7). All are pure Column expressions — JVM-side,
whole-stage-codegen friendly; zero Python UDFs (§2.9 conclusion).

Reference citations are to /root/reference.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Battle-time wire format: '20250913T071510.000Z'
# (api_extract.py:213-214 — pd.to_datetime(format='%Y%m%dT%H%M%S.%fZ',
#  errors='coerce'); invalid inputs must become NULL, which
#  try_to_timestamp gives natively.)
BATTLE_TIME_FMT = "yyyyMMdd'T'HHmmss.SSSX"


def parse_battle_time(col: Column | str) -> Column:
    """Strict timestamp parse with coercion-to-null (P12)."""
    return F.try_to_timestamp(F.col(col) if isinstance(col, str) else col,
                              F.lit(BATTLE_TIME_FMT))


def synth_match_key(battle_time: Column | str, player_id: Column | str) -> Column:
    """``match_key = str(battle_time) + '_' + player_id`` (P10,
    api_extract.py:216). The string form is pinned with date_format —
    never a default timestamp cast — so engines agree byte-for-byte."""
    bt = F.col(battle_time) if isinstance(battle_time, str) else battle_time
    pid = F.col(player_id) if isinstance(player_id, str) else player_id
    return F.concat(F.date_format(bt, "yyyy-MM-dd HH:mm:ss"), F.lit("_"), pid)


def url_encode_id(col: Column | str) -> Column:
    """'#' → '%23' (P11; api_extract.py:62,128)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(c, F.lit("#"), F.lit("%23"))


def url_decode_id(col: Column | str) -> Column:
    """'%23' → '#' (etl_pipeline_script.py:59,75,121)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(c, F.lit("%23"), F.lit("#"))


def is_win(crowns: Column | str, opp_crowns: Column | str) -> Column:
    """Boolean derivation ``is_win = crowns > opp_crowns`` (P9,
    api_extract.py:212)."""
    c = F.col(crowns) if isinstance(crowns, str) else crowns
    o = F.col(opp_crowns) if isinstance(opp_crowns, str) else opp_crowns
    return c > o


def tower_hp(arr: Column | str, pos: int) -> Column:
    """Positional array access with 0 default (P13,
    api_extract.py:218-219): ``x[pos] if len(x) > pos else 0``.
    ``try_element_at`` is 1-based and NULL out-of-bounds (plain
    ``element_at`` *throws* under ANSI mode, the Spark 4 default)."""
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.coalesce(F.try_element_at(c, F.lit(pos + 1)), F.lit(0))
