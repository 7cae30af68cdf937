"""Scalar function surface (SURVEY.md §2.7) + season calendar."""

from .scalar import (  # noqa: F401
    is_win,
    parse_battle_time,
    synth_match_key,
    tower_hp,
    url_decode_id,
    url_encode_id,
)
from .calendar import season_calendar, seasons_for_range  # noqa: F401
