"""The reference's analytical layer over the domain lake — its 2 SQL
views and 2 stored procedures re-expressed as DataFrame builders
(/root/reference/sql/db_creation_script.sql:185-242). This is the
surface a reference user queries from Power BI; here each is a
function of the lake, also usable as temp views for spark.sql.

Cast/round placement follows the procs exactly (SURVEY.md P17/P18):
``ROUND(SUM(CAST(is_win AS FLOAT)) / COUNT(match_view_id) * 100, 2)``
and the DECIMAL(5,2) usage rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .pipeline import Lake


def vw_recent_rankings(lake: Lake, top_n: int = 100) -> DataFrame:
    """db_creation_script.sql:185-194 — TOP 100 of the latest season
    by rank, joined to player names."""
    sr = lake.read("season_rankings")
    players = lake.read("players")
    latest = sr.agg(F.max("season_id").alias("season_id"))
    return (
        sr.join(F.broadcast(latest), "season_id")
        .join(players, "player_id")
        .select("player_id", "player_name", "season_id", "rank", "rating")
        .orderBy("rank", "player_id")
        .limit(top_n)
    )


def vw_player_clan(lake: Lake) -> DataFrame:
    """db_creation_script.sql:197-205 — players with clan attributes
    (inner join: clanless players excluded, as in the view). Column
    set matches the view exactly: (player_id, player_name, clan_name,
    clan_score, members)."""
    players = lake.read("players")
    clans = lake.read("clans")
    return players.join(clans, "clan_id").select(
        "player_id",
        "player_name",
        "clan_name",
        "clan_score",
        "members",
    )


def usp_player_win_rate(lake: Lake, player_id: str, season_id: str) -> DataFrame:
    """db_creation_script.sql:209-221 — win rate of one player in one
    season. The proc GROUPs BY player_id, so a player with no matches
    yields an EMPTY result set (not a NULL row), and player_id is
    part of the output shape."""
    matches = lake.read("matches")
    scoped = matches.where(
        (F.col("player_id") == player_id) & (F.col("season_id") == season_id)
    )
    cnt = F.count("match_view_id")
    return scoped.groupBy("player_id").agg(
        F.round(F.sum(F.col("is_win").cast("double")) / cnt * 100, 2).alias(
            "win_rate"
        )
    )


def usp_card_usage_wins(lake: Lake, card_name: str, season_id: str) -> DataFrame:
    """db_creation_script.sql:224-241 — a card's usage rate (share of
    the season's match views, DECIMAL(5,2)) and win rate, sorted
    usage desc, win desc. The proc's @card parameter matches
    ``c.card_name`` (not the id), so homonymous cards each produce a
    row (GROUP BY card_id, card_name)."""
    matches = lake.read("matches")
    match_cards = lake.read("match_cards")
    cards = lake.read("cards")
    season_total = matches.where(F.col("season_id") == season_id).agg(
        F.count("match_view_id").alias("season_total")
    )
    wanted = cards.where(F.col("card_name") == card_name).select(
        "card_id", "card_name"
    )
    joined = (
        match_cards.join(F.broadcast(wanted), "card_id")
        .join(
            matches.where(F.col("season_id") == season_id).select(
                "match_view_id", "is_win"
            ),
            "match_view_id",
        )
    )
    cnt = F.count("match_view_id")
    return (
        joined.crossJoin(F.broadcast(season_total))
        .groupBy("card_id", "card_name", "season_total")
        .agg(
            (cnt * 1.0 / F.first("season_total") * 100)
            .cast("decimal(5,2)")
            .alias("usage_rate"),
            F.round(F.sum(F.col("is_win").cast("double")) / cnt * 100, 2).alias(
                "win_rate"
            ),
        )
        .drop("season_total")
        .orderBy(F.desc("usage_rate"), F.desc("win_rate"))
    )


def register_views(lake: Lake) -> None:
    """Expose the layer to spark.sql (the BI/ODBC boundary becomes
    temp views; a Thrift/Connect server would mount the same)."""
    vw_recent_rankings(lake).createOrReplaceTempView("vw_recent_rankings")
    vw_player_clan(lake).createOrReplaceTempView("vw_player_clan")
