"""Kafka source variant (round-4 verdict #9): the production reader
behind the documented swap-one-reader seam. The connector jar is
absent from this sandbox, so the end-to-end reader test skips
gracefully (same posture as the Delta/JDBC backends) while the
source-independent value-parsing half is asserted for real against
the file source's output on identical documents."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from helpers import battle


def _doc(tag="#P1"):
    return json.dumps({"player_tag": tag, "battles": [battle()]})


def test_parse_kafka_battlelog_matches_file_source(spark, tmp_path):
    """Kafka-shaped binary values must decode to exactly the rows the
    file source reads from the same JSON documents — and the
    flatten/dedup pipeline downstream must consume them unchanged."""
    from cr_data_pipeline_project_spark.sources.battlelog import (
        PLAYER_BATTLELOG,
        flatten_matches,
    )
    from cr_data_pipeline_project_spark.streaming.incremental import (
        parse_kafka_battlelog,
    )

    docs = [_doc("#P1"), _doc("#P2"), "not json at all"]
    kafkaish = spark.createDataFrame(
        [(d.encode(),) for d in docs], "value binary"
    )
    parsed = parse_kafka_battlelog(kafkaish)
    # from_json relaxes nullability; names/types must match exactly
    assert parsed.schema.simpleString() == PLAYER_BATTLELOG.simpleString()

    path = os.path.join(str(tmp_path), "b.json")
    with open(path, "w") as f:
        f.write("\n".join(docs) + "\n")
    filed = spark.read.schema(PLAYER_BATTLELOG).json(path)

    key = lambda r: (r["player_tag"] or "",)
    assert sorted(parsed.collect(), key=key) == sorted(
        filed.collect(), key=key
    )
    # downstream consumption: the flatten produces the same matches
    a = {r["match_key"] for r in flatten_matches(parsed).collect()}
    b = {r["match_key"] for r in flatten_matches(filed).collect()}
    assert a == b and len(a) == 2


def test_stream_battlelog_kafka_reader_gated(spark):
    """With the connector jar on the classpath this returns a
    streaming DataFrame of PLAYER_BATTLELOG rows; without it the
    reader raises at .load() and the test skips — never a silent
    pass."""
    from cr_data_pipeline_project_spark.sources.battlelog import (
        PLAYER_BATTLELOG,
    )
    from cr_data_pipeline_project_spark.streaming.incremental import (
        stream_battlelog_kafka,
    )

    try:
        df = stream_battlelog_kafka(spark, "localhost:9092", "battlelog")
    except Exception as exc:  # connector absent in this sandbox
        pytest.skip(f"kafka connector unavailable: {type(exc).__name__}")
    assert df.isStreaming
    assert df.schema.simpleString() == PLAYER_BATTLELOG.simpleString()
