"""CSV corpus loader (sources/csvfile.py): routing taxonomy,
conservation contract, and the probe-parse split between structural
and type failures — mirroring the JSONL loader's test posture."""

import os

import pytest
from pyspark.sql import types as T

from cr_data_pipeline_project_spark.sources import csvfile
from cr_data_pipeline_project_spark.sources.jsonl import quarantine_report

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

LINES = [
    "id,name,score",          # header_line
    "1,alpha,2.5",            # clean
    "2,beta,",                # clean (score null) unless required
    '3,"unclosed,1.0',        # malformed_csv (quoting)
    "4,gamma",                # malformed_csv (arity low)
    "5,delta,1.0,EXTRA",      # malformed_csv (arity high)
    "x,epsilon,1.0",          # type_mismatch (id)
    "6,zeta,not_a_number",    # type_mismatch (score)
    "",                       # blank_line
    "   ",                    # blank_line
    "7,eta,3.25",             # clean
]


def _write(tmp_path, lines, name="corpus.csv"):
    p = os.path.join(str(tmp_path), name)
    with open(p, "w") as f:
        f.write("\n".join(lines))
    return p


def test_every_line_routed_exactly_once(spark, tmp_path):
    path = _write(tmp_path, LINES)
    clean, quarantine = csvfile.read_csv_corpus(spark, path, SCHEMA)
    assert clean.count() + quarantine.count() == len(LINES)


def test_reason_taxonomy(spark, tmp_path):
    path = _write(tmp_path, LINES)
    clean, quarantine = csvfile.read_csv_corpus(spark, path, SCHEMA)
    reasons = {
        r["raw_line"]: r["reason"] for r in quarantine.collect()
    }
    assert reasons["id,name,score"] == "header_line"
    assert reasons['3,"unclosed,1.0'] == "malformed_csv"
    assert reasons["4,gamma"] == "malformed_csv"
    assert reasons["5,delta,1.0,EXTRA"] == "malformed_csv"
    assert reasons["x,epsilon,1.0"] == "type_mismatch"
    assert reasons["6,zeta,not_a_number"] == "type_mismatch"
    assert reasons[""] == "blank_line"
    assert reasons["   "] == "blank_line"
    got = {(r["id"], r["name"], r["score"]) for r in clean.collect()}
    assert got == {(1, "alpha", 2.5), (2, "beta", None), (7, "eta", 3.25)}


def test_required_field_quarantines_null(spark, tmp_path):
    path = _write(tmp_path, LINES)
    clean, quarantine = csvfile.read_csv_corpus(
        spark, path, SCHEMA, required=("score",)
    )
    reasons = {r["raw_line"]: r["reason"] for r in quarantine.collect()}
    assert reasons["2,beta,"] == "missing_required:score"
    assert clean.count() == 2
    assert clean.count() + quarantine.count() == len(LINES)


def test_custom_separator(spark, tmp_path):
    path = _write(tmp_path, ["1|alpha|2.5", "2|beta|oops"], "pipe.csv")
    clean, quarantine = csvfile.read_csv_corpus(
        spark, path, SCHEMA, sep="|"
    )
    assert clean.count() == 1
    assert [r["reason"] for r in quarantine.collect()] == ["type_mismatch"]


def test_reserved_corrupt_name_rejected(spark, tmp_path):
    bad = T.StructType([T.StructField("__corrupt_record", T.StringType())])
    path = _write(tmp_path, ["x"], "bad.csv")
    with pytest.raises(ValueError, match="reserved"):
        csvfile.read_csv_corpus(spark, path, bad)


def test_quarantine_report_shared_with_jsonl(spark, tmp_path):
    """The JSONL quarantine_report consumes the CSV quarantine
    unchanged — one feed schema across loaders."""
    path = _write(tmp_path, LINES)
    _, quarantine = csvfile.read_csv_corpus(spark, path, SCHEMA)
    rep = {
        r["reason"]: r["n_lines"]
        for r in quarantine_report(quarantine).collect()
    }
    assert rep == {
        "header_line": 1,
        "malformed_csv": 3,
        "type_mismatch": 2,
        "blank_line": 2,
    }


def test_streaming_csv_ingest_matches_batch(spark, tmp_path):
    """Micro-batch CSV landing routes every line exactly as the
    batch loader does (shared split_csv), and line totals reconcile
    across the two sinks."""
    import os as _os

    from cr_data_pipeline_project_spark.streaming.incremental import (
        streaming_csv_corpus_ingest,
    )

    src = _os.path.join(str(tmp_path), "csv_src")
    _os.makedirs(src)
    for i, chunk in enumerate([LINES[:4], LINES[4:8], LINES[8:]]):
        with open(_os.path.join(src, f"part{i}.csv"), "w") as f:
            f.write("\n".join(chunk))
    clean_p = _os.path.join(str(tmp_path), "clean")
    quar_p = _os.path.join(str(tmp_path), "quar")

    q = streaming_csv_corpus_ingest(
        spark,
        src,
        SCHEMA,
        clean_p,
        quar_p,
        _os.path.join(str(tmp_path), "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    clean = spark.read.parquet(clean_p)
    quar = spark.read.parquet(quar_p)
    assert clean.count() + quar.count() == len(LINES)

    # routing equals the batch loader's on the same lines
    batch_clean, batch_quar = csvfile.read_csv_corpus(
        spark, src, SCHEMA
    )
    key = lambda df, cols: sorted(tuple(r) for r in df.select(*cols).collect())
    assert key(clean, SCHEMA.fieldNames()) == key(
        batch_clean, SCHEMA.fieldNames()
    )
    assert key(quar, ["raw_line", "reason"]) == key(
        batch_quar, ["raw_line", "reason"]
    )
