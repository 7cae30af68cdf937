"""JSONL corpus loader with quarantine routing (sources/jsonl.py):
every line lands in exactly one of (clean, quarantine), with
machine-readable reject reasons."""

import json

from pyspark.sql import types as T

from cr_data_pipeline_project_spark.sources.jsonl import (
    quarantine_report,
    read_jsonl_corpus,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

LINES = [
    json.dumps({"doc_id": 1, "text": "hello world", "lang": "en"}),
    json.dumps({"doc_id": 2, "text": "bonjour", "lang": "fr"}),
    '{"doc_id": 3, "text": "truncated',          # malformed JSON
    "",                                           # blank line
    "   ",                                        # whitespace-only
    json.dumps({"doc_id": 4, "lang": "de"}),      # text absent
    json.dumps({"doc_id": None, "text": "x", "lang": "en"}),  # null req
    json.dumps({"doc_id": "not-a-number", "text": "y", "lang": "en"}),
    json.dumps({"doc_id": 5, "text": "extra ok", "lang": "en", "zz": 1}),
]


def _write(tmp_path, lines, name="corpus.jsonl"):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_every_line_routed_exactly_once(spark, tmp_path):
    path = _write(tmp_path, LINES)
    clean, quar = read_jsonl_corpus(
        spark, path, SCHEMA, required=("doc_id", "text")
    )
    assert clean.count() + quar.count() == len(LINES)


def test_clean_rows_and_schema(spark, tmp_path):
    path = _write(tmp_path, LINES)
    clean, _ = read_jsonl_corpus(
        spark, path, SCHEMA, required=("doc_id", "text")
    )
    assert clean.columns == ["doc_id", "text", "lang"]
    rows = {r["doc_id"]: r for r in clean.collect()}
    # 1, 2 are fully valid; 5 is valid with an extra field (ignored)
    assert set(rows) == {1, 2, 5}
    assert rows[1]["text"] == "hello world"
    assert rows[5]["lang"] == "en"


def test_quarantine_reasons(spark, tmp_path):
    path = _write(tmp_path, LINES)
    _, quar = read_jsonl_corpus(
        spark, path, SCHEMA, required=("doc_id", "text")
    )
    by_line = {r["raw_line"]: r["reason"] for r in quar.collect()}
    assert by_line[LINES[2]] == "malformed_json"
    assert by_line[""] == "blank_line"
    assert by_line["   "] == "blank_line"
    # text absent -> first failing required col in declared order
    assert by_line[LINES[5]] == "missing_required:text"
    # explicit null doc_id
    assert by_line[LINES[6]] == "missing_required:doc_id"
    # type-mangled doc_id: valid JSON, field fails its type ->
    # rejected as type_mismatch, not silently admitted w/ null key
    assert by_line[LINES[7]] == "type_mismatch"
    assert all(r["src_file"].endswith("corpus.jsonl") for r in quar.collect())


def test_no_required_fields_admits_partial_rows(spark, tmp_path):
    path = _write(tmp_path, LINES)
    clean, quar = read_jsonl_corpus(spark, path, SCHEMA)
    # only structural failures quarantine: 1 malformed + 2 blank +
    # 1 type-mangled; absent/null fields are admitted as NULLs
    assert quar.count() == 4
    assert clean.count() == len(LINES) - 4


def test_reason_precision_edges(spark, tmp_path):
    """Tab-only lines are blank (not malformed); a JSON OBJECT whose
    only present field type-fails is type_mismatch (not malformed);
    top-level non-objects are malformed (one object per line is the
    corpus contract)."""
    lines = [
        "\t",                                  # tab-only -> blank_line
        json.dumps({"doc_id": "x"}),           # only field type-fails
        "[1, 2, 3]",                           # top-level array
        "null",                                # top-level null
        '"just a string"',                     # top-level scalar
    ]
    path = _write(tmp_path, lines, "edges.jsonl")
    _, quar = read_jsonl_corpus(spark, path, SCHEMA, required=("doc_id",))
    by_line = {r["raw_line"]: r["reason"] for r in quar.collect()}
    assert by_line["\t"] == "blank_line"
    assert by_line[lines[1]] == "type_mismatch"
    assert by_line["[1, 2, 3]"] == "malformed_json"
    assert by_line["null"] == "malformed_json"
    assert by_line['"just a string"'] == "malformed_json"


def test_reserved_schema_names_rejected(spark, tmp_path):
    import pytest as _pytest

    path = _write(tmp_path, LINES[:1], "r.jsonl")
    bad = T.StructType(
        [*SCHEMA.fields, T.StructField("__corrupt_record", T.StringType())]
    )
    with _pytest.raises(ValueError, match="__corrupt_record"):
        read_jsonl_corpus(spark, path, bad)


def test_required_col_must_exist_in_schema(spark, tmp_path):
    path = _write(tmp_path, LINES[:1])
    try:
        read_jsonl_corpus(spark, path, SCHEMA, required=("nope",))
    except ValueError as e:
        assert "nope" in str(e)
    else:
        raise AssertionError("expected ValueError for unknown required col")


def test_quarantine_report_counts(spark, tmp_path):
    path = _write(tmp_path, LINES)
    _, quar = read_jsonl_corpus(
        spark, path, SCHEMA, required=("doc_id", "text")
    )
    rep = {
        r["reason"]: r["n_lines"] for r in quarantine_report(quar).collect()
    }
    assert rep == {
        "blank_line": 2,
        "malformed_json": 1,
        "missing_required:doc_id": 1,
        "missing_required:text": 1,
        "type_mismatch": 1,
    }


def test_multi_file_attribution(spark, tmp_path):
    _write(tmp_path, LINES[:2], "a.jsonl")
    _write(tmp_path, [LINES[2]], "b.jsonl")
    clean, quar = read_jsonl_corpus(
        spark, str(tmp_path), SCHEMA, required=("doc_id",)
    )
    assert clean.count() == 2
    q = quar.collect()
    assert len(q) == 1 and q[0]["src_file"].endswith("b.jsonl")
