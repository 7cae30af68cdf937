"""Unicode-text invariance gate — the sixth data-shape adversary
(shuffle → order, skew → hot keys, nullify → missing values,
extremes → magnitudes, ties → equal timestamps, unitext →
ASCII-only luck).

Every byte of the clean documents.text is printable ASCII, so the
two engines' regex/Unicode stacks (Spark = Java regex + UTF8String,
DuckDB = RE2 + utf8proc) have never been forced to agree off the
ASCII plane. tools/unitext_fixtures.py appends seeded unicode token
packs (NFC vs NFD accents, CJK runs, non-BMP emoji, Turkish İ / ß
case traps, fullwidth + ligature forms, RTL scripts, genuine
Latin-1 double-decode mojibake) to ~10% of docs, swaps inner
spaces for NBSP/CRLF, splices zero-width spaces inside words, and
recomputes n_chars as code points. This gate re-runs oracle parity
for the text-PRONE subset: every tokenizer, shingle/fingerprint,
term-statistics, language/quality, and length-derived query.
Surviving it means the tokenizer contracts (lower + split
semantics, code-point lengths, portable regex classes) are
engine-agnostic beyond ASCII.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


unitext_fixtures = _load_tool("unitext_fixtures")
check_oracle = _load_tool("check_oracle")

# Every query whose plan tokenizes, shingles, fingerprints, counts
# terms/chars, scores language/quality, or derives stats from
# documents.text / n_chars.
TEXT_PRONE = [
    "q32_dedup_fingerprint_keep",
    "q33_ngram_jaccard_pairs",
    "q34_minhash_lsh_pairs",
    "q35_simhash_pairs",
    "q69_doc_length_deciles",
    "q75_tfidf_top_terms",
    "q76_winnow_fingerprints",
    "q101_token_budget_apportion",
    "q108_verbatim_decontamination",
    "q126_source_token_mix",
    "q132_token_cooccurrence",
    "q134_bpe_pair_merges",
    "q163_ngram_novelty",
    "q178_zipf_slope",
    "q181_lexical_entropy",
    "q184_bigram_surprisal",
    "q217_heaps_vocab_growth",
    "q248_mojibake_census",
    "q261_langid_class_prf",
    "q263_readability_census",
]


@pytest.fixture(scope="module")
def unitext_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("unitext") / "sf0.001")
    info = unitext_fixtures.unitextify_dir(
        "/root/testdata/sf0.001", dst, seed=2033
    )
    # the adversary must be real: every mutation class landed
    assert info["n_pack"] > 0
    assert info["n_nbsp"] > 0
    assert info["n_crlf"] > 0
    assert info["n_zwsp"] > 0
    assert info["n_nonascii"] > 0
    return dst


@pytest.fixture(scope="module")
def duck(unitext_dir):
    con = duckdb.connect()
    for t in unitext_fixtures.TABLES:
        p = os.path.join(unitext_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


def test_text_prone_queries_survive_unicode(spark, unitext_dir, duck):
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = [n for n in TEXT_PRONE if n not in qs or n not in oracles]
    assert not missing, f"subset names drifted: {missing}"

    failures = []
    for name in TEXT_PRONE:
        spark_pdf = qs[name](spark, unitext_dir).toPandas()
        duck_pdf = duck.execute(oracles[name]).fetchdf()
        problems = check_oracle.compare(name, spark_pdf, duck_pdf)
        if problems:
            failures.append((name, problems))
    assert not failures, failures
