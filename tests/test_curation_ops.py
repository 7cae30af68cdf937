"""Round-2 curation operators: repetition ratio, PII redaction,
stratified sampling, sequence packing, int8 quantization."""

from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.operators import textstats
from cr_data_pipeline_project_spark.operators.sampling import (
    sequence_packing,
    stratified_sample,
)
from cr_data_pipeline_project_spark.operators.similarity import quantize_int8


def test_repetition_ratio_degenerate_doc(spark):
    rows = [
        (1, "spam spam spam spam spam spam"),   # one distinct 3-gram
        (2, "all words here are fully unique"), # no repeats
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textstats.repetition_ratio(df, "text").collect()}
    assert got[1]["n_grams"] == 4 and got[1]["n_distinct"] == 1
    assert got[1]["rep_ratio"] == 0.75
    assert got[2]["rep_ratio"] == 0.0


def test_pii_redact_masks_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail a.user@site.org or ring 123456 now"), (2, "clean text")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textstats.pii_redact(df, "text").collect()}
    assert got[1]["redacted"] == "mail <EMAIL> or ring <NUM> now"
    assert got[1]["n_redactions"] == 2
    assert got[2]["redacted"] == "clean text" and got[2]["n_redactions"] == 0


def test_stratified_sample_exact_k_and_deterministic(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("lang")
    )
    s1 = stratified_sample(df, "lang", "doc_id", 7)
    s2 = stratified_sample(df, "lang", "doc_id", 7)
    counts = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 7, "1": 7, "2": 7}
    assert sorted(r["doc_id"] for r in s1.collect()) == sorted(
        r["doc_id"] for r in s2.collect()
    )


def test_sequence_packing_bins_respect_capacity_estimate(spark):
    rows = [(i, "g", 100) for i in range(10)]  # 100 tokens each, cap 250
    df = spark.createDataFrame(rows, "doc_id long, grp string, n_tok int")
    out = sequence_packing(df, "grp", "doc_id", F.col("n_tok"), 250)
    bins = {r["doc_id"]: r["bin_idx"] for r in out.collect()}
    # exclusive prefix sums: 0,100,200,300,... → bins 0,0,0,1,1,2,2,2,3,3
    assert [bins[i] for i in range(10)] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]


def test_quantize_int8_roundtrip_error_bounded(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    row = quantize_int8(df).collect()[0]
    assert row["qvec"] == [64, -32, 0, 127]  # floor(x*127+0.5), -31.75→-32
    assert row["dequant_err"] <= 0.01


def test_token_cooccurrence_lift_and_df_band(spark):
    """Market-basket lift on a planted corpus: an always-together
    pair gets lift N/(df_a*df_b)·n_ab exactly; a token above the df
    cap or below min_df never appears in any pair; support below
    min_support is dropped."""
    from pyspark.sql import functions as F

    from cr_data_pipeline_project_spark.operators.textstats import (
        token_cooccurrence,
    )

    # 10 docs: 'alpha beta' co-occur in 4 docs; 'omni' in all 10
    # (df cap kills it); 'rare' in 1 doc (min_df kills it);
    # 'gamma' co-occurs with alpha only twice (min_support kills it)
    rows = []
    for i in range(4):
        rows.append((i, "alpha beta filler" + str(i)))
    rows.append((4, "alpha gamma x"))
    rows.append((5, "alpha gamma y"))
    rows.extend((i, "beta solo z") for i in (6, 7))
    rows.append((8, "rare thing"))
    rows.append((9, "other stuff"))
    docs = spark.createDataFrame(
        [(i, t + " omni") for i, t in rows], "doc_id int, text string"
    )
    got = token_cooccurrence(
        docs, "text", "doc_id", min_df=2, max_df_frac=0.8, min_support=3
    ).collect()
    pairs = {(r["token_a"], r["token_b"]): r for r in got}
    assert ("alpha", "beta") in pairs
    r = pairs[("alpha", "beta")]
    # alpha df=6, beta df=6, together 4, N=10 → lift = 4*10/36
    assert (r["n_ab"], r["df_a"], r["df_b"]) == (4, 6, 6)
    assert r["lift"] == round(40 / 36, 4)
    flat = {t for p in pairs for t in p}
    assert "omni" not in flat  # df 10 > 0.8*10
    assert "rare" not in flat  # df 1 < min_df
    assert ("alpha", "gamma") not in pairs  # support 2 < 3


def test_html_extract_recovers_text_and_counts(spark):
    from cr_data_pipeline_project_spark.operators.textstats import (
        html_extract,
    )

    html = (
        '<html><head><title> My Page </title>'
        '<style>p {color: red;}</style>'
        '<script>if (a<b) { alert("x > y"); }</script></head>'
        '<body><H1>Head</H1><!-- chrome --><p>hello &amp; goodbye</p>'
        '<A HREF="/a">one</A> <a href="/b">two</a></body></html>'
    )
    df = spark.createDataFrame([(1, html)], "id int, html string")
    r = html_extract(df, "html").collect()[0]
    assert r.title == "My Page"
    assert r.text == "Head hello & goodbye one two"  # no title
    assert r.n_links == 2  # case-insensitive anchor match
    assert r.n_tags > 10
    assert 0 < r.text_ratio < 0.2


def test_html_extract_entity_order_no_double_decode(spark):
    """'&amp;lt;' must decode to the literal '&lt;', never doubly to
    '<' — the &amp; replacement runs LAST."""
    from cr_data_pipeline_project_spark.operators.textstats import (
        html_extract,
    )

    df = spark.createDataFrame(
        [(1, "<p>&amp;lt; &lt; &gt; &quot; &#39; &nbsp;</p>")],
        "id int, html string",
    )
    r = html_extract(df, "html").collect()[0]
    assert r.text == "&lt; < > \" '"


def test_html_extract_script_with_bare_lt(spark):
    """A '<' inside a script body must not desync the tag stripper
    (the naive-strip trap q238 sets deliberately)."""
    from cr_data_pipeline_project_spark.operators.textstats import (
        html_extract,
    )

    df = spark.createDataFrame(
        [(1, "<script>var x = 1; if (x<2) { x=3; }</script><b>keep</b>")],
        "id int, html string",
    )
    r = html_extract(df, "html").collect()[0]
    assert r.text == "keep"
    assert r.title == ""
