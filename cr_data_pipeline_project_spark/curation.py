"""End-to-end training-corpus curation: one call chaining the
engine's curation operators in the order a production LLM-data
pipeline runs them, with a per-stage audit trail.

    curated, stats = curate_corpus(docs, holdout=test_docs)

Stage order (each stage sees the previous stage's survivors only —
cheapest-first so expensive stages run on the smallest corpus):

0. html         — OPTIONAL boilerplate extraction when the corpus
                  arrives as markup (``html_col=``): text_col is
                  replaced by the extracted visible text; fuses
                  into stage 1's scan (no extra pass)
1. rules        — length bounds + language allowlist (pure
                  expressions, one scan; the q55 shape)
2. exact        — content-hash dedup, min-id survivor
3. neardup      — MinHash-LSH pairs at ``neardup_threshold``; the
                  larger id of each verified pair drops (the
                  streaming-ingest convention)
4. decontam     — exact n-gram overlap with ``holdout`` (GPT-3
                  appendix-C; skipped when no holdout is given)
5. split        — deterministic hash split into train/val/test; by
                  doc id, or LEAKAGE-SAFE by near-dup cluster when
                  ``split_safety_threshold`` is set (the q205
                  semantics: dedup runs at a HIGH threshold, split
                  safety at a LOWER one — survivors that are still
                  paraphrase-close below the dedup bar must share a
                  lottery ticket, or one of them scores as held-out
                  eval data for the other)

Execution contract: the near-dup stage materializes its (small)
pair set at call time — ``minhash_lsh_pairs`` ends in an eager
``localCheckpoint`` so the pair result is computed once and its
lineage cut — and, when ``with_stats=True`` (default), each stage
boundary is counted ONCE, eagerly, while building the audit (five
1-row jobs; each stage's lineage executes exactly once for its
count). Pass ``with_stats=False`` to skip the audit and keep
everything downstream of the pair set lazy.

Scale: stages 1-2 are scan + one hash shuffle; stage 3 is the LSH
plan (bucketed candidates, id-only shuffles, hot-bucket guards);
stage 4 broadcasts the holdout's distinct grams. No stage shuffles
document bodies except the final survivors' own write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .operators.dedup import (
    exact_dedup_keep,
    minhash_lsh_pairs,
    ngram_contamination,
)
from .operators.sampling import split_column


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    html_col: str | None = None,
    holdout: DataFrame | None = None,
    min_chars: int = 100,
    max_chars: int = 400,
    langs: tuple[str, ...] = ("de", "en", "es", "fr"),
    lang_col: str | None = "lang",
    neardup_threshold: float = 0.7,
    contamination_ngram: int = 8,
    split_fractions: dict[str, float] | None = None,
    split_safety_threshold: float | None = None,
    with_stats: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """Returns ``(curated, stats)``: the curated corpus with a
    ``split`` column, and a per-stage audit of documents dropped
    (None when ``with_stats=False``).

    ``stats`` schema: (stage string, n_dropped long) in stage order,
    plus a final ('kept', n) row — rows sum to ``docs.count()``.

    ``html_col``: when set, a stage-0 boilerplate extraction runs
    first — ``text_col`` is REPLACED by the visible text pulled out
    of the markup (textstats.html_extract: head/script/style strip,
    entity decode, tag removal) and every later stage sees clean
    text. A pure map-side projection: it fuses with the rules scan,
    adds no stage boundary and no count row."""
    if html_col is not None:
        from .operators.textstats import html_extract

        docs = (
            html_extract(docs, html_col, out_prefix="_ext_")
            .withColumn(text_col, F.col("_ext_text"))
            .drop(
                "_ext_title", "_ext_text", "_ext_n_links",
                "_ext_n_tags", "_ext_text_ratio",
            )
        )
    n_chars = F.length(F.col(text_col))
    rule_ok = (n_chars >= min_chars) & (n_chars <= max_chars)
    if lang_col is not None:
        rule_ok = rule_ok & F.col(lang_col).isin(*langs)
    after_rules = docs.where(rule_ok)

    after_exact = exact_dedup_keep(after_rules, text_col, id_col)

    pairs = minhash_lsh_pairs(
        after_exact, text_col, id_col, threshold=neardup_threshold
    )
    after_neardup = after_exact.join(
        pairs.select(F.col("doc_b").alias(id_col)).distinct(),
        id_col,
        "left_anti",
    )

    if holdout is not None:
        flagged = ngram_contamination(
            after_neardup, holdout, text_col, id_col, n=contamination_ngram
        ).select(id_col)
        after_decontam = after_neardup.join(flagged, id_col, "left_anti")
    else:
        after_decontam = after_neardup

    fractions = split_fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    if split_safety_threshold is not None:
        # Leakage-safe split (q205): pair the SURVIVORS at the lower
        # safety threshold (stage 3 removed pairs only at
        # neardup_threshold — paraphrase-close survivors below that
        # bar remain) and hash the lottery on the near-dup CLUSTER
        # id, so no surviving near-dup pair ever straddles splits.
        # Singletons keep component_id == doc_id and degrade to the
        # plain doc split exactly.
        from .operators.graph import dedup_clusters

        safety_pairs = minhash_lsh_pairs(
            after_decontam,
            text_col,
            id_col,
            threshold=split_safety_threshold,
        )
        comp = dedup_clusters(
            after_decontam.select(id_col), safety_pairs, id_col=id_col
        )
        curated = (
            after_decontam.join(comp, id_col)
            .withColumn(
                "split", split_column(F.col("component_id"), fractions)
            )
            .drop("component_id")
        )
    else:
        curated = after_decontam.withColumn(
            "split", split_column(id_col, fractions)
        )

    if not with_stats:
        return curated, None

    # each boundary is counted ONCE (eager 1-row checkpoint) — the
    # naive per-stage (before, after) count pairs would re-execute
    # every shared upstream lineage twice per adjacent stage
    def n(df: DataFrame) -> DataFrame:
        return df.select(
            F.count(F.lit(1)).alias("__n")
        ).localCheckpoint()

    counts = [
        ("rules", n(docs), n(after_rules)),
        ("exact_dedup", None, n(after_exact)),
        ("neardup", None, n(after_neardup)),
        ("decontam", None, n(after_decontam)),
    ]
    stats = None
    prev = counts[0][1]
    for name, _, after_n in counts:
        row = prev.crossJoin(
            after_n.select(F.col("__n").alias("__m"))
        ).select(
            F.lit(name).alias("stage"),
            (F.col("__n") - F.col("__m")).alias("n_dropped"),
        )
        stats = row if stats is None else stats.unionAll(row)
        prev = after_n
    stats = stats.unionAll(
        prev.select(
            F.lit("kept").alias("stage"), F.col("__n").alias("n_dropped")
        )
    )
    return curated, stats
