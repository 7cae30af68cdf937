"""LLM-data-pipeline queries (dedup, similarity, text analysis,
multimodal) over the documents/embeddings fixture tables."""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        fn.__query_name__ = name
        return fn

    return deco
