"""Structured Streaming re-expression of the reference's incremental
batch semantics (SURVEY.md §2.8)."""
