"""Engine operators: relational mutations, range joins, dedup,
similarity search, text analysis, event-time windows, multimodal
plumbing, data-quality assertions."""
