"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference repo (Yishak-Ali/CR-Data-Pipeline-Project),
re-expressed Spark-first, plus LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) designed for
100 TB scale.

Layout
------
- ``session``    SparkSession factory + runtime conf preparation
- ``schemas``    explicit StructTypes (domain tables + fixture tables)
- ``catalog``    fixture-table loader (parquet, with per-table fixups)
- ``functions``  scalar function surface (keys, timestamps, url-encode,
                 season calendar)
- ``operators``  relational + mutation + dedup + similarity + text +
                 window + multimodal operators
- ``plans``      named query builders — the ``queries()`` surface
- ``curation``   one-call end-to-end corpus curation chain
- ``streaming``  Structured Streaming re-expression of the incremental
                 load (watermark dedup + foreachBatch merge, near-dup
                 curation ingest, SCD-2 dimension maintenance)
"""

__version__ = "0.1.0"
