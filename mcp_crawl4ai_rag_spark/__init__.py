"""PySpark-native crawl/analytics engine.

A from-scratch re-expression of the query + data-processing semantics of
the reference repo (BingoWon/mcp-crawl4ai-rag, /root/reference) as idiomatic
Spark DataFrame / SQL jobs:

- URL frontier + fetch scheduler (bloom/cuckoo URL-seen dedup, per-host
  politeness token buckets, robots rules broadcast join, window-ranked
  priority frontier snapshots) — reference: src/crawler/core.py,
  src/database/operations.py.
- Chunking + embedding processor — reference: src/chunking/chunker.py,
  src/processor/core.py.
- Vector / keyword / hybrid search — reference: src/apple-dev-mcp.py,
  src/database/operations.py:176-198.
- Training-data pipeline extensions (dedup suite, similarity search,
  text analysis, multimodal plumbing) beyond the reference surface.

Everything is pyspark.sql DataFrames + vectorized pandas/Arrow UDFs;
no per-row Python UDFs in hot paths.
"""

__version__ = "0.1.0"
