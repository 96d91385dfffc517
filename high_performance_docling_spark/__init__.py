"""high_performance_docling_spark — a PySpark-native document span-extraction engine.

A from-scratch, Spark-first reimplementation of the capabilities of the
reference high-throughput docling pipeline (layout detection → layout
post-processing → table-structure decoding → cell matching → page assembly
→ reading order → ordered span output), expressed as partition-parallel
DataFrame stages over a corpus table of interleaved text+media documents
with schema (doc_id: string, spans: array<struct<kind, text, media_ref,
offset>>).

Design notes
------------
- Everything relational (filters, equi-joins, window ranks, aggregations)
  uses the DataFrame/SQL API so Catalyst can push down predicates, prune
  columns, and pick join strategies.
- All page-local geometry and order-sensitive sequence logic runs inside
  vectorized Arrow UDF stages (``mapInArrow`` / ``applyInPandas``) as
  NumPy kernels — one page (or one document) per row, never per-row
  Python in a hot loop.
- Stage boundaries are optional parquet checkpoints keyed by
  (doc_id, page_no) so a killed job can resume by anti-joining completed
  keys, with per-partition lineage rows.
"""

__version__ = "0.1.0"
