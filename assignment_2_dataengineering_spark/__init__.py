"""assignment_2_dataengineering_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic-Spark re-expression of the query and
data-processing capabilities of the reference pipeline
Razer256g4/Assignment-2-DataEngineering (NEM electricity-market ETL →
MQTT pub/sub → live dashboard; see /root/repo/SURVEY.md for the full
structural analysis with reference citations).

Design principles (SURVEY.md §7):
- Declarative DataFrame / SQL plans; Catalyst + Tungsten pick physical
  strategy. No RDDs, no driver-side row loops in the hot path.
- Long/tidy fact tables in Parquet are the canonical layout; the
  reference's wide pivoted cache (extractor.py:302-308) survives only
  as a reshape *operator* (operators.reshape.pivot_wide).
- Dimensions are broadcast; big joins/aggs shuffle on their keys; AQE
  is enabled by the session factory for runtime re-planning.
- Python UDFs are a last resort: everything in functions/ is built
  from pyspark.sql.functions column expressions (JVM-side, codegen);
  Arrow-batched pandas UDFs appear only in operators.multimodal where
  binary decoding genuinely cannot be expressed relationally.
"""

__version__ = "0.1.0"
