"""ibd_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with (at least) the query and
data-processing capabilities of the reference pipeline
``andreitulpan/IBD-End-to-End-Data-Pipeline`` (a Kafka → PySpark
Structured Streaming → InfluxDB weather pipeline, see
``Processing&Storing/spark_processor.py`` in the reference), extended
with the relational operator library and LLM-training-data operators
(dedup, similarity search, text analysis, multimodal columns) that a
100 TB-scale pipeline needs.

Design stance (SURVEY.md §7):
  * declarative DataFrame/SQL everywhere — Catalyst picks the physical
    plan; no hand-scheduled RDD code;
  * sources and sinks behind tiny adapters so Kafka/InfluxDB swap for
    file/memory in tests;
  * Python UDFs only where built-ins genuinely can't express the
    semantics, and then Arrow-batched (pandas_udf / applyInPandas).
"""

from ibd_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
