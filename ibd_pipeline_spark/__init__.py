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

from ibd_pipeline_spark.catalog import load, load_wide, register_all
from ibd_pipeline_spark.queries import all_oracles, all_queries
from ibd_pipeline_spark.session import get_spark

__all__ = [
    "get_spark",      # tuned SparkSession factory
    "load",           # fixture-table loader (type normalization included)
    "load_wide",      # load + widen narrow single-split scans
    "register_all",   # register every table as a temp view (SQL entry)
    "all_queries",    # name -> (spark, sf_dir) -> DataFrame registry
    "all_oracles",    # name -> DuckDB oracle SQL (the correctness twin)
]
__version__ = "0.1.0"
