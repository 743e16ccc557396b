"""yodel_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rajeshmr/yodel-etl, rebuilt Spark-first.

The reference (read-only snapshot at /root/reference) is a set of eager,
single-process pandas/stdlib ETL + LLM-evaluation pipelines.  This package
re-expresses every one of its dataflow operators (SURVEY.md §2) as lazy,
distributed, Catalyst-optimizable DataFrame transformations, and extends
them with the large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) the reference's
domain implies at 100 TB scale.

Design rules (enforced throughout):
  * DataFrame / Spark SQL only — no RDDs, no driver-side ``collect()``
    loops inside operators.
  * Built-in ``pyspark.sql.functions`` (JVM, whole-stage codegen) for
    every expressible transform; Arrow-batched ``mapInPandas`` only for
    genuinely external work (HTTP/LLM calls, binary decode).
  * External-call operators never raise across the UDF boundary: every
    row carries (value, status, error) fail-soft columns
    (reference convention: test_chat_assistant.py:218-232).
"""

from yodel_etl_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
