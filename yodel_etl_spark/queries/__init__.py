"""Harness-facing query bindings.

Each module pairs engine operators (yodel_etl_spark.ops / .scale / …)
with a DuckDB oracle so the driver can verify them end-to-end.
Importing this package registers every query in
``yodel_etl_spark.registry.QUERIES``.
"""

from yodel_etl_spark.queries import (  # noqa: F401
    asof_q,
    classify,
    curate_q,
    decontam_q,
    dq_q,
    grouping,
    infra_q,
    judge,
    layout_q,
    ops_q,
    pipelines_q,
    refs,
    relational,
    sampling_q,
    scale_dedup,
    scd_q,
    scale_multimodal,
    scale_similarity,
    scale_text,
    sessionize,
    skew,
    web_q,
    windows,
)
