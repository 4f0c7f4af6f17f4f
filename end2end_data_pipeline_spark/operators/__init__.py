"""Operator modules. Importing this package registers every query into
``end2end_data_pipeline_spark.registry``."""

from end2end_data_pipeline_spark.operators import (  # noqa: F401
    affinity,
    bucketed,
    corpus_ops,
    dedup,
    event_analytics,
    graph,
    incremental,
    ingest_parity,
    kmeans,
    layout,
    multimodal,
    pysource_parity,
    quality,
    reconcile,
    relational,
    relational_ext,
    sampling,
    scrubbing,
    semistructured,
    similarity,
    temporal,
    tpch_like,
    text_analysis,
    warehouse_ops,
)
