from end2end_data_pipeline_spark.functions import texthash, vectors  # noqa: F401
