from logprep_spark.functions import dedup, multimodal, similarity, text  # noqa: F401
