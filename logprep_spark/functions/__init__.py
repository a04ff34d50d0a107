from logprep_spark.functions import dedup, jpeg, multimodal, similarity, text  # noqa: F401
