from logprep_spark.filters.parser import parse_filter
from logprep_spark.filters.compiler import compile_filter

__all__ = ["parse_filter", "compile_filter"]
