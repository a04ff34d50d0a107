"""logprep_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of fkie-cad/Logprep.

Events are DataFrame rows; rule filters compile to Catalyst ``Column``
predicates; processors are ``DataFrame -> DataFrame`` transforms built
from ``pyspark.sql.functions`` so everything stays JVM-side under
whole-stage codegen. Streaming pipelines use Structured Streaming.

Not a port: the reference (/root/reference, fkie-cad/Logprep) defines
WHAT each operator computes; the HOW here is idiomatic Spark.
"""

__version__ = "0.1.0"

from logprep_spark.session import get_spark  # noqa: F401
