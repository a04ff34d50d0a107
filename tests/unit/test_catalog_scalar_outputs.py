"""Driver output-shape guard: no catalog query may return a top-level
array/map/struct column.

The driver's correctness gate canonicalizes both engines' results
through ``pandas.sort_values`` + factorize, which raises
``TypeError: unhashable type: 'list'`` on array cells — that exact
failure shipped twice in r6 (``embed_center_normalize``,
``sketch_quantiles_approx`` both recorded ERR rows despite being
hash-green under the local checker, which canonicalizes arrays).  The
driver contract is therefore *scalar top-level columns only*; vector
outputs must be exploded to (id, dim, value) rows or rendered to a
fixed-precision string.  This test closes the class the way the dtype
guard (test_oracle_dtypes.py) closed r4's int-vs-float class: schema
analysis only (no execution), the whole catalog, every round.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from logprep_spark.plans import catalog

_NAMES = list(catalog.queries())


@pytest.mark.parametrize("name", _NAMES)
def test_catalog_output_is_scalar_only(name, spark, sf_dir):
    df = catalog.queries()[name](spark, sf_dir)
    complex_cols = {
        f.name: f.dataType.simpleString()
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    }
    assert not complex_cols, (
        f"{name}: top-level complex columns {complex_cols} — the driver's "
        "hash canonicalizer cannot factorize array/map/struct cells "
        "(unhashable type: 'list'). Explode to scalar rows or render to a "
        "fixed-precision string, and mirror the shape in the oracle."
    )
