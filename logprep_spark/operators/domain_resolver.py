"""DomainResolver — resolve domains to IPs.

Reference: /root/reference/logprep/processor/domain_resolver/
processor.py (URL/domain field -> ``resolved_ip``; caching, timeouts).

Real DNS is an external side effect Spark jobs shouldn't do inline at
100 TB; the production path would be a broadcast join against a
pre-resolved (domain -> ip) snapshot table, which ``resolve_with_table``
implements. The default in-plan resolver is a clearly-marked
DETERMINISTIC STUB: a sha2-derived fake IPv4, keeping plumbing,
schema, and tests real without network access.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


def _stub_ip(col):
    """Deterministic fake IP from the domain hash (STUB, not real DNS)."""
    h = F.sha2(col.cast("string"), 256)
    octet = lambda i: F.conv(F.substring(h, i, 2), 16, 10).cast("long") % 256  # noqa: E731
    return F.concat_ws(
        ".",
        (octet(1) % 223 + 1).cast("string"),
        octet(3).cast("string"),
        octet(5).cast("string"),
        octet(7).cast("string"),
    )


class DomainResolver(Processor):
    rule_type = "domain_resolver"

    def __init__(self, rules=None, resolution_table: DataFrame | None = None, **kw):
        """``resolution_table``: optional (domain string, ip string) DF —
        the scale path; broadcast-joined when provided."""
        super().__init__(rules, **kw)
        self.resolution_table = resolution_table

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        source = cfg["source_fields"][0]
        src = fld.get_field(df, source)
        if src is None:
            return df
        target = cfg.get("target_field", "resolved_ip")
        # extract hostname if value is a URL
        host = F.regexp_extract(src.cast("string"), r"^(?:[a-z][a-z0-9+.-]*://)?([^/:?#]+)", 1)
        if self.resolution_table is not None:
            lookup = broadcast(
                self.resolution_table.select(
                    F.col("domain").alias("__dr_domain"), F.col("ip").alias("__dr_ip")
                )
            )
            df = df.join(lookup, on=host == F.col("__dr_domain"), how="left")
            df = self.set_when(df, target, cond, F.col("__dr_ip"))
            return df.drop("__dr_domain", "__dr_ip")
        return self.set_when(df, target, cond, _stub_ip(host))
