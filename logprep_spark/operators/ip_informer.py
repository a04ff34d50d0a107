"""IpInformer — enrich events with IP address properties.

Reference: /root/reference/logprep/processor/ip_informer/processor.py
(source_fields of IPs -> target_field struct of properties per the
stdlib ``ipaddress`` module). Realized as native bit-math columns
(ip_utils.py) — no Python per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators import ip_utils
from logprep_spark.operators.base import Processor

_PROPERTIES = {
    "is_private": ip_utils.is_private,
    "is_global": ip_utils.is_global,
    "is_loopback": ip_utils.is_loopback,
    "is_link_local": ip_utils.is_link_local,
    "is_multicast": ip_utils.is_multicast,
    "is_reserved": ip_utils.is_reserved,
}


class IpInformer(Processor):
    rule_type = "ip_informer"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        props = cfg.get("properties", ["default"])
        names = list(_PROPERTIES) if props in (["default"], "default") else props
        for source in cfg["source_fields"]:
            src = fld.get_field(df, source)
            if src is None:
                continue
            version = (
                F.when(ip_utils.is_ipv4(src), F.lit(4))
                .when(ip_utils.is_ipv6(src), F.lit(6))
                .otherwise(F.lit(None).cast("int"))
            )
            struct_fields = [src.cast("string").alias("address"), version.alias("version")]
            for name in names:
                if name in _PROPERTIES:
                    struct_fields.append(_PROPERTIES[name](src).alias(name))
            value = F.when(
                ip_utils.is_ipv4(src) | ip_utils.is_ipv6(src), F.struct(*struct_fields)
            )
            target = f"{cfg['target_field']}.{source.replace('.', '_')}"
            df = self.set_when(df, target, cond, value)
        return df
