"""DomainLabelExtractor — split a domain into its labels.

Reference: /root/reference/logprep/processor/domain_label_extractor/
processor.py (target domain ->
registered_domain / top_level_domain / subdomain; IPs tagged
``ip_in_<field>``, unparseable values ``invalid_domain_in_<field>``).

The reference uses the public-suffix list via ``tldextract``. Here a
two-level-suffix heuristic handles the common public suffixes
(co.uk-style) with native ``split``/``element_at`` — the full PSL
would be a broadcast join against a suffix table, same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators import ip_utils
from logprep_spark.operators.base import Processor

_SECOND_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.sg", "com.tr",
]

_DOMAIN_REGEX = r"^(?:[A-Za-z0-9][A-Za-z0-9-]{0,62}\.)+[A-Za-z]{2,}$"


class DomainLabelExtractor(Processor):
    rule_type = "domain_label_extractor"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        source = cfg["source_fields"][0]
        src = fld.get_field(df, source)
        if src is None:
            return df
        domain = src.cast("string")
        target = cfg["target_field"]

        parts = F.split(domain, r"\.")
        n = F.size(parts)
        last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
        is_2l_suffix = last2.isin(_SECOND_LEVEL_SUFFIXES) & (n >= 3)
        suffix_len = F.when(is_2l_suffix, F.lit(2)).otherwise(F.lit(1))

        tld = F.when(is_2l_suffix, last2).otherwise(F.element_at(parts, -1))
        # registered domain = label immediately before the suffix + suffix
        reg_label = F.element_at(parts, (-suffix_len - 1).cast("int"))
        registered = F.concat_ws(".", reg_label, tld)
        subdomain = F.when(
            n > suffix_len + 1,
            F.array_join(F.slice(parts, 1, (n - suffix_len - 1).cast("int")), "."),
        ).otherwise(F.lit(""))

        valid = domain.rlike(_DOMAIN_REGEX) & (n >= 2)
        is_ip = ip_utils.is_ipv4(domain) | ip_utils.is_ipv6(domain)

        df = self.set_when(df, f"{target}.registered_domain", cond & valid & ~is_ip, registered)
        df = self.set_when(df, f"{target}.top_level_domain", cond & valid & ~is_ip, tld)
        df = self.set_when(df, f"{target}.subdomain", cond & valid & ~is_ip, subdomain)
        tag_field = cfg.get("tagging_field_name", "tags")
        source_tag = source.replace(".", "_")
        df = self.add_tag_when(df, cond & is_ip, [f"ip_in_{source_tag}"], tag_field)
        df = self.add_tag_when(
            df, cond & ~is_ip & ~valid, [f"invalid_domain_in_{source_tag}"], tag_field
        )
        return df
