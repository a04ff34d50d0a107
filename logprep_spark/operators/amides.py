"""Amides — adaptive misuse detection scoring (STUB model).

Reference: /root/reference/logprep/processor/amides/processor.py
(a trained sklearn-style model scores process command lines for SIEM
rule-evasion attempts; attaches ``amides.confidence`` plus possibly
matching rule ids).

The model artifact/runtime isn't available here, so scoring is a
clearly-marked DETERMINISTIC STUB (feature-hash based pseudo score in
[0,1)). The Spark plumbing is the real design: scoring runs as an
Arrow-batched ``pandas_udf`` — the exact shape a real sklearn/onnx
model would use (load once per executor, vectorized predict per
batch).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


def _stub_confidence():
    """STUB: stable pseudo-confidence from a cheap feature hash.

    A real deployment swaps the body for model.decision_function on
    the same vectorized batch interface. Built lazily — pandas_udf
    registration needs an active SparkSession."""

    @pandas_udf("double")
    def score_udf(cmdline: pd.Series) -> pd.Series:
        import hashlib

        def score(value) -> float:
            if value is None:
                return 0.0
            digest = hashlib.sha256(str(value).encode()).digest()
            return int.from_bytes(digest[:4], "big") / 2**32

        return cmdline.map(score)

    return score_udf


class Amides(Processor):
    rule_type = "amides"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        src = fld.get_field(df, cfg["source_fields"][0])
        if src is None:
            return df
        confidence = _stub_confidence()(src.cast("string"))
        return self.set_when(df, "amides.confidence", cond, confidence)
