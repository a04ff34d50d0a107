"""Amides — adaptive misuse detection scoring with a real trained model.

Reference: /root/reference/logprep/processor/amides/processor.py (a
trained classifier scores process command lines for SIEM rule-evasion
attempts; attaches ``amides.confidence``). Normalization mirrors the
reference ``CommandLineNormalizer`` (normalize.py:36-60,
features.py:87-186): strip dummy chars ``["^`’]``, lowercase, ``\\w+``
tokenize, drop (hex-)numeric tokens longer than 3 chars and any token
longer than 30.

The model is a logistic regression over hashed token counts (hashing
trick; bucket count = ``dim`` from ``amides_model.json``, currently
256) trained by ``tools/train_amides.py`` on
public-knowledge fixtures (Sigma-rule-style attack command lines vs
ordinary process invocations) and serialized in-repo as
``amides_model.json``. Weights are integer micro-units, so the decision
margin is exact integer math — bit-reproducible in any engine (the
DuckDB oracle recomputes it in SQL).

Spark shape: scoring runs as an Arrow-batched ``pandas_udf`` — the
model loads once per executor (module-level cache) and scores whole
Arrow batches, which is exactly how a bigger sklearn/onnx artifact
would deploy. The reference's LRU result cache (max_cache_entries)
is unnecessary here: Spark amortizes via columnar batches instead of
per-event memoization.
"""

from __future__ import annotations

import hashlib
import json
import math
import re
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor

_MODEL_PATH = Path(__file__).resolve().parent / "amides_model.json"
_DUMMY = re.compile(r"[\"\^`’]")
_TOKEN = re.compile(r"\w+", re.ASCII)
_NUMERIC = re.compile(r"^(?:0x)?[0-9a-f]{4,}$")

_model_cache: dict | None = None


def load_model() -> dict:
    """Load (and cache) the in-repo model. Executors each pay this once
    per interpreter — the JSON rides inside the package."""
    global _model_cache
    if _model_cache is None:
        _model_cache = json.loads(_MODEL_PATH.read_text())
    return _model_cache


def normalize(cmdline: str) -> list[str]:
    """Reference CommandLineNormalizer parity (ASCII \\w to match the
    RE2 semantics the SQL oracle uses)."""
    s = _DUMMY.sub("", cmdline).lower()
    return [t for t in _TOKEN.findall(s) if len(t) <= 30 and not _NUMERIC.match(t)]


def margin_micros(cmdline: str, model: dict) -> int:
    """Integer decision margin: bias + sum of hashed-bucket weights."""
    dim = model["dim"]
    weights = model["weights_micros"]
    total = model["bias_micros"]
    for tok in normalize(cmdline):
        bucket = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim
        total += weights[bucket]
    return total


def _confidence_udf():
    """Built lazily — pandas_udf registration needs an active session."""

    @pandas_udf("double")
    def score_udf(cmdline: pd.Series) -> pd.Series:
        model = load_model()

        def score(value) -> float:
            if value is None:
                return 0.0
            m = margin_micros(str(value), model)
            # math.exp (libm), not numpy's SIMD exp: bit-identical to
            # the oracle engine's exp on the same double input
            return 1.0 / (1.0 + math.exp(-m / 1e6))

        return cmdline.map(score)

    return score_udf


class Amides(Processor):
    rule_type = "amides"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        src = fld.get_field(df, cfg["source_fields"][0])
        if src is None:
            return df
        confidence = _confidence_udf()(src.cast("string"))
        df = self.set_when(df, "amides.confidence", cond, confidence)
        threshold = cfg.get("decision_threshold")
        if threshold is not None:
            df = self.set_when(
                df,
                "amides.malicious",
                cond,
                fld.get_field(df, "amides.confidence") >= float(threshold),
            )
        return df
