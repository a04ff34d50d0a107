"""Requester — enrich events via HTTP calls (STUBBED transport).

Reference: /root/reference/logprep/processor/requester/processor.py
(rule: method/url/json templated from event fields; response fields
merged into the event).

Per-row HTTP from executors is an anti-pattern at 100 TB; the Spark
shape kept here is ``mapInPandas`` over Arrow batches so a real
transport could batch/pipeline requests per partition. The transport
itself is a deterministic stub (``NotImplementedError`` unless a
``handler`` is injected) — no network in tests, plumbing and schema
real.
"""

from __future__ import annotations

import json
import re
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logprep_spark.operators.base import Processor

_TEMPLATE = re.compile(r"\$\{([^}]+)\}")


class Requester(Processor):
    rule_type = "requester"

    def __init__(self, rules=None, handler: Callable[[dict], dict] | None = None, **kw):
        """``handler(request_dict) -> response_dict`` replaces real HTTP.

        Without a handler, ``transform`` raises NotImplementedError —
        the transport is intentionally stubbed (no network access)."""
        super().__init__(rules, **kw)
        self.handler = handler

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        if self.handler is None:
            raise NotImplementedError(
                "Requester transport is stubbed: inject handler=... to simulate responses"
            )
        handler = self.handler
        url_template = cfg["url"]
        method = cfg.get("method", "GET")
        target = cfg.get("target_field", "requester_result")
        fields_used = _TEMPLATE.findall(url_template)
        out_schema = df.schema.add(target, "string")
        cond_name = "__req_cond"
        df = df.withColumn(cond_name, cond)

        def run(batches):
            for pdf in batches:
                results = []
                for _, row in pdf.iterrows():
                    if not row[cond_name]:
                        results.append(None)
                        continue
                    url = url_template
                    for field in fields_used:
                        url = url.replace("${" + field + "}", str(row.get(field, "")))
                    response = handler({"method": method, "url": url})
                    results.append(json.dumps(response))
                pdf = pdf.drop(columns=[cond_name])
                pdf[target] = results
                yield pdf

        return (
            df.mapInPandas(run, schema=out_schema)
        )
