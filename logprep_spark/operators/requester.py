"""Requester — enrich events via HTTP calls.

Reference: /root/reference/logprep/processor/requester/processor.py and
rule.py (method/url plus headers/params/data/json/auth/timeout/verify/
cert/proxies, all ``${field}``-templated from the event;
``target_field`` stores the raw response; ``target_field_mapping``
copies dotted response subpaths into event fields).

Per-row HTTP from executors is an anti-pattern at 100 TB; the Spark
shape kept here is ``mapInPandas`` over Arrow batches so the transport
can batch/pipeline requests per partition. The transport is injectable:
``handler=http_handler()`` performs REAL HTTP via stdlib urllib
(method, headers, params, form/json bodies, basic auth, timeouts —
exercised against a local server in tests); without a handler,
``transform`` raises ``NotImplementedError`` rather than silently
doing network I/O.
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable

from pyspark.sql import DataFrame

from logprep_spark.operators.base import Processor

_TEMPLATE = re.compile(r"\$\{([^}]+)\}")

#: rule keys forwarded into the request dict (reference rule.py schema)
REQUEST_OPTION_KEYS = (
    "headers",
    "params",
    "data",
    "json",
    "auth",
    "timeout",
    "verify",
    "cert",
    "proxies",
)


def _template(value: Any, row) -> Any:
    """Recursively substitute ``${field}`` from the event row in any
    string inside the option structure."""
    if isinstance(value, str):
        return _TEMPLATE.sub(lambda m: str(row.get(m.group(1), "")), value)
    if isinstance(value, dict):
        return {k: _template(v, row) for k, v in value.items()}
    if isinstance(value, list):
        return [_template(v, row) for v in value]
    return value


def http_handler(default_timeout: float = 5.0) -> Callable[[dict], dict]:
    """Real HTTP transport on stdlib urllib (reference processor uses
    ``requests.request(**kwargs)``; same option surface minus
    verify/cert/proxies, which need a TLS/proxy stack).

    JSON responses come back as the parsed object — so
    ``target_field_mapping`` dotted paths navigate the response body
    exactly like the reference; non-JSON bodies land under ``text``.
    """

    def call(request: dict) -> dict:
        import base64
        import urllib.parse
        import urllib.request

        url = request["url"]
        params = request.get("params")
        if params:
            url += ("&" if "?" in url else "?") + urllib.parse.urlencode(params)
        headers = dict(request.get("headers") or {})
        data = None
        if request.get("json") is not None:
            data = json.dumps(request["json"]).encode()
            headers.setdefault("Content-Type", "application/json")
        elif request.get("data") is not None:
            raw = request["data"]
            data = raw.encode() if isinstance(raw, str) else urllib.parse.urlencode(raw).encode()
        auth = request.get("auth")
        if auth:
            token = base64.b64encode(f"{auth[0]}:{auth[1]}".encode()).decode()
            headers["Authorization"] = f"Basic {token}"
        req = urllib.request.Request(
            url, data=data, headers=headers, method=request.get("method", "GET").upper()
        )
        timeout = float(request.get("timeout") or default_timeout)
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read().decode("utf-8", "replace")
        try:
            parsed = json.loads(body)
        except ValueError:
            parsed = None
        if isinstance(parsed, dict):
            return parsed
        return {"text": body}

    return call


def _dotted(d: Any, path: str) -> Any:
    for part in path.split("."):
        if not isinstance(d, dict) or part not in d:
            return None
        d = d[part]
    return d


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
        field_mapping = dict(cfg.get("target_field_mapping") or {})
        options = {k: cfg[k] for k in REQUEST_OPTION_KEYS if k in cfg}
        out_schema = df.schema.add(target, "string")
        # mapped response fields arrive as strings (the stub transport
        # has no response schema to infer from)
        for event_field in field_mapping.values():
            out_schema = out_schema.add(event_field.replace(".", "_"), "string")
        cond_name = "__req_cond"
        df = df.withColumn(cond_name, cond)

        def run(batches):
            for pdf in batches:
                results: list = []
                mapped: dict[str, list] = {f: [] for f in field_mapping.values()}
                for _, row in pdf.iterrows():
                    if not row[cond_name]:
                        results.append(None)
                        for f in mapped:
                            mapped[f].append(None)
                        continue
                    request = {
                        "method": method,
                        "url": _template(url_template, row),
                        **_template(options, row),
                    }
                    response = handler(request)
                    results.append(json.dumps(response))
                    for resp_path, event_field in field_mapping.items():
                        value = _dotted(response, resp_path)
                        mapped[event_field].append(
                            None if value is None else str(value)
                        )
                pdf = pdf.drop(columns=[cond_name])
                pdf[target] = results
                for event_field, values in mapped.items():
                    pdf[event_field.replace(".", "_")] = values
                yield pdf

        return df.mapInPandas(run, schema=out_schema)
