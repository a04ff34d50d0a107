"""Pipeline metrics (reference: ``logprep/metrics/metrics.py`` —
per-component processed/filtered counters exported to Prometheus via
``logprep/metrics/exporter.py``).

Spark-first: counters ride the query itself via ``df.observe`` —
aggregated on executors during the SAME pass, no second job and no
driver-side row counting. Batch uses ``pyspark.sql.Observation``;
streaming reads ``observedMetrics`` from each micro-batch's progress
(or live via ``MetricsListener``). ``MetricsExporter`` serializes the
collected counters in Prometheus text exposition format and can sink
them to a file, a callback, or a stdlib HTTP scrape endpoint
(``/metrics`` + ``/health``, mirroring reference exporter.py:18-40
without the prometheus_client dependency).
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.streaming.listener import StreamingQueryListener


def counters(cond: Column | None = None) -> list[Column]:
    """Standard counter set: total events, plus matched/filtered split
    when a rule condition is given."""
    out = [F.count(F.lit(1)).alias("n_events")]
    if cond is not None:
        out.append(F.sum(F.when(cond, 1).otherwise(0)).alias("n_matched"))
    return out


def observe_batch(
    df: DataFrame, cond: Column | None = None, name: str = "logprep_metrics"
) -> tuple[DataFrame, Observation]:
    """Attach counters to a batch plan. After any action on the
    returned frame, ``observation.get`` yields the counts."""
    obs = Observation(name)
    return df.observe(obs, *counters(cond)), obs


def observe_stream(
    df: DataFrame, cond: Column | None = None, name: str = "logprep_metrics"
) -> DataFrame:
    """Attach counters to a streaming plan; values surface per
    micro-batch in ``query.lastProgress['observedMetrics'][name]`` and
    in MetricsListener callbacks."""
    return df.observe(name, *counters(cond))


def progress_metrics(query, name: str = "logprep_metrics") -> dict:
    """Read observed counters from a StreamingQuery's last progress."""
    progress = query.lastProgress
    if not progress:
        return {}
    observed = progress.get("observedMetrics", {}).get(name)
    if observed is None:
        return {}
    return observed.asDict() if hasattr(observed, "asDict") else dict(observed)


class MetricsListener(StreamingQueryListener):
    """Accumulates observed counters across micro-batches — the
    export hook where the reference pushes to Prometheus. Register
    with ``spark.streams.addListener(listener)``."""

    def __init__(self, name: str = "logprep_metrics"):
        self.name = name
        self.totals: dict[str, int] = {}

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        observed = event.progress.observedMetrics.get(self.name)
        if observed is None:
            return
        for key, value in observed.asDict().items():
            if isinstance(value, (int, float)) and value is not None:
                self.totals[key] = self.totals.get(key, 0) + value

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def _escape_label(value) -> str:
    return str(value).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def render_prometheus(
    groups: list[tuple[dict, dict]], prefix: str = "logprep_"
) -> str:
    """Render ``[(counters, labels), ...]`` in Prometheus text
    exposition format. Counter names get the reference's ``logprep_``
    namespace; labels identify the component, as in reference
    metrics.py (labelnames component/name)."""
    by_name: dict[str, list[tuple[dict, float]]] = {}
    for counters, labels in groups:
        for key, value in counters.items():
            if value is None or not isinstance(value, (int, float)):
                continue
            by_name.setdefault(key, []).append((labels, float(value)))
    lines = []
    for key in sorted(by_name):
        full = f"{prefix}{key}"
        lines.append(f"# HELP {full} logprep_spark pipeline counter")
        lines.append(f"# TYPE {full} counter")
        for labels, value in by_name[key]:
            if labels:
                inner = ",".join(
                    f'{k}="{_escape_label(v)}"' for k, v in sorted(labels.items())
                )
                lines.append(f"{full}{{{inner}}} {value:g}")
            else:
                lines.append(f"{full} {value:g}")
    return "\n".join(lines) + "\n"


class MetricsExporter:
    """Collects counter maps (from ``Observation.get``, micro-batch
    ``observedMetrics``, or ``MetricsListener.totals``) and exposes
    them Prometheus-style: ``render()`` for pull, ``write(path)`` /
    callbacks for push, ``serve()`` for an HTTP scrape endpoint."""

    def __init__(self, prefix: str = "logprep_"):
        self.prefix = prefix
        self._groups: dict[tuple, dict] = {}
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def record(self, counters: dict, **labels) -> None:
        """Merge a counter map under a label set (same labels += , like
        prometheus counters)."""
        key = tuple(sorted(labels.items()))
        slot = self._groups.setdefault(key, {})
        for name, value in counters.items():
            if isinstance(value, (int, float)) and value is not None:
                slot[name] = slot.get(name, 0) + value

    def record_observation(self, obs: Observation, **labels) -> None:
        self.record(obs.get, **labels)

    def record_listener(self, listener: MetricsListener, **labels) -> None:
        self.record(listener.totals, **labels)

    def render(self) -> str:
        groups = [(counters, dict(key)) for key, counters in self._groups.items()]
        return render_prometheus(groups, prefix=self.prefix)

    def write(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(self.render())

    # --- scrape endpoint (stdlib; reference serves the same two
    # routes through uvicorn + prometheus_client) -----------------
    def serve(self, host: str = "127.0.0.1", port: int = 0) -> tuple[str, int]:
        """Start the scrape server on a background thread; returns the
        bound (host, port). ``port=0`` picks a free port."""
        exporter = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 — stdlib API
                if self.path == "/health":
                    body, status = b"OK", 200
                    ctype = "text/plain"
                else:
                    body = exporter.render().encode()
                    status = 200
                    ctype = "text/plain; version=0.0.4"
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # quiet
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self._server.server_address[0], self._server.server_address[1]

    def shutdown(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

