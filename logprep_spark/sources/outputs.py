"""Output connectors (reference: ``logprep/connector/*`` outputs).

Batch outputs are ``df.write`` variants; streaming outputs are
``writeStream`` sinks. Service-backed sinks (OpenSearch, Kafka) are
expressed through ``foreachBatch``/kafka-sink so each micro-batch
ships as a bulk write from the executors — never a driver-side loop.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class JsonlOutput:
    """reference ``connector/jsonl`` output: one JSON doc per line."""

    def __init__(self, path: str, mode: str = "overwrite"):
        self.path = path
        self.mode = mode

    def write(self, df: DataFrame) -> None:
        df.write.mode(self.mode).json(self.path)

    def write_stream(self, df: DataFrame, checkpoint: str, **trigger):
        return (
            df.writeStream.format("json")
            .option("path", self.path)
            .option("checkpointLocation", checkpoint)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )


class ParquetOutput:
    """Columnar archive output — the 100 TB default. ``partition_by``
    (e.g. event date) gives partition pruning to every downstream
    reader."""

    def __init__(self, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"):
        self.path = path
        self.partition_by = partition_by or []
        self.mode = mode

    def write(self, df: DataFrame) -> None:
        writer = df.write.mode(self.mode)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.path)


class IdempotentBatchOutput:
    """Exactly-once micro-batch file sink — the ``foreachBatch``
    idempotency pattern every production streaming job needs: Spark's
    foreachBatch gives at-least-once delivery (a batch REPLAYS after a
    crash between sink write and checkpoint commit), so the sink must
    make re-delivery harmless. Each batch writes to a temp directory
    and atomically renames it to ``batch-<id>``; a replayed batch sees
    the committed directory and SKIPS — no duplicates, no partial
    output visible to readers at any point (the transactional-rename
    discipline of the fake Kafka broker and the reference's S3 batch
    semantics, cf. logprep/connector/s3/output.py batch buffering).
    """

    def __init__(self, path: str, fmt: str = "json"):
        self.path = path
        self.fmt = fmt

    def committed_batches(self) -> list[int]:
        import os
        import re as _re

        if not os.path.isdir(self.path):
            return []
        out = []
        for name in os.listdir(self.path):
            m = _re.fullmatch(r"batch-(\d+)", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def write_batch(self, df: DataFrame, batch_id: int) -> bool:
        """Write one micro-batch; returns False when the batch was
        already committed (replay) and nothing was written."""
        import os
        import shutil

        final = os.path.join(self.path, f"batch-{batch_id}")
        if os.path.isdir(final):
            return False
        tmp = os.path.join(self.path, f".tmp-batch-{batch_id}")
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)  # crashed earlier attempt: discard
        getattr(df.write.mode("overwrite"), self.fmt)(tmp)
        os.rename(tmp, final)  # atomic commit
        return True

    def write_stream(self, df: DataFrame, checkpoint: str, **trigger):
        return (
            df.writeStream.foreachBatch(
                lambda batch_df, batch_id: self.write_batch(batch_df, batch_id)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )


class ConsoleOutput:
    """reference ``connector/console``."""

    def write(self, df: DataFrame) -> None:
        df.show(truncate=False)

    def write_stream(self, df: DataFrame, **trigger):
        return (
            df.writeStream.format("console")
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )


class DummyOutput:
    """reference ``connector/dummy`` — collect to memory (tests)."""

    def __init__(self):
        self.events: list[dict] = []

    def write(self, df: DataFrame) -> None:
        self.events.extend(r.asDict(recursive=True) for r in df.collect())

    def write_stream(self, df: DataFrame, query_name: str = "dummy_out", **trigger):
        return (
            df.writeStream.format("memory")
            .queryName(query_name)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )


class KafkaOutput:
    """reference ``connector/confluent_kafka`` output. Events are
    serialized to a JSON ``value`` column; the kafka sink fans writes
    out from every executor. Plan construction is broker-free."""

    def __init__(self, bootstrap_servers: str, topic: str):
        self.bootstrap_servers = bootstrap_servers
        self.topic = topic

    def options(self) -> dict[str, str]:
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "topic": self.topic,
        }

    @staticmethod
    def serialize(df: DataFrame) -> DataFrame:
        return df.select(F.to_json(F.struct(*df.columns)).alias("value"))

    def writer(self, df: DataFrame):
        return self.serialize(df).write.format("kafka").options(**self.options())

    def stream_writer(self, df: DataFrame, checkpoint: str):
        return (
            self.serialize(df)
            .writeStream.format("kafka")
            .options(**self.options())
            .option("checkpointLocation", checkpoint)
        )


class OpensearchOutput:
    """reference ``connector/opensearch`` — bulk indexer.

    The cluster client isn't in this container, so the transport is an
    injectable callable; the Spark-side shape is real: ``foreachBatch``
    → per-partition bulk payload assembly on executors. The default
    transport spools bulk bodies to a local directory so tests can
    assert exact payloads.
    """

    def __init__(
        self,
        index: str,
        spool_dir: str | None = None,
        transport=None,
        hosts: list[str] | str | None = None,
        error_index: str | None = None,
        message_backlog_size: int = 500,
        timeout: int = 500,
        max_retries: int = 3,
        user: str | None = None,
        secret: str | None = None,
        ca_cert: str | None = None,
    ):
        """Option surface mirrors the reference config schema
        (connector/opensearch/output.py:85-135: hosts, default_index,
        error_index, message_backlog_size, timeout, max_retries,
        user/secret, ca_cert) so reference YAML validates unchanged.
        ``message_backlog_size`` is the bulk chunk size; failed bulk
        sends retry ``max_retries`` times with exponential backoff
        (the reference's helpers.bulk retry semantics)."""
        self.index = index
        self.spool_dir = spool_dir
        self.transport = transport
        self.hosts = [hosts] if isinstance(hosts, str) else list(hosts or [])
        self.error_index = error_index
        self.message_backlog_size = max(1, int(message_backlog_size))
        self.timeout = timeout
        self.max_retries = max(0, int(max_retries))
        self.user = user
        self.secret = secret
        self.ca_cert = ca_cert

    def _bulk_lines(self, rows) -> str:
        lines = []
        for r in rows:
            lines.append(json.dumps({"index": {"_index": self.index}}))
            lines.append(json.dumps(r.asDict(recursive=True), default=str))
        return "\n".join(lines) + "\n" if lines else ""

    def auth_headers(self) -> dict:
        """Authorization for the bulk endpoint, resolved ONCE on the
        driver and closed over into the executor-side sender:
        ``LOGPREP_CREDENTIALS_FILE`` mapping for the first host
        (credentials.py from_target) wins over the inline user/secret
        basic pair. Token fetch/refresh happens driver-side per batch —
        never once per partition."""
        from logprep_spark.credentials import BasicAuthCredentials, CredentialsFactory

        creds = CredentialsFactory.from_target(self.hosts[0]) if self.hosts else None
        if creds is None and self.user and self.secret:
            creds = BasicAuthCredentials(self.user, self.secret)
        return creds.get_headers() if creds is not None else {}

    def http_transport(self):
        """Real HTTP bulk sender over stdlib urllib: POST the ndjson
        body to ``{host}/_bulk`` (the public OpenSearch/Elasticsearch
        bulk protocol), raise on transport errors AND on responses
        whose per-item status reports a failure — both trigger the
        chunk retry/backoff in :meth:`write_batch`. Closed over into
        executors like any injected transport; no client library."""
        host = self.hosts[0].rstrip("/")
        url = f"{host}/_bulk"
        # reference documents timeout in MILLISECONDS (connector/
        # opensearch/output.py:101-102 "default is 500ms"); honor that
        # here (floor 100ms) so the default can't hang an executor
        # task for minutes on a stuck bulk endpoint.
        timeout_s = max(0.1, float(self.timeout) / 1000.0)

        def send(body: str, headers: dict) -> None:
            import json as _json
            import urllib.request

            req = urllib.request.Request(
                url,
                data=body.encode("utf-8"),
                method="POST",
                headers={"Content-Type": "application/x-ndjson", **headers},
            )
            with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                payload = _json.loads(resp.read().decode("utf-8"))
            if payload.get("errors"):
                bad = [
                    it["index"].get("status")
                    for it in payload.get("items", [])
                    if it.get("index", {}).get("status", 200) >= 400
                ]
                raise RuntimeError(f"bulk items failed with statuses {bad}")

        return send

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """Executor-side bulk assembly: each partition builds and ships
        its own bulk bodies (``foreachPartition``), chunked to
        ``message_backlog_size`` docs, with per-chunk retry — rows
        never funnel through the driver."""
        spool, transport, bulk = self.spool_dir, self.transport, self._bulk_lines
        if transport is None and self.hosts:
            transport = self.http_transport()
        chunk_size, max_retries = self.message_backlog_size, self.max_retries
        headers = self.auth_headers()
        import inspect

        def _wants_headers(fn) -> bool:
            # only count REQUIRED positional params: default-arg helpers
            # (e.g. closure-bound test transports) stay single-arg
            params = [
                p
                for p in inspect.signature(fn).parameters.values()
                if p.default is inspect.Parameter.empty
                and p.kind
                in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
            ]
            return len(params) >= 2

        transport_takes_headers = transport is not None and _wants_headers(transport)

        def send_body(body: str, batch_id: int, pid: int, chunk_idx: int) -> None:
            if transport is not None:
                import time as _time

                for attempt in range(max_retries + 1):
                    try:
                        if transport_takes_headers:
                            transport(body, headers)
                        else:
                            transport(body)
                        return
                    except Exception:  # noqa: BLE001 - retried, then re-raised
                        if attempt == max_retries:
                            raise
                        _time.sleep(min(2**attempt * 0.1, 5.0))
            elif spool is not None:
                os.makedirs(spool, exist_ok=True)
                name = f"bulk-{batch_id}-{pid}-{chunk_idx}.ndjson"
                with open(os.path.join(spool, name), "w") as fh:
                    fh.write(body)
            else:
                raise NotImplementedError("no opensearch client in container; pass transport=")

        def send_partition(rows_iter):
            from itertools import islice

            from pyspark import TaskContext

            pid = TaskContext.get().partitionId() if TaskContext.get() else 0
            rows_iter = iter(rows_iter)
            chunk_idx = 0
            while True:
                chunk = list(islice(rows_iter, chunk_size))
                if not chunk:
                    break
                send_body(bulk(chunk), batch_id, pid, chunk_idx)
                chunk_idx += 1

        df.foreachPartition(send_partition)

    def write_stream(self, df: DataFrame, checkpoint: str, **trigger):
        return (
            df.writeStream.foreachBatch(self.write_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )


class HttpOutput:
    """reference ``connector/http/output.py:55-115`` — POST events as
    ndjson to paths under a configured ``target_url`` with basic auth.

    Option surface mirrors the reference Config (target_url, user,
    password, timeout seconds, verify bool|ca-path); the reference's
    ``store((target, events))`` tuple routing is expressed as an
    optional per-row target column: rows are grouped by that column's
    path inside each partition and each group POSTs to
    ``target_url + path`` (rows without it go to the root).

    Spark shape: ``foreachBatch`` → per-partition ndjson body
    assembly on the executors, chunked to ``batch_size`` docs with
    per-chunk retry/backoff — rows never funnel through the driver.
    Transport is stdlib urllib (no client library); auth headers are
    resolved ONCE driver-side (credentials file via
    CredentialsFactory.from_target wins over the inline user/password
    basic pair, matching OpensearchOutput precedence).
    """

    def __init__(
        self,
        target_url: str,
        user: str = "",
        password: str = "",
        timeout: int = 2,
        verify: bool | str = True,
        batch_size: int = 500,
        max_retries: int = 3,
        target_col: str = "_target",
    ):
        self.target_url = target_url.rstrip("/")
        self.user = user or ""
        self.password = password or ""
        # reference HttpOutput timeout is SECONDS (connector/http/
        # output.py: requests timeout=(timeout, timeout), default 2)
        self.timeout = max(0.1, float(timeout))
        self.verify = verify
        self.batch_size = max(1, int(batch_size))
        self.max_retries = max(0, int(max_retries))
        self.target_col = target_col

    def auth_headers(self) -> dict:
        from logprep_spark.credentials import BasicAuthCredentials, CredentialsFactory

        creds = CredentialsFactory.from_target(self.target_url)
        if creds is None and self.user:
            creds = BasicAuthCredentials(self.user, self.password)
        return creds.get_headers() if creds is not None else {}

    def _ssl_context(self):
        import ssl

        if self.verify is True:
            return None  # urllib default: verified context
        if self.verify is False:
            ctx = ssl.create_default_context()
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
            return ctx
        return ssl.create_default_context(cafile=str(self.verify))

    def write_batch(self, df: DataFrame, batch_id: int = 0) -> None:
        base_url = self.target_url
        target_col = self.target_col
        headers = {
            "Content-Type": "application/x-ndjson; charset=utf-8",
            **self.auth_headers(),
        }
        timeout_s, max_retries = self.timeout, self.max_retries
        chunk_size = self.batch_size
        ctx = self._ssl_context()
        has_target = target_col in df.columns

        def post(path: str, body: str) -> None:
            import time as _time
            import urllib.request

            req = urllib.request.Request(
                base_url + path,
                data=body.encode("utf-8"),
                method="POST",
                headers=headers,
            )
            for attempt in range(max_retries + 1):
                try:
                    with urllib.request.urlopen(req, timeout=timeout_s, context=ctx) as resp:
                        resp.read()
                    return
                except Exception:  # noqa: BLE001 — retried, then re-raised
                    if attempt == max_retries:
                        raise
                    _time.sleep(min(2**attempt * 0.1, 5.0))

        def send_partition(rows_iter):
            from itertools import islice

            rows_iter = iter(rows_iter)
            while True:
                chunk = list(islice(rows_iter, chunk_size))
                if not chunk:
                    break
                # group by target path, preserving row order per group
                groups: dict[str, list[str]] = {}
                for r in chunk:
                    d = r.asDict(recursive=True)
                    path = (d.pop(target_col, None) or "") if has_target else ""
                    groups.setdefault(path, []).append(json.dumps(d, default=str))
                for path, lines in groups.items():
                    post(path, "\n".join(lines) + "\n")

        df.foreachPartition(send_partition)

    def write_stream(self, df: DataFrame, checkpoint: str, **trigger):
        return (
            df.writeStream.foreachBatch(self.write_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )


def sigv4_headers(
    method: str,
    url: str,
    payload: bytes,
    access_key: str,
    secret_key: str,
    region: str = "us-east-1",
    service: str = "s3",
    amz_date: str | None = None,
    extra_signed_headers: dict | None = None,
) -> dict:
    """AWS Signature Version 4 headers (public algorithm, AWS docs
    'Signature Calculation Process'): canonical request -> string to
    sign -> HMAC key derivation chain -> Authorization header. Pure
    stdlib (hashlib/hmac); verified against the published AWS test
    vector in tests/integration/test_sources.py."""
    import datetime
    import hashlib
    import hmac
    from urllib.parse import quote, urlsplit

    parts = urlsplit(url)
    host = parts.netloc
    if amz_date is None:
        amz_date = datetime.datetime.now(datetime.timezone.utc).strftime("%Y%m%dT%H%M%SZ")
    datestamp = amz_date[:8]
    payload_hash = hashlib.sha256(payload or b"").hexdigest()

    # AWS S3 rule: the canonical URI is the path with each segment
    # URI-encoded exactly ONCE. Callers pass an already-encoded URL
    # (urllib requires that anyway), so keep existing %XX escapes
    # verbatim (safe="%") instead of re-encoding them to %25XX.
    canonical_uri = quote(parts.path or "/", safe="/%")
    query_items = sorted(
        pair.split("=", 1) if "=" in pair else [pair, ""]
        for pair in parts.query.split("&")
        if pair
    )
    canonical_query = "&".join(
        f"{quote(k, safe='-_.~')}={quote(v, safe='-_.~')}" for k, v in query_items
    )
    headers = {"host": host, "x-amz-date": amz_date}
    if service == "s3":  # S3 requires the content hash as a signed header
        headers["x-amz-content-sha256"] = payload_hash
    headers.update({k.lower(): v for k, v in (extra_signed_headers or {}).items()})
    signed_headers = ";".join(sorted(headers))
    canonical_headers = "".join(f"{k}:{headers[k].strip()}\n" for k in sorted(headers))
    canonical_request = "\n".join(
        [method, canonical_uri, canonical_query, canonical_headers, signed_headers, payload_hash]
    )
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            amz_date,
            scope,
            hashlib.sha256(canonical_request.encode()).hexdigest(),
        ]
    )

    def hsig(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k_date = hsig(f"AWS4{secret_key}".encode(), datestamp)
    k_region = hsig(k_date, region)
    k_service = hsig(k_region, service)
    k_signing = hsig(k_service, "aws4_request")
    signature = hmac.new(k_signing, string_to_sign.encode(), hashlib.sha256).hexdigest()
    return {
        "x-amz-date": amz_date,
        "x-amz-content-sha256": payload_hash,
        "Authorization": (
            f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
            f"SignedHeaders={signed_headers}, Signature={signature}"
        ),
    }


class S3Output:
    """reference ``connector/s3`` — object-store writer. Two paths:

    - ``write``: the Spark writer plan against an ``s3a://`` URI —
      identical to ParquetOutput/JsonlOutput; credentials/endpoint
      come from hadoop conf (hadoop-aws jars, not shipped here; local
      paths work verbatim in tests).
    - ``write_http``: a REAL S3 REST path with no jars and no SDK —
      per-partition ndjson bodies PUT to
      ``{endpoint}/{bucket}/{prefix}/part-{batch}-{pid}.json`` over
      stdlib urllib, SigV4-signed (:func:`sigv4_headers`) when keys
      are configured. Works against any S3-compatible store; e2e
      tested against an in-repo stdlib listener.
    """

    def __init__(
        self,
        base_uri: str,
        fmt: str = "json",
        endpoint: str | None = None,
        access_key: str | None = None,
        secret_key: str | None = None,
        region: str = "us-east-1",
    ):
        self.base_uri = base_uri
        self.fmt = fmt
        self.endpoint = endpoint
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region

    def write(self, df: DataFrame, prefix: str = "events") -> None:
        df.write.mode("append").format(self.fmt).save(f"{self.base_uri}/{prefix}")

    def write_http(self, df: DataFrame, prefix: str = "events", batch_id: int = 0) -> None:
        if not self.endpoint:
            raise ValueError("write_http needs endpoint=")
        from urllib.parse import quote as _quote

        bucket = self.base_uri.split("://", 1)[-1].strip("/")
        endpoint = self.endpoint.rstrip("/")
        # URL-encode each key segment exactly once at build time; the
        # signer keeps the escapes verbatim (sigv4_headers safe="%"),
        # so spaces/%/non-ASCII in prefixes neither crash urllib nor
        # skew the signature.
        key_prefix = "/".join(
            _quote(seg, safe="") for seg in f"{bucket}/{prefix}".split("/") if seg
        )
        access, secret, region = self.access_key, self.secret_key, self.region

        def send_partition(rows_iter):
            import urllib.request

            from pyspark import TaskContext

            rows = list(rows_iter)
            if not rows:
                return
            pid = TaskContext.get().partitionId() if TaskContext.get() else 0
            body = (
                "\n".join(json.dumps(r.asDict(recursive=True), default=str) for r in rows)
                + "\n"
            ).encode("utf-8")
            url = f"{endpoint}/{key_prefix}/part-{batch_id}-{pid:05d}.json"
            headers = {"Content-Type": "application/x-ndjson"}
            if access and secret:
                headers.update(sigv4_headers("PUT", url, body, access, secret, region))
            req = urllib.request.Request(url, data=body, method="PUT", headers=headers)
            with urllib.request.urlopen(req, timeout=30) as resp:
                if resp.status >= 300:
                    raise RuntimeError(f"S3 PUT failed: {resp.status}")

        df.foreachPartition(send_partition)
