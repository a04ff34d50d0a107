"""Input connectors (reference: ``logprep/connector/*`` inputs and
``logprep/abc/input.py`` preprocessing).

Every input yields a DataFrame of events; streaming variants yield an
unbounded Structured-Streaming DataFrame with identical schema, so the
same processor pipeline runs on both. Ingest-time preprocessors
(hmac / version_info / arrival time / env enrichment / full-event
copy — reference ``abc/input.py:94-163``) are pure column appends.
"""

from __future__ import annotations

import hashlib
import hmac as _hmac
import os
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --- preprocessing (reference abc/input.py PreprocessingConfig) --------


@dataclass
class PreprocessingConfig:
    """Mirror of the reference's per-input preprocessing block."""

    hmac_key: str | None = None
    hmac_target: str = "hmac"
    version_info_target_field: str | None = None
    version_info: str = "logprep_spark-0.1"
    log_arrival_time_target_field: str | None = None
    enrich_by_env_variables: dict[str, str] = field(default_factory=dict)
    add_full_event_to_target_field: str | None = None


def hmac_sha256(msg: Column, key: str) -> Column:
    """True HMAC-SHA256 as nested JVM-side sha2 over binary — no UDF.

    RFC 2104: H(key ^ opad || H(key ^ ipad || msg)). The key pads are
    config-time constants, so both concat operands stay literals and
    the whole expression lives in whole-stage codegen.
    """
    kb = key.encode()
    if len(kb) > 64:
        kb = hashlib.sha256(kb).digest()
    kb = kb.ljust(64, b"\x00")
    ipad = bytes(b ^ 0x36 for b in kb)
    opad = bytes(b ^ 0x5C for b in kb)
    inner = F.sha2(F.concat(F.lit(ipad), msg.cast("binary")), 256)
    return F.sha2(F.concat(F.lit(opad), F.unhex(inner)), 256)


def apply_preprocessors(df: DataFrame, cfg: PreprocessingConfig, raw_col: str = "raw") -> DataFrame:
    """Append ingest-time fields. All narrow column ops — zero shuffle,
    valid on batch and streaming DataFrames alike."""
    if cfg.add_full_event_to_target_field and raw_col in df.columns:
        df = df.withColumn(cfg.add_full_event_to_target_field, F.col(raw_col))
    if cfg.hmac_key is not None and raw_col in df.columns:
        df = df.withColumn(cfg.hmac_target, hmac_sha256(F.col(raw_col), cfg.hmac_key))
    if cfg.version_info_target_field:
        df = df.withColumn(cfg.version_info_target_field, F.lit(cfg.version_info))
    if cfg.log_arrival_time_target_field:
        df = df.withColumn(cfg.log_arrival_time_target_field, F.current_timestamp())
    for target, env_name in cfg.enrich_by_env_variables.items():
        df = df.withColumn(target, F.lit(os.environ.get(env_name)))
    return df


class Input:
    """Base input: subclasses build a (streaming) DataFrame; the
    preprocessing block is applied uniformly afterwards."""

    def __init__(self, preprocessing: PreprocessingConfig | None = None):
        self.preprocessing = preprocessing or PreprocessingConfig()

    def _post(self, df: DataFrame, raw_col: str = "raw") -> DataFrame:
        return apply_preprocessors(df, self.preprocessing, raw_col)


class JsonlInput(Input):
    """reference ``connector/jsonl`` — newline-delimited JSON files.

    With an explicit schema the json scan prunes columns and never
    infers (inference is a full extra pass — never at 100 TB). The
    raw line is retained only when hmac/full-event preprocessing
    needs it.
    """

    def __init__(self, path: str, schema: T.StructType | str | None = None, **kw):
        super().__init__(**kw)
        self.path = path
        self.schema = schema

    def _needs_raw(self) -> bool:
        return self.preprocessing.hmac_key is not None or bool(
            self.preprocessing.add_full_event_to_target_field
        )

    def _parse(self, lines: DataFrame, spark: SparkSession) -> DataFrame:
        if self.schema is None:
            raise ValueError("streaming/raw jsonl read requires an explicit schema")
        parsed = lines.select(
            F.col("value").alias("raw"), F.from_json("value", self.schema).alias("e")
        ).select("raw", "e.*")
        return self._post(parsed).drop("raw")

    def read(self, spark: SparkSession) -> DataFrame:
        if self._needs_raw():
            return self._parse(spark.read.text(self.path), spark)
        reader = spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return self._post(reader.json(self.path))

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return self._parse(spark.readStream.text(self.path), spark)

    def read_with_quarantine(
        self, spark: SparkSession
    ) -> tuple[DataFrame, DataFrame]:
        """(ok, quarantine) — the parse-level dead-letter split every
        production ingest needs (the processor-level twin is X29's
        tag_on_failure): a malformed line must neither kill the job
        (FAILFAST) nor silently become an all-null row (the default
        PERMISSIVE trap — from_json yields a struct of nulls for
        malformed input, indistinguishable from a valid all-null
        object). The columnNameOfCorruptRecord contract disambiguates:
        malformed lines carry their raw text in the corrupt field and
        quarantine WITH the source file for replay; everything else
        parses normally (schema'd scan, no inference pass). Blank
        lines are noise, not failures — dropped from both sides."""
        if self.schema is None:
            raise ValueError("quarantine read requires an explicit schema")
        schema = (
            T._parse_datatype_string(self.schema)
            if isinstance(self.schema, str)
            else self.schema
        )
        probed = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt", T.StringType())]
        )
        staged = spark.read.text(self.path).select(
            F.col("value").alias("raw"),
            F.input_file_name().alias("src_file"),
            F.from_json(
                "value", probed, {"columnNameOfCorruptRecord": "_corrupt"}
            ).alias("e"),
        )
        bad = F.col("e").isNull() | F.col("e._corrupt").isNotNull()
        ok = self._post(
            staged.filter(~bad).select("raw", "e.*")
        ).drop("raw", "_corrupt")
        quarantine = staged.filter(
            bad & (F.length(F.trim(F.col("raw"))) > 0)
        ).select("raw", "src_file")
        return ok, quarantine


class JsonInput(JsonlInput):
    """reference ``connector/json`` — whole-file JSON documents."""

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.option("multiLine", "true")
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return self._post(reader.json(self.path))


class FileInput(Input):
    """reference ``connector/file`` — tail a growing log file/dir.
    Batch: one-shot read; streaming: file-source tailing new files."""

    def __init__(self, path: str, **kw):
        super().__init__(**kw)
        self.path = path

    def read(self, spark: SparkSession) -> DataFrame:
        return self._post(spark.read.text(self.path).withColumnRenamed("value", "message"))

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return self._post(
            spark.readStream.format("text").load(self.path).withColumnRenamed("value", "message")
        )


class DummyInput(Input):
    """reference ``connector/dummy`` — fixed in-memory event list."""

    def __init__(self, events: list[dict], schema: T.StructType | str | None = None, **kw):
        super().__init__(**kw)
        self.events = events
        self.schema = schema

    def read(self, spark: SparkSession) -> DataFrame:
        return self._post(spark.createDataFrame(self.events, schema=self.schema))


class HttpInput(Input):
    """reference ``connector/http`` — push endpoint. No HTTP listener
    exists inside a Spark job; the Spark-shaped equivalent is a spool
    directory (receiver writes jsonl; the stream tails it), so this is
    ``JsonlInput.read_stream`` plus an explicitly-stubbed server.

    The OPTION SCHEMA mirrors the reference Config
    (connector/http/input.py:406-540): ``endpoints`` routes (path →
    json|jsonl|plaintext, ``*`` wildcards allowed), ``uvicorn_config``
    validated against the public uvicorn settings names,
    ``message_backlog_size``, ``copy_headers_to_logs`` /
    ``collect_meta`` / ``metafield_name`` metadata collection and
    ``original_event_field`` — so reference YAML validates unchanged.
    :meth:`receive` is the in-process stand-in for one endpoint hit:
    per-endpoint auth from the credentials file (reference
    endpoint ``basic_auth`` decorator), body parsing per endpoint
    type, header metadata, then a jsonl spool append that
    ``read_stream`` tails."""

    ENDPOINT_TYPES = ("json", "plaintext", "jsonl")
    #: public uvicorn settings (reference validates against
    #: uvicorn's own parameter list minus app/loop — util/http.py:16)
    UVICORN_CONFIG_KEYS = frozenset(
        """host port uds fd workers ws lifespan env_file log_config
        log_level access_log use_colors interface reload reload_dirs
        ssl_keyfile ssl_certfile ssl_keyfile_password ssl_version
        ssl_cert_reqs ssl_ca_certs ssl_ciphers headers server_header
        date_header limit_concurrency limit_max_requests backlog
        timeout_keep_alive timeout_notify timeout_graceful_shutdown
        h11_max_incomplete_event_size root_path proxy_headers
        forwarded_allow_ips""".split()
    )
    DEFAULT_META_HEADERS = ("remote_addr", "url", "User-Agent")

    def __init__(
        self,
        spool_dir: str,
        schema: T.StructType | str,
        endpoints: dict[str, str] | None = None,
        uvicorn_config: dict | None = None,
        message_backlog_size: int = 15000,
        copy_headers_to_logs: list[str] | set[str] | None = None,
        collect_meta: bool = True,
        metafield_name: str = "@metadata",
        original_event_field: dict[str, str] | None = None,
        **kw,
    ):
        super().__init__(**kw)
        self.spool_dir = spool_dir
        self.endpoints = endpoints if endpoints is not None else {"/events": "json"}
        for path, kind in self.endpoints.items():
            if not path.startswith("/") or len(path) < 2:
                raise ValueError(f"http_input endpoint path must match ^/.+: {path!r}")
            if kind not in self.ENDPOINT_TYPES:
                raise ValueError(
                    f"http_input endpoint {path!r} type {kind!r} not in "
                    f"{self.ENDPOINT_TYPES}"
                )
        self.uvicorn_config = dict(uvicorn_config or {})
        unknown = sorted(set(self.uvicorn_config) - self.UVICORN_CONFIG_KEYS)
        if unknown:
            raise ValueError(f"http_input uvicorn_config unknown keys: {unknown}")
        self.message_backlog_size = int(message_backlog_size)
        self.collect_meta = bool(collect_meta)
        self.copy_headers_to_logs = set(
            copy_headers_to_logs
            if copy_headers_to_logs is not None
            else (self.DEFAULT_META_HEADERS if self.collect_meta else ())
        )
        self.metafield_name = metafield_name
        self.original_event_field = original_event_field
        self._jsonl = JsonlInput(spool_dir, schema, preprocessing=self.preprocessing)

    def _match_endpoint(self, path: str) -> str:
        from fnmatch import fnmatch

        if path in self.endpoints:
            return self.endpoints[path]
        for pattern, kind in self.endpoints.items():
            if fnmatch(path, pattern):
                return kind
        raise KeyError(f"no http_input endpoint matches {path!r}")

    def receive(
        self,
        path: str,
        body: str,
        headers: dict[str, str] | None = None,
        remote_addr: str = "",
        url: str = "",
    ) -> list[dict]:
        """One endpoint hit, in-process: auth check (credentials-file
        ``input.endpoints`` section), parse per endpoint type, attach
        header metadata, append jsonl to the spool the stream tails.
        Returns the events written (for assertions)."""
        import json as _json

        from logprep_spark.credentials import CredentialsFactory

        headers = dict(headers or {})
        required = CredentialsFactory.from_endpoint(path)
        if required is not None:
            expected = required.get_headers().get("Authorization")
            if expected is not None and headers.get("Authorization") != expected:
                raise PermissionError(f"unauthorized for endpoint {path!r}")

        kind = self._match_endpoint(path)
        if kind == "json":
            events = [_json.loads(body)]
        elif kind == "jsonl":
            events = [_json.loads(line) for line in body.splitlines() if line.strip()]
        else:
            events = [{"message": body}]

        if self.original_event_field:
            target = self.original_event_field["target_field"]
            as_str = self.original_event_field.get("format", "str") == "str"
            events = [
                {target: body if as_str else ev} for ev in events
            ]
        if self.collect_meta and self.copy_headers_to_logs:
            meta_source = {**headers, "remote_addr": remote_addr, "url": url}
            meta = {
                h.lower().replace("-", "_"): meta_source[h]
                for h in self.copy_headers_to_logs
                if meta_source.get(h)
            }
            events = [{**ev, self.metafield_name: meta} for ev in events]

        os.makedirs(self.spool_dir, exist_ok=True)
        import uuid

        with open(os.path.join(self.spool_dir, f"recv-{uuid.uuid4().hex}.jsonl"), "w") as fh:
            for ev in events:
                fh.write(_json.dumps(ev) + "\n")
        return events

    def read_stream(self, spark: SparkSession) -> DataFrame:
        return self._jsonl.read_stream(spark)

    def serve(self, host: str | None = None, port: int | None = None) -> tuple[str, int]:
        """REAL HTTP listener: a stdlib ThreadingHTTPServer standing in
        for the reference's uvicorn server (connector/http/input.py —
        same roles: endpoint routing, auth, body parse, backlog). POST
        bodies dispatch through :meth:`receive` into the spool the
        Spark stream tails; GET ``/health`` answers OK. Defaults come
        from ``uvicorn_config`` host/port; ``port=0`` picks a free
        port. Returns the bound (host, port)."""
        import threading
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        inp = self
        host = host or self.uvicorn_config.get("host", "127.0.0.1")
        if port is None:
            port = int(self.uvicorn_config.get("port", 0))

        class Handler(BaseHTTPRequestHandler):
            def _reply(self, status: int, body: bytes):
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802 — stdlib API
                if self.path == "/health":
                    self._reply(200, b'"OK"')
                else:
                    self._reply(404, b'{"error": "not found"}')

            def do_POST(self):  # noqa: N802
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length).decode("utf-8", "replace")
                route = self.path.split("?", 1)[0]
                try:
                    events = inp.receive(
                        route,
                        body,
                        headers=dict(self.headers),
                        remote_addr=self.client_address[0],
                        url=self.path,
                    )
                except PermissionError:
                    self._reply(401, b'{"error": "unauthorized"}')
                except KeyError:
                    self._reply(404, b'{"error": "no such endpoint"}')
                except ValueError:
                    self._reply(400, b'{"error": "malformed body"}')
                else:
                    self._reply(200, b'{"accepted": %d}' % len(events))

            def log_message(self, *args):  # quiet
                pass

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self._server.server_address[0], self._server.server_address[1]

    def shutdown(self) -> None:
        server = getattr(self, "_server", None)
        if server is not None:
            server.shutdown()
            server.server_close()
            self._server = None


class KafkaInput(Input):
    """reference ``connector/confluent_kafka`` input.

    Builds the ``readStream.format('kafka')`` plan; ``.load()`` needs
    the spark-sql-kafka package on the classpath, so plan construction
    and execution are separate (construction is unit-testable without
    a broker). Value parsing uses the same explicit-schema from_json
    path as JsonlInput.
    """

    #: consumer options the reference accepts in ``kafka_config``
    #: (connector/confluent_kafka/input.py:238-260 requires
    #: bootstrap.servers + group.id; security.*/ssl.* pass through) —
    #: mirrored so reference configs validate unchanged. Everything
    #: prefixes as ``kafka.`` for Spark's kafka source.
    REQUIRED_KEYS = ("bootstrap.servers",)
    PASSTHROUGH_PREFIXES = ("security.", "ssl.", "sasl.", "group.", "session.", "max.poll.")

    def __init__(
        self,
        bootstrap_servers: str,
        topic: str,
        schema: T.StructType | str | None = None,
        starting_offsets: str = "latest",
        kafka_config: dict[str, str] | None = None,
        broker=None,
        **kw,
    ):
        """``broker``: injectable fake implementing the reader contract
        (sources/fake_kafka.FakeKafkaBroker) — swaps the wire-schema
        source while the whole downstream decode/parse path stays the
        production code. None = real ``format("kafka")``."""
        super().__init__(**kw)
        self.bootstrap_servers = bootstrap_servers
        self.topic = topic
        self.schema = schema
        self.starting_offsets = starting_offsets
        self.broker = broker
        self.kafka_config = dict(kafka_config or {})
        self.kafka_config.setdefault("bootstrap.servers", bootstrap_servers)
        missing = [k for k in self.REQUIRED_KEYS if not self.kafka_config.get(k)]
        if missing:
            raise ValueError(f"kafka_config missing required keys: {missing}")

    def options(self) -> dict[str, str]:
        opts = {
            "kafka.bootstrap.servers": self.kafka_config["bootstrap.servers"],
            "subscribe": self.topic,
            "startingOffsets": self.starting_offsets,
        }
        for key, value in self.kafka_config.items():
            if key.startswith(self.PASSTHROUGH_PREFIXES):
                opts[f"kafka.{key}"] = str(value)
        return opts

    def reader(self, spark: SparkSession):
        return spark.readStream.format("kafka").options(**self.options())

    def read_stream(self, spark: SparkSession) -> DataFrame:
        if self.broker is not None:
            from logprep_spark.sources.fake_kafka import KAFKA_WIRE_SCHEMA

            # a real broker rejects a subscribe to an unknown topic;
            # without this check a typo'd topic name yields a silently
            # empty stream (the file source needs the first produce()
            # to have happened before the stream starts anyway)
            if self.topic not in self.broker.topics():
                raise ValueError(
                    f"unknown topic {self.topic!r}: produce() to it before "
                    f"starting the stream (known: {sorted(self.broker.topics())})"
                )
            raw = (
                spark.readStream.schema(KAFKA_WIRE_SCHEMA)
                .json(self.broker.topic_dir(self.topic))
            )
        else:
            raw = self.reader(spark).load()
        df = raw.select(F.col("value").cast("string").alias("raw"))
        if self.schema is not None:
            df = df.select("raw", F.from_json("raw", self.schema).alias("e")).select(
                "raw", "e.*"
            )
        return self._post(df).drop("raw")
