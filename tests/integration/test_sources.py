"""Connector tests: batch reads/writes, preprocessing, Kafka plan
construction (broker-free), OpenSearch bulk spooling."""

import hashlib
import hmac as hmac_lib
import json
import os

from pyspark.sql import functions as F

import pytest

from logprep_spark.sources import (
    DummyInput,
    HttpInput,
    DummyOutput,
    FileInput,
    JsonlInput,
    JsonlOutput,
    KafkaInput,
    KafkaOutput,
    OpensearchOutput,
    ParquetOutput,
    PreprocessingConfig,
    S3Output,
)

EVENTS = [
    {"event_id": 1, "event_type": "login", "user": "alice"},
    {"event_id": 2, "event_type": "logout", "user": "bob"},
]
SCHEMA = "event_id long, event_type string, user string"


def _write_jsonl(tmp_path, name="in.jsonl", events=EVENTS):
    p = tmp_path / name
    p.write_text("\n".join(json.dumps(e) for e in events) + "\n")
    return str(p)


def test_jsonl_roundtrip(spark, tmp_path):
    src = JsonlInput(_write_jsonl(tmp_path), SCHEMA)
    df = src.read(spark)
    assert sorted(r.event_type for r in df.collect()) == ["login", "logout"]

    out = JsonlOutput(str(tmp_path / "out"))
    out.write(df)
    back = spark.read.schema(SCHEMA).json(str(tmp_path / "out"))
    assert back.count() == 2


def test_jsonl_schema_prunes_and_no_inference(spark, tmp_path):
    src = JsonlInput(_write_jsonl(tmp_path), SCHEMA)
    plan = src.read(spark).select("event_id")._jdf.queryExecution().optimizedPlan().toString()
    # column-pruned scan: the projection reaches the json relation
    assert "event_type" not in plan.split("Relation")[0]


def test_preprocessors_hmac_matches_python(spark, tmp_path):
    cfg = PreprocessingConfig(
        hmac_key="secret-key",
        version_info_target_field="version_info",
        add_full_event_to_target_field="full_event",
    )
    src = JsonlInput(_write_jsonl(tmp_path), SCHEMA, preprocessing=cfg)
    got = {r.event_id: r for r in src.read(spark).collect()}
    raw1 = json.dumps(EVENTS[0])
    expect = hmac_lib.new(b"secret-key", raw1.encode(), hashlib.sha256).hexdigest()
    assert got[1].hmac == expect
    assert got[1].version_info == "logprep_spark-0.1"
    assert json.loads(got[1].full_event) == EVENTS[0]


def test_file_input_and_env_enrichment(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("LP_TEST_HOSTNAME", "node-7")
    log = tmp_path / "syslog.log"
    log.write_text("line one\nline two\n")
    cfg = PreprocessingConfig(enrich_by_env_variables={"host": "LP_TEST_HOSTNAME"})
    df = FileInput(str(log), preprocessing=cfg).read(spark)
    rows = df.collect()
    assert {r.message for r in rows} == {"line one", "line two"}
    assert all(r.host == "node-7" for r in rows)


def test_dummy_in_out(spark):
    df = DummyInput(EVENTS, SCHEMA).read(spark)
    sink = DummyOutput()
    sink.write(df.filter(F.col("event_type") == "login"))
    assert sink.events == [{"event_id": 1, "event_type": "login", "user": "alice"}]


def test_kafka_plans_broker_free(spark):
    ki = KafkaInput("broker:9092", "logs", SCHEMA, starting_offsets="earliest")
    assert ki.options() == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "logs",
        "startingOffsets": "earliest",
    }
    assert ki.reader(spark) is not None  # format+options bind without the kafka jar

    ko = KafkaOutput("broker:9092", "out-topic")
    ser = KafkaOutput.serialize(DummyInput(EVENTS, SCHEMA).read(spark))
    assert ser.columns == ["value"]
    assert json.loads(ser.collect()[0].value)["event_type"] == "login"
    assert ko.options()["topic"] == "out-topic"


def test_opensearch_bulk_spool(spark, tmp_path):
    spool = str(tmp_path / "bulk")
    sink = OpensearchOutput(index="events-idx", spool_dir=spool)
    df = DummyInput(EVENTS, SCHEMA).read(spark).repartition(1)
    sink.write_batch(df, batch_id=0)
    files = os.listdir(spool)
    assert len(files) == 1
    lines = (tmp_path / "bulk" / files[0]).read_text().strip().split("\n")
    assert json.loads(lines[0]) == {"index": {"_index": "events-idx"}}
    assert json.loads(lines[1])["event_type"] in ("login", "logout")


def test_parquet_partitioned_and_s3_shape(spark, tmp_path):
    df = DummyInput(EVENTS, SCHEMA).read(spark)
    ParquetOutput(str(tmp_path / "pq"), partition_by=["event_type"]).write(df)
    assert os.path.isdir(str(tmp_path / "pq" / "event_type=login"))
    # partition pruning: filtered read touches one partition dir
    pruned = spark.read.parquet(str(tmp_path / "pq")).filter("event_type = 'login'")
    assert pruned.count() == 1

    S3Output(f"file://{tmp_path}/s3bucket", fmt="json").write(df, prefix="events")
    assert spark.read.schema(SCHEMA).json(str(tmp_path / "s3bucket" / "events")).count() == 2


def test_kafka_option_parity():
    """Reference kafka_config keys (security./ssl./sasl./group.) pass
    through with the kafka. prefix; bootstrap.servers is required."""
    src = KafkaInput(
        "b:9092",
        "topic-a",
        kafka_config={
            "bootstrap.servers": "b:9092",
            "group.id": "cg1",
            "security.protocol": "SSL",
            "ssl.ca.location": "/certs/ca.pem",
            "enable.auto.commit": "false",  # consumer-only: not forwarded
        },
    )
    opts = src.options()
    assert opts["kafka.bootstrap.servers"] == "b:9092"
    assert opts["kafka.group.id"] == "cg1"
    assert opts["kafka.security.protocol"] == "SSL"
    assert opts["kafka.ssl.ca.location"] == "/certs/ca.pem"
    assert "kafka.enable.auto.commit" not in opts
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bootstrap.servers"):
        KafkaInput("", "t", kafka_config={"bootstrap.servers": ""})


def test_opensearch_chunking_and_retry(spark, tmp_path):
    """Bulk bodies chunk to message_backlog_size docs; a flaky
    transport is retried max_retries times (reference bulk retry
    semantics)."""
    df = spark.range(7).selectExpr("id AS event_id")

    sink = OpensearchOutput(
        index="i", spool_dir=str(tmp_path / "sp"), message_backlog_size=3
    )
    sink.write_batch(df.coalesce(1), batch_id=0)
    import glob
    import json as _json

    files = sorted(glob.glob(str(tmp_path / "sp" / "*.ndjson")))
    assert len(files) == 3  # 7 docs / 3-doc chunks
    docs = [
        _json.loads(line)
        for f in files
        for line in open(f).read().splitlines()
        if "_index" not in line
    ]
    assert {d["event_id"] for d in docs} == set(range(7))

    # the transport runs in the executor's Python worker process, so
    # attempts are counted via marker files, not shared memory
    marks = str(tmp_path / "attempts")
    os.makedirs(marks, exist_ok=True)

    def flaky(body, _marks=marks):
        import os as _os
        import uuid as _uuid

        n_before = len(_os.listdir(_marks))
        open(_os.path.join(_marks, _uuid.uuid4().hex), "w").close()
        if n_before < 2:
            raise ConnectionError("transient")

    ok = OpensearchOutput(index="i", transport=flaky, max_retries=3)
    ok.write_batch(df.coalesce(1).limit(2), batch_id=1)
    assert len(os.listdir(marks)) == 3  # 2 failures + 1 success


def test_http_input_option_parity(tmp_path):
    """Reference http input Config surface (connector/http/input.py:
    406-540): endpoints routing table, uvicorn_config key validation,
    metadata collection knobs — reference YAML validates unchanged."""
    src = HttpInput(
        str(tmp_path / "spool"),
        "message string",
        endpoints={"/events": "json", "/lines*": "jsonl", "/raw": "plaintext"},
        uvicorn_config={"host": "0.0.0.0", "port": 9000, "workers": 2,
                        "access_log": True, "server_header": False},
        message_backlog_size=15000,
        copy_headers_to_logs=["remote_addr", "url", "User-Agent"],
        metafield_name="@metadata",
    )
    assert src._match_endpoint("/events") == "json"
    assert src._match_endpoint("/lines/sub") == "jsonl"    # wildcard
    import pytest as _pytest

    with _pytest.raises(KeyError):
        src._match_endpoint("/nope")
    with _pytest.raises(ValueError, match="uvicorn_config unknown"):
        HttpInput(str(tmp_path), "message string", uvicorn_config={"app": "x"})
    with _pytest.raises(ValueError, match=r"\^/"):
        HttpInput(str(tmp_path), "message string", endpoints={"events": "json"})
    with _pytest.raises(ValueError, match="type"):
        HttpInput(str(tmp_path), "message string", endpoints={"/e": "xml"})


def test_http_input_receive_spools_and_streams(spark, tmp_path, monkeypatch):
    """receive() parses per endpoint type, enforces per-endpoint auth
    from the credentials file, attaches header metadata, and the spool
    append is visible to the batch/stream reader."""
    import base64 as _b64

    creds = tmp_path / "creds.json"
    creds.write_text(json.dumps({"input": {"endpoints": {
        "/secure": {"username": "u", "password": "p"}}}}))
    monkeypatch.setenv("LOGPREP_CREDENTIALS_FILE", str(creds))

    spool = str(tmp_path / "spool")
    src = HttpInput(
        spool, "message string, `@metadata` map<string,string>",
        endpoints={"/secure": "plaintext", "/bulk": "jsonl"},
    )
    with pytest.raises(PermissionError):
        src.receive("/secure", "hello", headers={})
    ok = "Basic " + _b64.b64encode(b"u:p").decode()
    written = src.receive(
        "/secure", "hello", headers={"Authorization": ok, "User-Agent": "curl"},
        remote_addr="10.0.0.9", url="/secure",
    )
    assert written[0]["message"] == "hello"
    assert written[0]["@metadata"]["user_agent"] == "curl"
    assert written[0]["@metadata"]["remote_addr"] == "10.0.0.9"
    src.receive("/bulk", '{"message": "l1"}\n{"message": "l2"}\n')
    got = spark.read.json(spool)
    assert got.count() == 3
    assert {r.message for r in got.collect()} == {"hello", "l1", "l2"}


def test_http_input_real_server_end_to_end(spark, tmp_path, monkeypatch):
    """serve() runs a real HTTP listener: urllib POSTs hit the
    endpoints (routing, auth, status codes), events land in the spool,
    and the Spark streaming reader picks them up."""
    import base64 as _b64
    import urllib.error
    import urllib.request

    creds = tmp_path / "creds.json"
    creds.write_text(json.dumps({"input": {"endpoints": {
        "/secure": {"username": "u", "password": "p"}}}}))
    monkeypatch.setenv("LOGPREP_CREDENTIALS_FILE", str(creds))

    spool = str(tmp_path / "spool")
    src = HttpInput(
        spool, "message string",
        endpoints={"/events": "json", "/secure": "plaintext"},
        collect_meta=False,
    )
    host, port = src.serve()
    base = f"http://{host}:{port}"

    def post(path, body, headers=None):
        req = urllib.request.Request(
            base + path, data=body.encode(), headers=headers or {}, method="POST")
        with urllib.request.urlopen(req) as resp:
            return resp.status

    try:
        assert post("/events", '{"message": "hi"}') == 200
        ok = "Basic " + _b64.b64encode(b"u:p").decode()
        assert post("/secure", "plain text", {"Authorization": ok}) == 200
        for path, body, hdrs, code in [
            ("/secure", "x", {}, 401),           # missing auth
            ("/nope", "{}", {}, 404),            # unrouted endpoint
            ("/events", "not json", {}, 400),    # malformed body
        ]:
            with pytest.raises(urllib.error.HTTPError) as err:
                post(path, body, hdrs)
            assert err.value.code == code
        with urllib.request.urlopen(base + "/health") as resp:
            assert resp.status == 200

        sdf = src.read_stream(spark)
        q = (sdf.writeStream.format("memory").queryName("http_e2e")
             .trigger(availableNow=True).start())
        q.awaitTermination(60)
        rows = {r.message for r in spark.sql("SELECT * FROM http_e2e").collect()}
        assert rows == {"hi", "plain text"}
    finally:
        src.shutdown()


def test_opensearch_bulk_http_end_to_end(spark):
    """The bulk writer speaks REAL HTTP to a stdlib listener
    implementing the public _bulk protocol: ndjson action/doc pairs,
    per-item statuses, a first-attempt 429 that the chunk retry must
    absorb, and basic-auth headers on every request."""
    import base64
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    state = {"docs": [], "auth": set(), "remaining_429": 1, "requests": 0}
    lock = threading.Lock()

    class BulkHandler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            if self.path != "/_bulk":
                self.send_response(404)
                self.end_headers()
                return
            with lock:
                state["requests"] += 1
                state["auth"].add(self.headers.get("Authorization"))
                if state["remaining_429"] > 0:
                    state["remaining_429"] -= 1
                    self.send_response(429)
                    self.end_headers()
                    return
                lines = body.decode().splitlines()
                items = []
                for action, doc in zip(lines[::2], lines[1::2]):
                    assert _json.loads(action)["index"]["_index"] == "ev-idx"
                    state["docs"].append(_json.loads(doc))
                    items.append({"index": {"status": 201}})
            resp = _json.dumps({"errors": False, "items": items}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), BulkHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}"
        sink = OpensearchOutput(
            index="ev-idx", hosts=[url], message_backlog_size=4,
            max_retries=3, user="u", secret="s",
        )
        df = spark.range(10).selectExpr("id AS event_id", "id * 2 AS v")
        sink.write_batch(df.coalesce(1), batch_id=0)

        assert {d["event_id"] for d in state["docs"]} == set(range(10))
        assert all(d["v"] == d["event_id"] * 2 for d in state["docs"])
        # 10 docs / 4-doc chunks = 3 successful sends + the one 429
        assert state["requests"] == 4
        expected_auth = "Basic " + base64.b64encode(b"u:s").decode()
        assert state["auth"] == {expected_auth}
    finally:
        srv.shutdown()
        srv.server_close()


def test_sigv4_matches_aws_published_vector():
    """The signer reproduces the AWS documentation's SigV4 example
    byte-for-byte (GET iam.amazonaws.com ListUsers, 20150830T123600Z,
    AKIDEXAMPLE) — the strongest no-SDK correctness check available."""
    from logprep_spark.sources.outputs import sigv4_headers

    h = sigv4_headers(
        "GET",
        "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08",
        b"",
        "AKIDEXAMPLE",
        "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        region="us-east-1",
        service="iam",
        amz_date="20150830T123600Z",
        extra_signed_headers={
            "Content-Type": "application/x-www-form-urlencoded; charset=utf-8"
        },
    )
    assert h["Authorization"] == (
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, "
        "SignedHeaders=content-type;host;x-amz-date, "
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
    )


def test_s3_http_put_end_to_end(spark):
    """S3 REST path with zero jars: per-partition ndjson bodies PUT to
    bucket/prefix keys over real HTTP, SigV4-signed; the listener
    recomputes the signature with the (vector-verified) signer and
    rejects mismatches."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from logprep_spark.sources.outputs import S3Output, sigv4_headers

    state, lock = {"objects": {}}, threading.Lock()
    access, secret = "AKTEST", "sekrit"

    class S3Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_PUT(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            want = sigv4_headers(
                "PUT",
                f"http://{self.headers['Host']}{self.path}",
                body,
                access,
                secret,
                amz_date=self.headers["x-amz-date"],
            )["Authorization"]
            if self.headers.get("Authorization") != want:
                self.send_response(403)
                self.end_headers()
                return
            with lock:
                state["objects"][self.path] = body
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), S3Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        sink = S3Output(
            "s3://events-bucket",
            endpoint=f"http://127.0.0.1:{srv.server_port}",
            access_key=access,
            secret_key=secret,
        )
        df = spark.range(6).selectExpr("id AS event_id", "id * 3 AS v").repartition(2)
        sink.write_http(df, prefix="day=2026-08-13", batch_id=1)

        keys = sorted(state["objects"])
        assert len(keys) == 2
        # key segments are URL-encoded exactly once at build time
        # (boto3-style), so hive '=' rides as %3D and the signature
        # covers the same bytes as the wire path
        assert all(k.startswith("/events-bucket/day%3D2026-08-13/part-1-") for k in keys)
        docs = [
            _json.loads(line)
            for body in state["objects"].values()
            for line in body.decode().splitlines()
        ]
        assert {d["event_id"] for d in docs} == set(range(6))
        assert all(d["v"] == d["event_id"] * 3 for d in docs)
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_output_end_to_end(spark):
    """HttpOutput speaks REAL HTTP to a stdlib listener: ndjson bodies
    POSTed to target_url plus the per-row target path (the reference's
    (target, events) tuple routing), basic-auth on every request, and
    a first-attempt 503 absorbed by the chunk retry."""
    import base64
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from logprep_spark.sources import HttpOutput

    state = {"docs": [], "auth": set(), "ctype": set(), "remaining_503": 1,
             "requests": 0}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            with lock:
                state["requests"] += 1
                state["auth"].add(self.headers.get("Authorization"))
                state["ctype"].add(self.headers.get("Content-Type"))
                if state["remaining_503"] > 0:
                    state["remaining_503"] -= 1
                    self.send_response(503)
                    self.end_headers()
                    return
                for line in body.decode().splitlines():
                    state["docs"].append((self.path, _json.loads(line)))
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        sink = HttpOutput(
            f"http://127.0.0.1:{srv.server_port}",
            user="u", password="p", batch_size=4, max_retries=3,
        )
        # tuple-routing: odd ids go to /special, even ids to the root
        df = spark.range(10).selectExpr(
            "id AS event_id",
            "id * 2 AS v",
            "CASE WHEN id % 2 = 1 THEN '/special' END AS _target",
        )
        sink.write_batch(df.coalesce(1), batch_id=0)

        assert {d["event_id"] for _, d in state["docs"]} == set(range(10))
        # routing honored and the _target column stripped from payloads
        for path, d in state["docs"]:
            assert path == ("/special" if d["event_id"] % 2 else "/")
            assert "_target" in d or "_target" not in d  # popped below
            assert "_target" not in d
            assert d["v"] == d["event_id"] * 2
        expected_auth = "Basic " + base64.b64encode(b"u:p").decode()
        assert state["auth"] == {expected_auth}
        assert state["ctype"] == {"application/x-ndjson; charset=utf-8"}
        # 10 rows / 4-row chunks = 3 chunks, each split into <=2 target
        # groups; plus the one absorbed 503
        assert state["requests"] >= 4
    finally:
        srv.shutdown()
        srv.server_close()


def test_idempotent_batch_output_skips_replayed_batch(spark, tmp_path):
    """foreachBatch exactly-once discipline: a replayed batch id is a
    no-op (at-least-once delivery becomes exactly-once output), the
    rename commit never exposes partial files, and distinct batch ids
    append normally."""
    import json as _json
    import os

    from logprep_spark.sources.outputs import IdempotentBatchOutput

    out = IdempotentBatchOutput(str(tmp_path / "sink"))
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    df2 = spark.createDataFrame([(3, "c")], ["id", "v"])

    assert out.write_batch(df1, 0) is True
    assert out.write_batch(df2, 1) is True
    # crash-replay of batch 0 with different data MUST NOT overwrite
    assert out.write_batch(df2, 0) is False
    assert out.committed_batches() == [0, 1]

    def rows_in(batch_id):
        d = os.path.join(str(tmp_path / "sink"), f"batch-{batch_id}")
        rows = []
        for name in os.listdir(d):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as fh:
                    rows += [_json.loads(line) for line in fh if line.strip()]
        return sorted(r["id"] for r in rows)

    assert rows_in(0) == [1, 2]  # original batch-0 data intact
    assert rows_in(1) == [3]

    # streaming e2e: the same sink behind writeStream.foreachBatch
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    (src_dir / "p.jsonl").write_text('{"id": 9, "v": "z"}\n')
    stream = spark.readStream.schema("id long, v string").json(str(src_dir))
    out2 = IdempotentBatchOutput(str(tmp_path / "sink2"))
    q = out2.write_stream(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(60)
    q.stop()
    assert out2.committed_batches() == [0]


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """ParquetOutput(partition_by=day): a day-filtered read must show
    PartitionFilters in the scan and touch only the matching
    directory — the layout decision that turns a 100 TB date-range
    query into a single-partition read."""
    import os

    from pyspark.sql import functions as F

    from logprep_spark.sources.outputs import ParquetOutput

    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 3) + 1:02d}", float(i)) for i in range(30)],
        ["id", "day", "value"],
    )
    out = ParquetOutput(str(tmp_path / "part"), partition_by=["day"])
    out.write(df)
    assert sorted(
        d for d in os.listdir(tmp_path / "part") if d.startswith("day=")
    ) == ["day=2024-01-01", "day=2024-01-02", "day=2024-01-03"]

    rd = spark.read.parquet(str(tmp_path / "part")).filter(F.col("day") == "2024-01-02")
    plan = rd._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.split("\n") if "FileScan" in l)
    assert "PartitionFilters: [isnotnull(day" in scan or "PartitionFilters: [" in scan
    assert "day#" in scan.split("PartitionFilters")[1].split("]")[0]
    assert rd.count() == 10


def test_jsonl_quarantine_split(spark, tmp_path):
    """Parse-level dead-letter: malformed lines quarantine with raw
    text + source file; good lines parse; blank lines are dropped
    from both sides; schema-drifted-but-valid JSON stays on the ok
    side (missing fields null, the PERMISSIVE contract)."""
    from logprep_spark.sources.inputs import JsonlInput

    d = tmp_path / "in"
    d.mkdir()
    (d / "a.jsonl").write_text(
        '{"event_id": 1, "event_type": "login"}\n'
        "\n"
        "{broken json!!\n"
        '{"event_id": 2}\n'
    )
    ok, quarantine = JsonlInput(
        str(d), "event_id long, event_type string"
    ).read_with_quarantine(spark)
    rows = {r.event_id: r for r in ok.collect()}
    assert sorted(rows) == [1, 2]
    assert rows[2].event_type is None  # drifted-but-valid stays ok
    q = quarantine.collect()
    assert len(q) == 1 and q[0].raw.startswith("{broken")
    assert q[0].src_file.endswith("a.jsonl")
