"""Event generator (reference logprep/generator) and metrics
(reference logprep/metrics) — Spark-side behavior."""

import json

from pyspark.sql import functions as F

from logprep_spark.metrics import (
    MetricsListener,
    observe_batch,
    observe_stream,
    progress_metrics,
)
from logprep_spark.sources.generator import EventGenerator

SAMPLES = [
    {"event_type": "login", "severity": 1},
    {"event_type": "logout", "severity": 2},
    {"event_type": "error", "severity": 3},
]


def test_generator_cycles_samples(spark):
    gen = EventGenerator(SAMPLES, events=90, replace_timestamp=False)
    df = gen.generate(spark)
    assert df.count() == 90
    by_type = {
        r.t: r.n
        for r in df.select(F.get_json_object("raw", "$.event_type").alias("t"))
        .groupBy("t").agg(F.count("*").alias("n")).collect()
    }
    assert by_type == {"login": 30, "logout": 30, "error": 30}


def test_generator_shuffle_deterministic_and_distributed(spark):
    gen = EventGenerator(SAMPLES, events=300, shuffle=True, seed=7, target_partitions=8)
    a = gen.generate(spark)
    assert a.rdd.getNumPartitions() == 8
    b = EventGenerator(SAMPLES, events=300, shuffle=True, seed=7).generate(spark)
    assert sorted(map(tuple, a.select("event_index", "raw").collect())) == sorted(
        map(tuple, b.select("event_index", "raw").collect())
    )
    # timestamp manipulation on by default
    gen_ts = EventGenerator(SAMPLES, events=5).generate(spark)
    assert "@timestamp" in gen_ts.columns
    assert gen_ts.filter(F.col("@timestamp").isNull()).count() == 0


def test_generator_stream_rate(spark):
    gen = EventGenerator(SAMPLES, events=0)
    sdf = gen.generate_stream(spark, rows_per_second=50)
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory").queryName("gen_out")
        .trigger(processingTime="1 second").start()
    )
    try:
        # no processAllAvailable(): a rate source produces forever, so
        # "all available" never drains once batches run >= the tick —
        # poll the sink with a deadline instead
        import time

        deadline = time.time() + 20
        while time.time() < deadline:
            if spark.sql("SELECT count(*) n FROM gen_out").first().n > 0:
                break
            time.sleep(0.5)
        rows = spark.sql("SELECT raw FROM gen_out LIMIT 5").collect()
        assert rows and all(json.loads(r.raw)["event_type"] for r in rows)
    finally:
        q.stop()


def test_observe_batch_counts_in_same_pass(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = ev.count()
    df, obs = observe_batch(ev, cond=F.col("event_type") == "click")
    matched = df.filter(F.col("event_type") == "click")  # metrics sit below the filter
    n_out = matched.count()
    got = obs.get
    assert got["n_events"] == total
    assert got["n_matched"] == n_out


def test_observe_stream_progress_and_listener(spark, tmp_path):
    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        d = tmp_path / "obs-in"
        d.mkdir()
        (d / "a.jsonl").write_text(
            "\n".join(json.dumps({"k": i, "event_type": "click" if i % 2 else "other"})
                      for i in range(10)) + "\n"
        )
        sdf = spark.readStream.schema("k long, event_type string").json(str(d))
        observed = observe_stream(sdf, cond=F.col("event_type") == "click")
        q = (
            observed.writeStream.format("memory").queryName("obs_out")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(60)
        got = progress_metrics(q)
        assert got.get("n_events") == 10
        assert got.get("n_matched") == 5
        # listener callbacks arrive async on the listener bus
        import time

        deadline = time.time() + 15
        while time.time() < deadline and listener.totals.get("n_events", 0) < 10:
            time.sleep(0.25)
        assert listener.totals.get("n_events", 0) >= 10
        assert listener.totals.get("n_matched", 0) >= 5
        q.stop()
    finally:
        spark.streams.removeListener(listener)


def test_prometheus_exporter_scrape_text(spark, sf_dir):
    from logprep_spark.metrics import MetricsExporter

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = ev.count()
    df, obs = observe_batch(ev, cond=F.col("event_type") == "error")
    df.filter(F.col("event_type") == "error").count()

    exporter = MetricsExporter()
    exporter.record_observation(obs, component="pre_detector", pipeline="p1")
    exporter.record({"n_events": 5}, component="labeler", pipeline="p1")
    exporter.record({"n_events": 2}, component="labeler", pipeline="p1")  # += merge

    text = exporter.render()
    assert "# TYPE logprep_n_events counter" in text
    assert f'logprep_n_events{{component="pre_detector",pipeline="p1"}} {total}' in text
    assert 'logprep_n_events{component="labeler",pipeline="p1"} 7' in text
    assert "logprep_n_matched" in text


def test_prometheus_exporter_http_endpoint(tmp_path):
    import urllib.request

    from logprep_spark.metrics import MetricsExporter

    exporter = MetricsExporter()
    exporter.record({"n_events": 11, "n_matched": 3}, component="amides")
    host, port = exporter.serve()
    try:
        with urllib.request.urlopen(f"http://{host}:{port}/metrics") as resp:
            body = resp.read().decode()
        assert 'logprep_n_events{component="amides"} 11' in body
        assert resp.headers["Content-Type"].startswith("text/plain")
        with urllib.request.urlopen(f"http://{host}:{port}/health") as resp:
            assert resp.read() == b"OK"
    finally:
        exporter.shutdown()
    out = tmp_path / "metrics.prom"
    exporter.write(str(out))
    assert "logprep_n_matched" in out.read_text()
