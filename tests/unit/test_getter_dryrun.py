"""Getter URIs, config refresh, rule dry-run, auto rule tests."""

import pytest

from logprep_spark.dryrun import auto_test, dry_run
from logprep_spark.factory import PipelineConfig, load_rules
from logprep_spark.getter import FileGetter, GetterFactory, GetterNotFoundError
from logprep_spark.operators import FieldManager

CONFIG = """
version: "1"
pipeline:
  - my_fm:
      type: field_manager
      rules:
        - filter: "*"
          field_manager:
            source_fields: [user_id]
            target_field: uid
"""


def test_getter_factory_protocols(tmp_path, monkeypatch):
    p = tmp_path / "x.txt"
    p.write_text("hello")
    assert isinstance(GetterFactory.from_string(str(p)), FileGetter)
    assert GetterFactory.from_string(f"file://{p}").get() == "hello"
    # env expansion in targets (reference getter.py)
    monkeypatch.setenv("RULES_HOME", str(tmp_path))
    assert GetterFactory.from_string("file://${RULES_HOME}/x.txt").get() == "hello"
    with pytest.raises(GetterNotFoundError):
        GetterFactory.from_string("ftp://nope/x")
    # http getter is gated without LOGPREP_SPARK_ALLOW_HTTP
    monkeypatch.delenv("LOGPREP_SPARK_ALLOW_HTTP", raising=False)
    with pytest.raises(GetterNotFoundError, match="disabled"):
        GetterFactory.from_string("https://example.invalid/rules.yml").get()


def test_load_rules_via_getter_uri(tmp_path):
    f = tmp_path / "r.yml"
    f.write_text("- filter: '*'\n  labeler: {label: {action: [x]}}\n")
    rules = load_rules([f"file://{f}"])
    assert rules and rules[0]["labeler"]["label"]["action"] == ["x"]


def test_config_refresh_on_change(tmp_path):
    cfg_file = tmp_path / "pipeline.yml"
    cfg_file.write_text(CONFIG)
    cfg = PipelineConfig.from_file(str(cfg_file))
    assert cfg.version == "1"
    assert cfg.refresh() is cfg  # unchanged → same object
    cfg_file.write_text(CONFIG.replace('"1"', '"2"'))
    fresh = cfg.refresh()
    assert fresh is not cfg and fresh.version == "2"


def test_dry_run_diff(spark, tmp_path):
    cfg_file = tmp_path / "pipeline.yml"
    cfg_file.write_text(CONFIG)
    cfg = PipelineConfig.from_file(str(cfg_file))
    df = spark.createDataFrame([(1, 7), (2, 9)], "event_id long, user_id long")
    diff = dry_run(cfg, df)
    rows = diff.collect()
    # field_manager copies user_id → uid: per row one added field
    assert {r.field for r in rows} == {"uid"}
    assert all(r.before is None for r in rows)
    assert sorted(r.after for r in rows) == ['{"v":7}', '{"v":9}']


def test_auto_rule_tester(spark):
    rules = [
        {
            "filter": "*",
            "field_manager": {"source_fields": ["a"], "target_field": "b"},
            "tests": [
                {"raw": {"a": 5}, "processed": {"b": 5}},
                {"raw": {"a": 5}, "processed": {"b": 6}},  # deliberately wrong
            ],
        }
    ]
    results = auto_test(FieldManager, rules, spark)
    assert [r["passed"] for r in results] == [True, False]
    assert results[1]["diff"]["b"] == {"expected": 6, "got": 5}
