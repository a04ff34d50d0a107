"""Factory tests: a reference-format YAML config (pipeline + rule
files + connectors) builds and runs end-to-end on Spark."""

import json

import pytest

from logprep_spark.factory import ConfigError, PipelineConfig, load_rules

CONFIG_YML = """\
version: 1
process_count: 3

pipeline:
  - dissectorname:
      type: dissector
      rules:
        - {rules_dir}/dissector
  - calculatorname:
      type: calculator
      rules:
        - filter: "message"
          calculator:
            calc: "${{num}} * 2"
            target_field: doubled
  - droppername:
      type: dropper
      rules:
        - {rules_dir}/dropper/drop.json

input:
  my_in:
    type: jsonl_input
    documents_path: {events_path}
    schema: "message string, num long"
output:
  my_out:
    type: jsonl_output
    output_file: {out_dir}
  spool:
    type: opensearch_output
    default_index: events
"""

DISSECT_RULE = """\
filter: message
dissector:
  mapping:
    message: "%{a} %{b}"
"""


@pytest.fixture()
def config_path(tmp_path):
    (tmp_path / "rules" / "dissector").mkdir(parents=True)
    (tmp_path / "rules" / "dropper").mkdir(parents=True)
    (tmp_path / "rules" / "dissector" / "rule1.yml").write_text(DISSECT_RULE)
    (tmp_path / "rules" / "dropper" / "drop.json").write_text(
        json.dumps({"filter": "*", "dropper": {"drop": ["num"]}})
    )
    events = tmp_path / "events.jsonl"
    events.write_text(
        "\n".join(
            json.dumps(e)
            for e in [
                {"message": "hello world", "num": 21},
                {"message": "foo bar", "num": 4},
            ]
        )
        + "\n"
    )
    cfg = tmp_path / "pipeline.yml"
    cfg.write_text(
        CONFIG_YML.format(
            rules_dir=tmp_path / "rules",
            events_path=events,
            out_dir=tmp_path / "out",
        )
    )
    return str(cfg)


def test_reference_format_config_runs(spark, config_path, tmp_path):
    pc = PipelineConfig.from_file(config_path)
    assert pc.version == 1
    assert [type(p).__name__ for p in pc.processors] == [
        "Dissector", "Calculator", "Dropper",
    ]
    df = pc.input.read(spark)
    out = pc.transform(df)
    rows = {r.a: r.asDict(recursive=True) for r in out.collect()}
    assert rows["hello"]["b"] == "world"
    assert rows["hello"]["doubled"] == 42.0
    assert "num" not in rows["hello"]  # dropper removed it

    pc.outputs["my_out"].write(out)
    back = spark.read.json(str(tmp_path / "out"))
    assert back.count() == 2
    assert pc.outputs["spool"].index == "events"


def test_multi_doc_rule_file(tmp_path):
    f = tmp_path / "rules.yml"
    f.write_text("filter: a\ndropper:\n  drop: [x]\n---\nfilter: b\ndropper:\n  drop: [y]\n")
    assert [r["filter"] for r in load_rules([str(f)])] == ["a", "b"]


def test_unknown_processor_type_lists_known(config_path):
    with pytest.raises(ConfigError) as exc:
        PipelineConfig({"pipeline": [{"x": {"type": "nope", "rules": []}}]})
    assert "unknown processor type" in str(exc.value)
    assert "calculator" in str(exc.value)


def test_missing_rule_file_errors():
    with pytest.raises(ConfigError, match="rule source not found"):
        load_rules(["/nonexistent/rules/dir"])


import os as _os

import pytest as _pytest


@_pytest.mark.skipif(
    not _os.path.isdir("/root/reference/tests/testdata/unit/grokker/rules"),
    reason="reference rule corpus not present",
)
def test_reference_grokker_rule_corpus_loads_unchanged(spark):
    """A reference user's grokker rule dir loads VERBATIM through the
    factory rule loader and executes (the switch-over scenario: no
    rewriting of the existing rule corpus)."""
    from logprep_spark.factory import load_rules
    from logprep_spark.operators import Grokker

    rules = load_rules(["/root/reference/tests/testdata/unit/grokker/rules"])
    assert rules, "corpus empty?"
    proc = Grokker(rules)
    df = spark.createDataFrame(
        [("user alice logged in", "bob")], "message string, message1 string"
    )
    out = proc.transform(df).first()
    assert out.user == "alice"


def test_rule_dispatch_flag_routes_pipeline(spark):
    from pyspark.sql import functions as F

    cfg = {
        "rule_dispatch": True,
        "pipeline": [
            {
                "labeler": {
                    "type": "labeler",
                    "rules": [
                        {
                            "filter": "event_type:error",
                            "labeler": {"label": {"action": ["alert"]}},
                        },
                        {
                            "filter": "event_type:signup",
                            "labeler": {"label": {"action": ["growth"]}},
                        },
                    ],
                }
            }
        ],
    }
    pc = PipelineConfig(cfg)
    assert pc.pipeline.dispatch is True
    df = spark.createDataFrame(
        [(1, "error"), (2, "signup"), (3, "view")],
        "event_id long, event_type string",
    )
    out = {
        r["event_id"]: (r["label"]["action"] if r["label"] else None)
        for r in pc.pipeline.transform(df).collect()
    }
    assert out == {1: ["alert"], 2: ["growth"], 3: None}
    # default stays sequential (the reference's bypass posture is our
    # compat default; flipping it is a config line)
    assert PipelineConfig({"pipeline": []}).pipeline.dispatch is False
