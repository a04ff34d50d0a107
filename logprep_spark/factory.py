"""Configuration factory: run a reference-format pipeline config on
Spark.

Reference parity (``logprep/factory.py``, ``logprep/registry.py``,
``logprep/configuration.py``): the same YAML a Logprep deployment uses
— ``pipeline`` as an ordered list of ``{name: {type, rules, ...}}``,
``input``/``output`` connector blocks, rule files (single- or
multi-doc YAML / JSON, inline dicts, or directories of either) —
builds the Spark pipeline directly, so existing rule corpora work
unchanged.
"""

from __future__ import annotations

import json
import os
from typing import Any

from logprep_spark.operators import PROCESSORS, Pipeline
from logprep_spark.operators.base import Processor
from logprep_spark.sources import (
    ConsoleOutput,
    DummyInput,
    DummyOutput,
    FileInput,
    HttpInput,
    HttpOutput,
    JsonInput,
    JsonlInput,
    JsonlOutput,
    KafkaInput,
    KafkaOutput,
    OpensearchOutput,
    S3Output,
)


class ConfigError(ValueError):
    pass


def _read_yaml_or_json(path: str) -> list[dict]:
    """Read one rule/config source by path OR getter URI
    (``file://``/``http(s)://`` via logprep_spark.getter, mirroring the
    reference's GetterFactory-backed loading in util/getter.py)."""
    from logprep_spark.getter import GetterFactory

    raw = GetterFactory.from_string(path).get()
    if path.endswith(".json"):
        data = json.loads(raw)
        return data if isinstance(data, list) else [data]
    import yaml

    docs: list[dict] = []
    for doc in yaml.safe_load_all(raw):
        if doc is None:
            continue
        docs.extend(doc if isinstance(doc, list) else [doc])
    return docs


def load_rules(sources: list[str | dict]) -> list[dict]:
    """Resolve the reference's ``rules:`` list — inline dicts, files,
    directories (recursed, sorted for determinism), or getter URIs."""
    rules: list[dict] = []
    for src in sources:
        if isinstance(src, dict):
            rules.append(src)
            continue
        if "://" in src and not src.startswith("file://"):
            rules.extend(_read_yaml_or_json(src))
            continue
        src = src.removeprefix("file://")
        if os.path.isdir(src):
            for root, _dirs, files in os.walk(src):
                for name in sorted(files):
                    if name.endswith((".yml", ".yaml", ".json")):
                        rules.extend(_read_yaml_or_json(os.path.join(root, name)))
        elif os.path.isfile(src):
            rules.extend(_read_yaml_or_json(src))
        else:
            raise ConfigError(f"rule source not found: {src!r}")
    return rules


def create_processor(name: str, cfg: dict) -> Processor:
    cfg = dict(cfg)
    ptype = cfg.pop("type", name)
    cls = PROCESSORS.get(ptype)
    if cls is None:
        raise ConfigError(
            f"unknown processor type {ptype!r} (component {name!r}); "
            f"known: {sorted(PROCESSORS)}"
        )
    rules = load_rules(cfg.pop("rules", []))
    return cls(rules, **cfg)


_INPUTS: dict[str, Any] = {
    "jsonl_input": lambda cfg: JsonlInput(cfg.pop("documents_path"), cfg.pop("schema", None)),
    "json_input": lambda cfg: JsonInput(cfg.pop("documents_path"), cfg.pop("schema", None)),
    "file_input": lambda cfg: FileInput(cfg.pop("logfile_path")),
    "dummy_input": lambda cfg: DummyInput(cfg.pop("documents", []), cfg.pop("schema", None)),
    "http_input": lambda cfg: HttpInput(cfg.pop("spool_dir"), cfg.pop("schema"), **cfg),
    "confluentkafka_input": lambda cfg: KafkaInput(
        cfg.get("kafka_config", {}).get("bootstrap.servers", "localhost:9092"),
        cfg.pop("topic"),
        cfg.pop("schema", None),
        kafka_config=cfg.pop("kafka_config", {}),
    ),
}

_OUTPUTS: dict[str, Any] = {
    "jsonl_output": lambda cfg: JsonlOutput(cfg.pop("output_file")),
    "console_output": lambda cfg: ConsoleOutput(),
    "dummy_output": lambda cfg: DummyOutput(),
    "http_output": lambda cfg: HttpOutput(
        cfg.pop("target_url"),
        user=cfg.pop("user", ""),
        password=cfg.pop("password", ""),
        timeout=cfg.pop("timeout", 2),
        verify=cfg.pop("verify", True),
        batch_size=cfg.pop("batch_size", 500),
        max_retries=cfg.pop("max_retries", 3),
    ),
    "opensearch_output": lambda cfg: OpensearchOutput(
        cfg.pop("default_index", "logprep"),
        cfg.pop("spool_dir", None),
        hosts=cfg.pop("hosts", None),
        error_index=cfg.pop("error_index", None),
        message_backlog_size=cfg.pop("message_backlog_size", 500),
        timeout=cfg.pop("timeout", 500),
        max_retries=cfg.pop("max_retries", 3) or 0,
        user=cfg.pop("user", None),
        secret=cfg.pop("secret", None),
        ca_cert=cfg.pop("ca_cert", None),
    ),
    "s3_output": lambda cfg: S3Output(cfg.pop("base_uri"), cfg.pop("format", "json")),
    "confluentkafka_output": lambda cfg: KafkaOutput(
        cfg.pop("kafka_config", {}).get("bootstrap.servers", "localhost:9092"),
        cfg.pop("topic"),
    ),
}


def _create_connector(block: dict, registry: dict, kind: str):
    if not block:
        return None
    if len(block) != 1:
        raise ConfigError(f"exactly one {kind} connector expected, got {sorted(block)}")
    (name, cfg), = block.items()
    cfg = dict(cfg)
    ctype = cfg.pop("type", None)
    builder = registry.get(ctype)
    if builder is None:
        raise ConfigError(
            f"unknown {kind} type {ctype!r} (component {name!r}); "
            f"known: {sorted(registry)}"
        )
    return builder(cfg)


class PipelineConfig:
    """Parsed pipeline configuration → ready-to-run components."""

    def __init__(self, config: dict):
        self.version = config.get("version")
        self.processors = [
            create_processor(name, cfg)
            for item in config.get("pipeline", [])
            for name, cfg in item.items()
        ]
        self.input = _create_connector(config.get("input", {}), _INPUTS, "input")
        # reference allows several named outputs; keep them all
        self.outputs = {
            name: _create_connector({name: cfg}, _OUTPUTS, "output")
            for name, cfg in config.get("output", {}).items()
        }
        # `rule_dispatch: true` — the reference's rule-tree posture
        # (its DEFAULT engine; sequential evaluation is its
        # _bypass_rule_tree opt-out) for config-driven pipelines with
        # big rule corpora: bulk/match-once routing per processor
        # (operators/dispatch.py; the sequential chain's pushdown
        # blowup is measured in PLANS/rule_dispatch_probe.md)
        self.pipeline = Pipeline(
            self.processors, dispatch=bool(config.get("rule_dispatch", False))
        )

    @classmethod
    def from_file(cls, path: str) -> "PipelineConfig":
        """Build from a path or getter URI; remembers the source and a
        content hash so :meth:`refresh` can implement the reference's
        reload-on-change semantics (util/configuration.py: version
        stamp + refresh interval — the scheduler loop is the caller's
        concern here, the change detection is this method)."""
        docs = _read_yaml_or_json(path)
        if len(docs) != 1:
            raise ConfigError(f"expected one config document in {path}, got {len(docs)}")
        cfg = cls(docs[0])
        cfg._source = path
        cfg._content_hash = cls._hash_source(path)
        return cfg

    @staticmethod
    def _hash_source(path: str) -> str:
        import hashlib

        from logprep_spark.getter import GetterFactory

        return hashlib.sha256(GetterFactory.from_string(path).get_raw()).hexdigest()

    def refresh(self) -> "PipelineConfig":
        """Reload-on-change: re-read the source; return a NEW config if
        the content changed, else self (cheap no-op)."""
        if getattr(self, "_source", None) is None:
            return self
        if self._hash_source(self._source) == self._content_hash:
            return self
        return PipelineConfig.from_file(self._source)

    def transform(self, df):
        return self.pipeline.transform(df)
