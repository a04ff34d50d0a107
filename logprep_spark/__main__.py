"""Command-line entrypoint: ``python -m logprep_spark ...``.

Reference parity: /root/reference/logprep/run_logprep.py (click group
with ``run``, ``test config``, ``test dry-run``, ``test unit``,
``print``). Implemented with stdlib argparse — same command surface,
no extra dependency.

    python -m logprep_spark run CONFIG [--stream] [--limit N]
    python -m logprep_spark test config CONFIG [CONFIG...]
    python -m logprep_spark test dry-run CONFIG EVENTS.jsonl
    python -m logprep_spark test unit CONFIG
    python -m logprep_spark print CONFIG [--output-format json|yaml]

``run`` executes input → pipeline → output(s) on a SparkSession from
``session.get_spark`` — batch via connector ``.read``/``.write``,
streaming via ``--stream`` (``read_stream``/``write_stream``).
"""

from __future__ import annotations

import argparse
import json
import sys

from logprep_spark.factory import ConfigError, PipelineConfig, _read_yaml_or_json


def _load(path: str) -> PipelineConfig:
    return PipelineConfig.from_file(path)


def cmd_run(args) -> int:
    from logprep_spark.session import get_spark

    config = _load(args.config)
    spark = get_spark("logprep-spark-run")
    if args.stream:
        source = config.input.read_stream(spark)
        result = config.transform(source)
        import inspect

        def _takes_checkpoint(fn) -> bool:
            try:
                return "checkpoint" in inspect.signature(fn).parameters
            except (TypeError, ValueError):  # C-implemented / unintrospectable
                return False

        queries = [
            out.write_stream(result, checkpoint=f"{args.checkpoint}/{name}")
            if _takes_checkpoint(out.write_stream)
            else out.write_stream(result)
            for name, out in config.outputs.items()
        ]
        for q in queries:
            q.awaitTermination()
        return 0
    source = config.input.read(spark)
    if args.limit:
        source = source.limit(args.limit)
    result = config.transform(source)
    if not config.outputs:
        print(json.dumps({"rows": result.count()}))
        return 0
    for out in config.outputs.values():
        out.write(result)
    return 0


def cmd_test_config(args) -> int:
    """Reference ``test config``: construct every component; report per
    file (run_logprep.py:116-127)."""
    failures = 0
    for path in args.configs:
        try:
            config = _load(path)
            n_rules = sum(len(p.rules) for p in config.processors)
            print(
                f"OK    {path}: {len(config.processors)} processors, "
                f"{n_rules} rules, {len(config.outputs)} outputs"
            )
        except (ConfigError, OSError, ValueError) as exc:
            failures += 1
            print(f"FAIL  {path}: {exc}")
    return 1 if failures else 0


def cmd_test_dry_run(args) -> int:
    """Reference ``test dry-run``: process sample events, print what
    every rule changed (util/rule_dry_runner.py intent)."""
    from logprep_spark.dryrun import dry_run
    from logprep_spark.session import get_spark
    from logprep_spark.sources.inputs import JsonlInput

    config = _load(args.config)
    spark = get_spark("logprep-spark-dryrun")
    df = JsonlInput(args.events).read(spark)
    diffs = dry_run(config, df).collect()
    for row in diffs:
        print(
            json.dumps(
                {
                    "row_id": row.row_id,
                    "field": row.field,
                    "before": row.before,
                    "after": row.after,
                }
            )
        )
    print(f"# {len(diffs)} field changes", file=sys.stderr)
    return 0


def cmd_test_unit(args) -> int:
    """Reference ``test unit``: run the ``tests:`` specs embedded in
    rule files (auto_rule_tester intent)."""
    from logprep_spark.dryrun import auto_test
    from logprep_spark.factory import load_rules
    from logprep_spark.operators import PROCESSORS
    from logprep_spark.session import get_spark

    docs = _read_yaml_or_json(args.config)
    spark = get_spark("logprep-spark-autotest")
    failures = total = 0
    for item in docs[0].get("pipeline", []):
        for name, cfg in item.items():
            ptype = cfg.get("type", name)
            rules = load_rules(cfg.get("rules", []))
            results = auto_test(PROCESSORS[ptype], rules, spark)
            for res in results:
                total += 1
                status = "PASS" if res["passed"] else "FAIL"
                line = f"{status}  {name} rule#{res['rule_index']} test#{res['test_index']}"
                if not res["passed"]:
                    failures += 1
                    line += f" {json.dumps(res['diff'])}"
                print(line)
    print(f"# {total - failures}/{total} rule tests passed", file=sys.stderr)
    return 1 if failures else 0


def cmd_print(args) -> int:
    """Reference ``print``: emit the effective configuration
    (run_logprep.py:161-173)."""
    docs = _read_yaml_or_json(args.config)
    if args.output_format == "json":
        print(json.dumps(docs[0], indent=2, default=str))
    else:
        try:
            import yaml

            print(yaml.safe_dump(docs[0], sort_keys=False))
        except ImportError:
            print(json.dumps(docs[0], indent=2, default=str))
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="logprep_spark")
    sub = parser.add_subparsers(dest="command", required=True)

    run = sub.add_parser("run", help="run a pipeline configuration")
    run.add_argument("config")
    run.add_argument("--stream", action="store_true", help="structured streaming mode")
    run.add_argument("--limit", type=int, default=0, help="cap batch input rows")
    run.add_argument("--checkpoint", default="/tmp/logprep-spark-ckpt")
    run.set_defaults(fn=cmd_run)

    test = sub.add_parser("test", help="test a configuration")
    test_sub = test.add_subparsers(dest="test_command", required=True)

    tc = test_sub.add_parser("config", help="validate configuration files")
    tc.add_argument("configs", nargs="+")
    tc.set_defaults(fn=cmd_test_config)

    td = test_sub.add_parser("dry-run", help="diff a config against sample events")
    td.add_argument("config")
    td.add_argument("events")
    td.set_defaults(fn=cmd_test_dry_run)

    tu = test_sub.add_parser("unit", help="run tests embedded in rule files")
    tu.add_argument("config")
    tu.set_defaults(fn=cmd_test_unit)

    pr = sub.add_parser("print", help="print the effective configuration")
    pr.add_argument("config")
    pr.add_argument("--output-format", choices=("json", "yaml"), default="yaml")
    pr.set_defaults(fn=cmd_print)
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
