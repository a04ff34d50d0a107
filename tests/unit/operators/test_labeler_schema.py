"""Labeler schema validation + parent-label expansion (reference
labeling_schema.py:33, processor.py:94, tests/unit/processor/labeler/)."""

import json

import pytest

from logprep_spark.operators.labeler import (
    KeyDoesnotExistInSchemaError,
    Labeler,
    LabelingSchema,
    LabelingSchemaError,
    ValueDoesnotExistInSchemaError,
)

SCHEMA = {
    "reporter": {
        "category": "reporter category",
        "parentlabel": {
            "description": "parentlabel description",
            "windows": {"description": "windows description"},
            "syslog": {"description": "syslog description"},
        },
    },
    "object": {
        "category": "object category",
        "file": {"description": "file description"},
    },
}


def test_schema_extracts_labels_and_parents():
    schema = LabelingSchema.from_dict(SCHEMA)
    assert schema.validate_labels({"reporter": ["windows", "parentlabel"]})
    assert schema.get_parent_labels("reporter", "windows") == ["parentlabel"]
    assert schema.get_parent_labels("reporter", "parentlabel") == []
    assert schema.get_parent_labels("object", "file") == []


def test_schema_rejects_unknown_category_and_label():
    schema = LabelingSchema.from_dict(SCHEMA)
    with pytest.raises(KeyDoesnotExistInSchemaError, match="nope"):
        schema.validate_labels({"nope": ["windows"]})
    with pytest.raises(ValueDoesnotExistInSchemaError, match="linux"):
        schema.validate_labels({"reporter": ["linux"]})


def test_schema_invalid_documents_raise():
    # category without its required "category" marker
    with pytest.raises(LabelingSchemaError, match="valid description"):
        LabelingSchema.from_dict({"reporter": {"x": {"description": "d"}}})
    # category must not carry a description of its own
    with pytest.raises(LabelingSchemaError, match="must not have a description"):
        LabelingSchema.from_dict(
            {"reporter": {"category": "c", "description": "d"}}
        )
    # leaf that is not a description
    with pytest.raises(LabelingSchemaError, match="leaf but not a description"):
        LabelingSchema.from_dict(
            {"reporter": {"category": "c", "a": {"b": "not-a-dict-tree"}}}
        )
    # duplicate label within one category
    with pytest.raises(LabelingSchemaError, match="more than once"):
        LabelingSchema.from_dict(
            {
                "reporter": {
                    "category": "c",
                    "a": {"description": "d", "dup": {"description": "d"}},
                    "b": {"description": "d", "dup": {"description": "d"}},
                }
            }
        )
    # empty / non-dict schema
    with pytest.raises(LabelingSchemaError):
        LabelingSchema.from_dict({})


def test_schema_resolves_local_refs():
    schema = LabelingSchema.from_dict(
        {
            "REFERENCES": {"oses": {"windows": {"description": "win"}}},
            "reporter": {
                "category": "c",
                "parent": {
                    "description": "p",
                    "windows": {"$ref": "#/REFERENCES/oses/windows"},
                },
            },
        }
    )
    assert schema.get_parent_labels("reporter", "windows") == ["parent"]


def test_schema_from_file(tmp_path):
    p = tmp_path / "schema.json"
    p.write_text(json.dumps(SCHEMA))
    assert LabelingSchema.from_file(str(p)).validate_labels({"object": ["file"]})
    with pytest.raises(LabelingSchemaError, match="Not a valid schema file"):
        LabelingSchema.from_file(str(tmp_path / "missing.json"))
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    with pytest.raises(LabelingSchemaError, match="Not a valid schema file"):
        LabelingSchema.from_file(str(bad))


def test_labeler_rule_rejected_by_schema():
    with pytest.raises(ValueDoesnotExistInSchemaError, match="linux"):
        Labeler(
            [{"filter": "*", "labeler": {"label": {"reporter": ["linux"]}}}],
            schema=SCHEMA,
        )
    with pytest.raises(KeyDoesnotExistInSchemaError, match="nope"):
        Labeler(
            [{"filter": "*", "labeler": {"label": {"nope": ["windows"]}}}],
            schema=SCHEMA,
        )


def test_labeler_adds_parent_labels_when_flag_set(spark):
    """Reference test_labeler.py
    test_process_adds_labels_including_parents_when_flag_was_set: the
    rule says 'windows', the event gets ['parentlabel', 'windows']."""
    df = spark.createDataFrame([(1, "yes"), (2, "no")], "id long, applyrule string")
    rules = [{"filter": "applyrule: yes", "labeler": {"label": {"reporter": ["windows"]}}}]

    out = Labeler(rules, schema=SCHEMA, include_parent_labels=True).transform(df)
    rows = {r.id: r for r in out.collect()}
    assert rows[1].label.reporter == ["parentlabel", "windows"]
    assert rows[2].label is None

    # without the flag: only the rule's own label
    out2 = Labeler(
        [dict(r) for r in rules], schema=SCHEMA, include_parent_labels=False
    ).transform(df)
    assert {r.id: r for r in out2.collect()}[1].label.reporter == ["windows"]
