from pyspark.sql import functions as F

from logprep_spark import fields


def make_df(spark):
    return spark.createDataFrame(
        [(1, ("a", 2))], "id int, nested struct<name:string, depth:int>"
    )


def test_get_field(spark):
    df = make_df(spark)
    assert df.select(fields.get_field(df, "nested.name").alias("v")).first().v == "a"
    assert fields.get_field(df, "nested.missing") is None
    assert fields.get_field(df, "missing.x") is None


def test_set_field_nested_create(spark):
    df = make_df(spark)
    out = fields.set_field(df, "extra.sub.val", F.lit(5))
    row = out.first()
    assert row.extra.sub.val == 5
    # existing struct gets withField, not replaced
    out2 = fields.set_field(df, "nested.depth", F.lit(99))
    assert out2.first().nested.depth == 99
    assert out2.first().nested.name == "a"


def test_delete_and_move(spark):
    df = make_df(spark)
    out = fields.delete_field(df, "nested.name")
    assert "name" not in out.schema["nested"].dataType.fieldNames()
    out = fields.delete_field(df, "not.there")
    assert out is df
    moved = fields.move_field(df, "nested.depth", "depth_top")
    assert moved.first().depth_top == 2
    assert "depth" not in moved.schema["nested"].dataType.fieldNames()
