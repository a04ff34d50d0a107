"""Dotted-field-path access over DataFrame schemas.

The reference addresses event fields by dotted paths into nested JSON
(``logprep/util/helper.py`` get_dotted_field_value / add_fields_to).
Here an event is a row with (possibly struct-typed) columns, so a
dotted path is a top-level column followed by struct-field steps.
All helpers are schema-aware: a path that does not resolve yields
``None`` (get) or a no-op/False — mirroring the reference's
"missing key" semantics — instead of a Catalyst analysis error.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def split_path(path: str) -> list[str]:
    return path.split(".")


def field_type(schema: T.StructType, path: str) -> T.DataType | None:
    """Resolve the DataType at ``path``, or None if absent."""
    parts = split_path(path)
    current: T.DataType = schema
    for part in parts:
        if not isinstance(current, T.StructType):
            return None
        match = next((f for f in current.fields if f.name == part), None)
        if match is None:
            return None
        current = match.dataType
    return current


def has_field(schema: T.StructType, path: str) -> bool:
    return field_type(schema, path) is not None


def get_field(df_or_schema, path: str) -> Column | None:
    """Column for ``path`` if it resolves in the schema, else None."""
    schema = df_or_schema.schema if isinstance(df_or_schema, DataFrame) else df_or_schema
    if not has_field(schema, path):
        return None
    parts = split_path(path)
    col = F.col(parts[0])
    for part in parts[1:]:
        col = col.getField(part)
    return col


def set_field(df: DataFrame, path: str, value: Column) -> DataFrame:
    """Return df with ``path`` set to ``value``, creating intermediate
    structs as needed. Pure column rewrite — narrow, no shuffle.

    Null propagation mirrors the reference's absent-field model (a
    field is either present or absent, never an empty object):
    - a container created for a null value stays NULL, so a later
      ``container: *`` Exists filter does not match untouched rows;
    - writing a non-null value into a NULL container materializes the
      container (other fields null);
    - an existing non-null container is never nulled by a null write.
    """
    parts = split_path(path)
    top = parts[0]
    if len(parts) == 1:
        return df.withColumn(top, value)
    top_type = field_type(df.schema, top)
    rest = parts[1:]
    if isinstance(top_type, T.StructType):
        base = F.coalesce(F.col(top), _null_struct(top_type))
        updated = _set_in_struct(base, top_type, rest, value)
        guarded = F.when(F.col(top).isNotNull() | value.isNotNull(), updated)
        return df.withColumn(top, guarded)
    # top is absent or non-struct: build a fresh nested struct that is
    # null at every level when the value is null
    return df.withColumn(top, _fresh_nested(rest, value))


def _null_struct(stype: T.StructType) -> Column:
    return F.struct(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in stype.fields]
    )


def _fresh_nested(parts: list[str], value: Column) -> Column:
    nested = value
    for part in reversed(parts):
        nested = F.when(nested.isNotNull(), F.struct(nested.alias(part)))
    return nested


def _set_in_struct(col: Column, stype: T.StructType, parts: list[str], value: Column) -> Column:
    head, tail = parts[0], parts[1:]
    sub = next((f for f in stype.fields if f.name == head), None)
    if not tail:
        return col.withField(head, value)
    if sub is not None and isinstance(sub.dataType, T.StructType):
        inner_base = F.coalesce(col.getField(head), _null_struct(sub.dataType))
        inner = _set_in_struct(inner_base, sub.dataType, tail, value)
        guarded = F.when(col.getField(head).isNotNull() | value.isNotNull(), inner)
        return col.withField(head, guarded)
    return col.withField(head, _fresh_nested(tail, value))


def delete_field(df: DataFrame, path: str) -> DataFrame:
    """Drop ``path`` from the schema; no-op when absent."""
    if not has_field(df.schema, path):
        return df
    parts = split_path(path)
    if len(parts) == 1:
        return df.drop(parts[0])
    top = parts[0]
    return df.withColumn(top, F.col(top).dropFields(".".join(f"`{p}`" for p in parts[1:])))


def copy_field(df: DataFrame, src: str, dst: str) -> DataFrame:
    col = get_field(df, src)
    if col is None:
        return df
    return set_field(df, dst, col)


def move_field(df: DataFrame, src: str, dst: str) -> DataFrame:
    col = get_field(df, src)
    if col is None:
        return df
    return delete_field(set_field(df, dst, col), src)
