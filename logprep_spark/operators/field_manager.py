"""FieldManager — copy / move / merge source fields to a target.

Reference: /root/reference/logprep/processor/field_manager/processor.py
(source_fields -> target_field with delete_source_fields,
overwrite_target, merge_with_target flags; merging list values
concatenates them). Pure column rewires — no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from logprep_spark import fields as fld
from logprep_spark.operators.base import Processor


class FieldManager(Processor):
    rule_type = "field_manager"

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        sources = cfg["source_fields"]
        target = cfg["target_field"]
        cols = [(s, fld.get_field(df, s)) for s in sources]
        present = [(s, c) for s, c in cols if c is not None]
        if not present:
            return df

        if cfg.get("merge_with_target", False) or len(present) > 1:
            # merge: every source value into one array at target
            arrays = []
            for path, col in present:
                dtype = fld.field_type(df.schema, path)
                if isinstance(dtype, T.ArrayType):
                    arrays.append(F.transform(col, lambda v: v.cast("string")))
                else:
                    arrays.append(F.array(col.cast("string")))
            value = F.concat(*arrays)
            existing = fld.get_field(df, target)
            if cfg.get("merge_with_target", False) and existing is not None:
                etype = fld.field_type(df.schema, target)
                base = (
                    F.transform(existing, lambda v: v.cast("string"))
                    if isinstance(etype, T.ArrayType)
                    else F.array(existing.cast("string"))
                )
                value = F.concat(base, value)
            etype = fld.field_type(df.schema, target)
            if existing is not None and not isinstance(etype, T.ArrayType):
                # static schemas can't hold a string on unmatched rows
                # and a list on matched ones: widen unmatched scalars to
                # one-element lists (values preserved, type unified)
                overwrite = cfg.get("overwrite_target", True) or cfg.get(
                    "merge_with_target", False
                )
                keep = F.array(existing.cast("string"))
                out = F.when(cond if overwrite else cond & existing.isNull(), value)
                df = fld.set_field(df, target, out.otherwise(keep))
                return self._delete_sources(df, cfg, present, target)
        else:
            value = present[0][1]

        df = self.set_when(df, target, cond, value, overwrite=cfg.get("overwrite_target", True))
        return self._delete_sources(df, cfg, present, target)

    @staticmethod
    def _delete_sources(df, cfg, present, target):
        if cfg.get("delete_source_fields", False):
            for path, _ in present:
                if path != target:
                    df = fld.delete_field(df, path)
        return df
