"""profile_columns must profile ANY column name.

The r6 ADVICE finding: the unpivot was string-built SQL that
interpolated raw column names, so a name containing a backtick or
quote broke (or silently altered) the generated expressions.  The
rewrite routes every reference through ``df[c]`` + positional
aliases; this locks that in with hostile names and checks the
measures against hand counts.
"""

from __future__ import annotations

from logprep_spark.plans.analytics import profile_columns


def test_hostile_column_names(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("bb", 1, "x"), (None, 2, "x")],
        # backtick, single quote, and dot — each breaks a different
        # quoting scheme in string-built SQL
        ["we`ird", "o'clock", "dot.ted",],
    )
    out = {
        r.col: (r.n_null, r.n_distinct, r.avg_len_milli)
        for r in profile_columns(df).collect()
    }
    assert out["we`ird"] == (1, 2, 1000)  # (1+2)/3 chars
    assert out["o'clock"] == (0, 2, 1000)
    assert out["dot.ted"] == (1, 1, 666)  # 2 chars / 3 rows


def test_all_null_column_reports_zero_len(spark):
    df = spark.createDataFrame([(None,), (None,)], "c: string")
    (row,) = profile_columns(df).collect()
    assert (row.n_null, row.n_distinct, row.avg_len_milli) == (2, 0, 0)
