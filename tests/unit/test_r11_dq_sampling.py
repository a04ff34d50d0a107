"""r11 wave: dq_referential_integrity (planted orphans + NULL FKs),
dq_t_closeness (planted skew vs uniform class), and the A-Res
weighted reservoir (heavy weights dominate; key replica exact)."""

from __future__ import annotations

import hashlib
import math
import os
import tempfile

from pyspark.sql import functions as F

from logprep_spark.plans import catalog


def _write(spark, tmp, name, rows, schema):
    spark.createDataFrame(rows, schema).write.parquet(
        os.path.join(tmp, f"{name}.parquet")
    )


def test_referential_integrity_detects_planted_orphans(spark):
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "customer",
               [(1, 0, "AUTOMOBILE", 10.0), (2, 1, "BUILDING", 20.0)],
               "c_custkey long, c_nationkey long, c_mktsegment string,"
               " c_acctbal double")
        _write(spark, tmp, "nation", [(0, "A"), (1, "B")],
               "n_nationkey long, n_name string")
        _write(spark, tmp, "part", [(7, "p")], "p_partkey long, p_name string")
        _write(spark, tmp, "supplier", [(5, "s")],
               "s_suppkey long, s_name string")
        # orders: one valid custkey, one ORPHAN (99), one NULL
        _write(spark, tmp, "orders", [(100, 1), (101, 99), (102, None)],
               "o_orderkey long, o_custkey long")
        # lineitem: orderkey 100 ok, 999 orphan; part/supp ok
        _write(spark, tmp, "lineitem",
               [(100, 7, 5), (999, 7, 5)],
               "l_orderkey long, l_partkey long, l_suppkey long")
        _write(spark, tmp, "events", [(1, 1), (2, 42), (3, None)],
               "event_id long, user_id long")
        out = {
            r["relationship"]: r.asDict()
            for r in catalog.queries()["dq_referential_integrity"](
                spark, tmp
            ).collect()
        }
    r = out["orders.custkey->customer"]
    assert (r["n_child"], r["n_null_fk"], r["n_orphans"]) == (3, 1, 1)
    assert r["orphan_permille"] == 500 and r["ref_ok"] is False
    r = out["lineitem.orderkey->orders"]
    assert r["n_orphans"] == 1 and r["ref_ok"] is False
    r = out["lineitem.partkey->part"]
    assert r["n_orphans"] == 0 and r["ref_ok"] is True
    r = out["events.user_id->customer"]
    assert (r["n_null_fk"], r["n_orphans"]) == (1, 1)


def test_t_closeness_flags_skewed_class(spark):
    # global: bands 0 and 1 evenly split. class (0, SKEW) holds ONLY
    # band 1 (t = EMD = 0.5 -> fails at 0.2); class (1, FAIR) mirrors
    # the global split (EMD = 0 -> passes).
    rows = []
    for i in range(40):
        rows.append((1, "FAIR", 100.0 if i % 2 == 0 else 1500.0))
    for i in range(20):
        rows.append((0, "SKEW", 1500.0))
    for i in range(20):
        rows.append((2, "BAL", 100.0))
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "customer",
               [(i, n, s, b) for i, (n, s, b) in enumerate(rows)],
               "c_custkey long, c_nationkey long, c_mktsegment string,"
               " c_acctbal double")
        out = {
            (r["c_nationkey"], r["c_mktsegment"]): r.asDict()
            for r in catalog.queries()["dq_t_closeness"](
                spark, tmp
            ).collect()
        }
    # global: 40 band-0 (100.0 -> band 0), 40 band-1 (1500.0 -> band 1)
    fair = out[(1, "FAIR")]
    assert fair["emd_milli"] == 0 and fair["t_ok"] is True
    skew = out[(0, "SKEW")]
    # class CDF at band 0 = 0 vs global 0.5 -> EMD 0.5 over range 1
    assert skew["emd_milli"] == 500 and skew["t_ok"] is False
    bal = out[(2, "BAL")]
    assert bal["emd_milli"] == 500 and bal["t_ok"] is False


def test_reservoir_weighted_heavy_docs_dominate(spark):
    # 500 docs of weight 10, 10 docs of weight 100000: A-Res keys
    # ln(u)/w concentrate near 0 for heavy docs -> all 10 heavy docs
    # make the top-100 sample; the key replica is exact.
    rows = []
    for i in range(500):
        rows.append((i, "x", "en", "web", 10))
    for i in range(500, 510):
        rows.append((i, "y", "en", "web", 100000))
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "documents", rows,
               "doc_id long, text string, lang string, source string,"
               " n_chars long")
        got = catalog.queries()["sample_reservoir_weighted"](
            spark, tmp
        ).collect()
    assert len(got) == 100
    sampled = {r["doc_id"] for r in got}
    assert set(range(500, 510)) <= sampled
    # exact key replica for every sampled row
    for r in got:
        h = int(
            hashlib.md5(f"res:{r['doc_id']}".encode()).hexdigest()[:8], 16
        )
        u = (h + 0.5) / 4294967296.0
        expect = round(1e9 * math.log(u) / max(r["weight"], 1))
        # engines round half away from zero; keys are never exact .5
        # in practice, but compare within 1 nano to stay honest
        assert abs(r["key_nano"] - expect) <= 1
    # ranks are the exact descending key order
    ranks = sorted(got, key=lambda r: r["rank"])
    keys = [r["key_nano"] for r in ranks]
    assert keys == sorted(keys, reverse=True)


def test_dup_density_planted_clone(spark):
    # doc 2 is a verbatim clone of doc 1 (every window shared = 1000
    # permille); doc 3 shares its first 13-token window with doc 1
    # only; doc 4 is fully unique.
    w = " ".join(f"tok{i}" for i in range(30))
    first13 = " ".join(f"tok{i}" for i in range(13))
    rows = [
        (1, w, "en", "web", len(w)),
        (2, w, "en", "web", len(w)),
        (3, first13 + " " + " ".join(f"zzz{i}" for i in range(17)),
         "en", "web", 10),
        (4, " ".join(f"unique{i}" for i in range(30)), "en", "web", 10),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        _write(spark, tmp, "documents", rows,
               "doc_id long, text string, lang string, source string,"
               " n_chars long")
        out = {
            r["doc_id"]: r.asDict()
            for r in catalog.queries()["corpus_dup_density"](
                spark, tmp
            ).collect()
        }
    assert out[1]["dup_permille"] == 1000
    assert out[2]["dup_permille"] == 1000
    # doc 3: 18 windows, exactly 1 shared (the planted first window)
    assert out[3]["n_windows"] == 18 and out[3]["n_shared"] == 1
    assert out[4]["dup_permille"] == 0
    assert out[1]["n_docs"] == 4
