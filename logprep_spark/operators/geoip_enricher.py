"""GeoipEnricher — add geo information for an IP field.

Reference: /root/reference/logprep/processor/geoip_enricher/
processor.py (MaxMind database lookup -> ``geoip`` struct with
type/geometry/properties).

The scale-correct realization is a BINNED broadcast equi-join against
a geo table derived from the MaxMind export (pass ``geo_table`` with
(net_start, net_end) ranges): ranges explode into fixed /16 bins of
the IPv4 space, events hash-join on their single bin, and a residual
BETWEEN keeps exact semantics — a plain inequality join would plan as
BroadcastNestedLoopJoin, O(events × ranges), unusable against the
~3M-range city database. Without a table, a clearly-marked
DETERMINISTIC STUB synthesizes stable coordinates from the IP hash so
schema and plumbing stay real in tests (the MaxMind reader isn't
available here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from logprep_spark import fields as fld
from logprep_spark.operators import ip_utils
from logprep_spark.operators.base import Processor


class GeoipEnricher(Processor):
    rule_type = "geoip_enricher"

    def __init__(
        self,
        rules=None,
        geo_table: DataFrame | None = None,
        geo_table_v6: DataFrame | None = None,
        db_path: str | None = None,
        **kw,
    ):
        """``geo_table``: optional (net_start long, net_end long,
        country string, city string, lat double, lon double).
        ``geo_table_v6``: optional (net_start_hex string, net_end_hex
        string, country, city, lat, lon) with 32-char hex bounds — the
        v6 interval table (ip_utils hex-key encoding).
        ``db_path``: reference config parity (processor.py:54) — a
        MaxMind ``.mmdb`` file, parsed by the pure-Python reader in
        sources/mmdb.py on first use; a v6 database fills BOTH tables
        (v4 from the ::/96 subtree, v6 from the full tree), matching
        the reference's dual-stack geoip2 lookups."""
        super().__init__(rules, **kw)
        self.geo_table = geo_table
        self.geo_table_v6 = geo_table_v6
        self.db_path = db_path
        self._db_loaded = False

    def _resolve_geo_tables(self, df: DataFrame) -> None:
        if self._db_loaded or self.db_path is None:
            return
        self._db_loaded = True
        from logprep_spark.sources.mmdb import MMDBReader, geo_table_from_mmdb

        with open(self.db_path, "rb") as fh:
            ip_version = MMDBReader(fh.read()).ip_version
        spark = df.sparkSession
        if self.geo_table is None:
            self.geo_table = geo_table_from_mmdb(spark, self.db_path, ip_version=4)
        if self.geo_table_v6 is None and ip_version == 6:
            self.geo_table_v6 = geo_table_from_mmdb(spark, self.db_path, ip_version=6)

    def apply_rule(self, df: DataFrame, cond, cfg: dict) -> DataFrame:
        src = fld.get_field(df, cfg["source_fields"][0])
        if src is None:
            return df
        target = cfg.get("target_field", "geoip")
        # reference rule.py customize_target_subfields: rename output
        # subfields ({default_subfield: custom_dotted_path}); honored
        # for the struct keys this enricher emits
        renames = cfg.get("customize_target_subfields") or {}

        def named(default: str):
            return renames.get(default, default).rsplit(".", 1)[-1]

        self._resolve_geo_tables(df)
        if self.geo_table_v6 is not None:
            df = self._join_v6(df, src, cond, target, named)
            src = fld.get_field(df, cfg["source_fields"][0])
            if self.geo_table is None:
                return df
        if self.geo_table is not None:
            ip_long = ip_utils.ipv4_to_long(src)
            # explode each range to the /16 bins it covers (MaxMind
            # ranges are mostly narrower than /16, so the exploded
            # table stays ~1-2x the input and still broadcasts), then
            # equi-join on the event's single bin + residual BETWEEN
            geo = broadcast(
                self.geo_table.withColumn(
                    "_bin",
                    F.explode(
                        F.sequence(
                            F.shiftright("net_start", 16), F.shiftright("net_end", 16)
                        )
                    ),
                )
            )
            df = df.join(
                geo,
                on=(F.shiftright(ip_long, 16) == geo["_bin"])
                & (ip_long >= geo["net_start"])
                & (ip_long <= geo["net_end"]),
                how="left",
            ).drop("_bin")
            struct = F.struct(
                F.lit("Feature").alias(named("type")),
                F.col("country").alias(named("country")),
                F.col("city").alias(named("city")),
                F.array(F.col("lon"), F.col("lat")).alias(named("coordinates")),
            )
            # unmatched IPs stay un-enriched (reference: no DB entry ->
            # no geoip field), not a struct of nulls
            matched = F.col("net_start").isNotNull()
            df = self.set_when(df, target, cond & src.isNotNull() & matched, struct)
            return df.drop("net_start", "net_end", "country", "city", "lat", "lon")
        # STUB: deterministic fake geo from ip hash
        h = F.sha2(src.cast("string"), 256)
        lat = (F.conv(F.substring(h, 1, 6), 16, 10).cast("double") % 18000) / 100.0 - 90.0
        lon = (F.conv(F.substring(h, 7, 6), 16, 10).cast("double") % 36000) / 100.0 - 180.0
        struct = F.struct(
            F.lit("Feature").alias(named("type")),
            F.lit("STUBLAND").alias(named("country")),
            F.concat(F.lit("city-"), F.substring(h, 13, 4)).alias(named("city")),
            F.array(F.round(lon, 2), F.round(lat, 2)).alias(named("coordinates")),
        )
        return self.set_when(df, target, cond & ip_utils.is_ipv4(src), struct)

    def _join_v6(self, df: DataFrame, src, cond, target: str, named) -> DataFrame:
        """v6 interval enrichment: the event's normalized 128-bit hex
        key equi-joins a /24-binned broadcast of the (net_start_hex,
        net_end_hex) ranges, with a residual string-BETWEEN for exact
        bounds — same binned-broadcast shape as the v4 path, lifted to
        hex-string order. /24 bins (first 6 hex chars): real v6 geo
        feeds allocate /16../48, so a range explodes to at most a few
        hundred bins and the broadcast stays small."""
        ip_hex = ip_utils.ipv6_to_hex(src)
        bin_of = lambda c: F.conv(F.substring(c, 1, 6), 16, 10).cast("long")  # noqa: E731
        geo = broadcast(
            self.geo_table_v6.withColumn(
                "_bin6",
                F.explode(
                    F.sequence(bin_of(F.col("net_start_hex")), bin_of(F.col("net_end_hex")))
                ),
            )
        )
        guarded_hex = F.when(ip_utils.is_ipv6(src), ip_hex)
        df = df.join(
            geo,
            on=(bin_of(guarded_hex) == geo["_bin6"])
            & (guarded_hex >= geo["net_start_hex"])
            & (guarded_hex <= geo["net_end_hex"]),
            how="left",
        ).drop("_bin6")
        struct = F.struct(
            F.lit("Feature").alias(named("type")),
            F.col("country").alias(named("country")),
            F.col("city").alias(named("city")),
            F.array(F.col("lon"), F.col("lat")).alias(named("coordinates")),
        )
        matched = F.col("net_start_hex").isNotNull()
        df = self.set_when(df, target, cond & matched, struct)
        return df.drop("net_start_hex", "net_end_hex", "country", "city", "lat", "lon")
