"""MaxMind DB binary-format reader (public spec) + GeoipEnricher
integration: a spec-valid fixture database is built byte-for-byte by
MMDBWriter, parsed back by MMDBReader, and fed through the binned
broadcast geo join."""

import pytest

from logprep_spark.sources.mmdb import (
    MMDBError,
    MMDBReader,
    MMDBWriter,
    _Decoder,
    geo_table_from_mmdb,
)


def _city(iso, name, lat, lon):
    return {
        "country": {"iso_code": iso, "names": {"en": iso}},
        "city": {"names": {"en": name}},
        "location": {"latitude": lat, "longitude": lon},
    }


@pytest.fixture(scope="module")
def mmdb_bytes():
    w = MMDBWriter()
    w.insert("10.0.0.0/8", _city("DE", "Berlin", 52.52, 13.405))
    w.insert("192.168.0.0/16", _city("FR", "Paris", 48.8566, 2.3522))
    w.insert("203.0.113.0/24", _city("US", "Austin", 30.2672, -97.7431))
    return w.tobytes()


def test_metadata_and_networks(mmdb_bytes):
    r = MMDBReader(mmdb_bytes)
    assert r.metadata["binary_format_major_version"] == 2
    assert r.record_size == 24 and r.ip_version == 4
    nets = {(p, l): d for p, l, d in r.networks()}
    assert set(nets) == {
        (10 << 24, 8),
        ((192 << 24) | (168 << 16), 16),
        ((203 << 24) | (0 << 16) | (113 << 8), 24),
    }
    assert nets[(10 << 24, 8)]["city"]["names"]["en"] == "Berlin"
    assert nets[(10 << 24, 8)]["location"]["latitude"] == 52.52


def test_interval_rows_flatten(mmdb_bytes):
    rows = {row["country"]: row for row in MMDBReader(mmdb_bytes).interval_rows()}
    de = rows["DE"]
    assert de["net_start"] == 10 << 24
    assert de["net_end"] == (11 << 24) - 1
    assert de["city"] == "Berlin" and de["lat"] == 52.52 and de["lon"] == 13.405
    us = rows["US"]
    assert us["net_end"] - us["net_start"] == 255


def test_decoder_value_types():
    """Spot-check the value decoder against hand-assembled spec bytes:
    pointer (ss=0), uint16, float, bool, array."""
    # data section: a string at offset 0, then an array referencing it
    # via a 2-byte pointer (ss=0, value=0)
    data = b"\x43abc"  # string size 3
    arr = b"\x01\x04" + b"\x20\x00"  # extended array (11-7=4) size 1 + pointer->0
    buf = data + arr
    dec = _Decoder(buf, 0)
    value, _ = dec.decode(len(data))
    assert value == ["abc"]
    # uint16 0x1234
    v, _ = _Decoder(b"\xa2\x12\x34", 0).decode(0)
    assert v == 0x1234
    # float 1.5 (extended type 15, size 4)
    import struct as _s

    v, _ = _Decoder(b"\x04\x08" + _s.pack(">f", 1.5), 0).decode(0)
    assert v == 1.5
    # bools: extended type 14, size carries the value
    assert _Decoder(b"\x01\x07", 0).decode(0)[0] is True
    assert _Decoder(b"\x00\x07", 0).decode(0)[0] is False


def test_28bit_records_parse():
    """Hand-build a 2-node 28-bit tree: root's 0-side -> node 1,
    node 1's 1-side -> data record; verifies the middle-byte nibble
    packing."""
    node_count = 2
    data = b"\x41x"  # string "x"
    data_record = node_count + 16 + 0

    def pack28(left, right):
        return (
            left.to_bytes(3, "big")
            + bytes([((left >> 24) << 4) | (right >> 24)])
            + (right & 0xFFFFFF).to_bytes(3, "big")
        )

    tree = pack28(1, node_count) + pack28(node_count, data_record)
    meta = {
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "node_count": node_count,
        "record_size": 28,
        "ip_version": 4,
        "database_type": "t",
        "languages": ["en"],
        "description": {"en": "d"},
    }
    from logprep_spark.sources.mmdb import _METADATA_MARKER, _encode_value

    blob = tree + b"\x00" * 16 + data + _METADATA_MARKER + _encode_value(meta)
    r = MMDBReader(blob)
    assert [(p, l, d) for p, l, d in r.networks()] == [(1 << 30, 2, "x")]


def test_bad_payloads_raise():
    with pytest.raises(MMDBError):
        MMDBReader(b"not an mmdb at all")
    w = MMDBWriter()
    w.insert("10.0.0.0/8", {"a": "b"})
    with pytest.raises(MMDBError, match="overlapping"):
        w.insert("10.1.0.0/16", {"c": "d"})
        w.tobytes()


def test_geoip_enricher_from_mmdb(spark, tmp_path, mmdb_bytes):
    """End-to-end: mmdb file -> interval DataFrame -> binned broadcast
    equi-join enrichment, same join shape as proc_geoip_table."""
    from logprep_spark.operators.geoip_enricher import GeoipEnricher

    path = tmp_path / "test.mmdb"
    path.write_bytes(mmdb_bytes)
    geo = geo_table_from_mmdb(spark, str(path))
    assert geo.count() == 3

    events = spark.createDataFrame(
        [(1, "10.1.2.3"), (2, "192.168.7.9"), (3, "203.0.113.77"), (4, "8.8.8.8")],
        "id long, client_ip string",
    )
    out = GeoipEnricher(
        [{"filter": "*", "geoip_enricher": {"source_fields": ["client_ip"]}}],
        geo_table=geo,
    ).transform(events)
    rows = {r.id: r for r in out.collect()}
    assert rows[1].geoip.country == "DE" and rows[1].geoip.city == "Berlin"
    assert rows[2].geoip.country == "FR"
    assert rows[3].geoip.country == "US"
    assert rows[4].geoip is None  # no DB entry -> un-enriched


def test_geoip_enricher_db_path_config(spark, tmp_path, mmdb_bytes):
    """Reference config parity: db_path loads the mmdb lazily."""
    from logprep_spark.operators.geoip_enricher import GeoipEnricher

    path = tmp_path / "cfg.mmdb"
    path.write_bytes(mmdb_bytes)
    events = spark.createDataFrame([(1, "10.9.9.9")], "id long, client_ip string")
    out = GeoipEnricher(
        [{"filter": "*", "geoip_enricher": {"source_fields": ["client_ip"]}}],
        db_path=str(path),
    ).transform(events)
    assert out.first().geoip.country == "DE"


@pytest.fixture(scope="module")
def mmdb_v6_bytes():
    """Dual-stack v6 tree: v6 networks at full width plus v4 networks
    lifted to ::/96 (the MaxMind storage convention)."""
    w = MMDBWriter(ip_version=6)
    w.insert("2001:db8::/48", _city("DE", "Berlin", 52.52, 13.405))
    w.insert("2001:db8:8::/45", _city("FR", "Paris", 48.8566, 2.3522))
    w.insert("fd00::/8", _city("XX", "ula", 0.0, 0.0))
    w.insert("10.0.0.0/8", _city("US", "Austin", 30.2672, -97.7431))
    return w.tobytes()


def test_v6_networks_roundtrip(mmdb_v6_bytes):
    r = MMDBReader(mmdb_v6_bytes)
    assert r.ip_version == 6
    # full-width walk sees all four networks
    nets = {(p, l): d for p, l, d in r.networks_v6()}
    assert (0x20010DB8 << 96, 48) in nets
    assert (0x20010DB80008 << 80, 45) in nets
    assert (0xFD << 120, 8) in nets
    assert (10 << 24, 96 + 8) in nets  # v4 under ::/96
    assert nets[(0x20010DB8 << 96, 48)]["city"]["names"]["en"] == "Berlin"
    # the v4 walk of the same tree finds exactly the v4 network
    v4 = {(p, l) for p, l, _ in r.networks()}
    assert v4 == {(10 << 24, 8)}


def test_v6_interval_rows_hex_bounds(mmdb_v6_bytes):
    rows = {row["country"]: row for row in MMDBReader(mmdb_v6_bytes).interval_rows_v6()}
    de = rows["DE"]
    assert de["net_start_hex"] == "20010db8000000000000000000000000"
    assert de["net_end_hex"] == "20010db80000ffffffffffffffffffff"
    assert de["city"] == "Berlin"
    assert rows["FR"]["net_end_hex"] == "20010db8000fffffffffffffffffffff"
    # every bound is 32 lowercase hex chars (lexicographic == numeric)
    for row in rows.values():
        assert len(row["net_start_hex"]) == len(row["net_end_hex"]) == 32


def test_geoip_enricher_v6_db_path_dual_stack(spark, tmp_path, mmdb_v6_bytes):
    """A v6 mmdb via db_path fills BOTH interval tables: v4 events hit
    the ::/96 subtree ranges, v6 events the full-width ranges, each
    through its own binned broadcast join."""
    from logprep_spark.operators.geoip_enricher import GeoipEnricher

    path = tmp_path / "dual.mmdb"
    path.write_bytes(mmdb_v6_bytes)
    events = spark.createDataFrame(
        [
            (1, "2001:db8::1"),
            (2, "2001:db8:c:5::9"),
            (3, "fd12:3456::1"),
            (4, "10.1.2.3"),
            (5, "2001:db9::1"),
            (6, "8.8.8.8"),
        ],
        "id long, client_ip string",
    )
    out = GeoipEnricher(
        [{"filter": "*", "geoip_enricher": {"source_fields": ["client_ip"]}}],
        db_path=str(path),
    ).transform(events)
    rows = {r.id: r for r in out.collect()}
    assert rows[1].geoip.country == "DE" and rows[1].geoip.city == "Berlin"
    assert rows[2].geoip.country == "FR"
    assert rows[3].geoip.country == "XX"
    assert rows[4].geoip.country == "US"
    assert rows[5].geoip is None
    assert rows[6].geoip is None
