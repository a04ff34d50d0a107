"""Pure-Python MaxMind DB (.mmdb) reader — public binary format.

Reference intent: /root/reference/logprep/processor/geoip_enricher/
processor.py reads city databases through the geoip2 package; that
package isn't in this container, and the FORMAT is public
(the MaxMind DB File Format Specification, also implemented by the
open-source ``maxminddb`` readers). This module parses it directly:

- metadata section (marker ``\\xab\\xcd\\xefMaxMind.com`` near EOF,
  then one encoded map: node_count, record_size, ip_version, ...),
- the binary search tree (24/28/32-bit records, one node per bit of
  the address), and
- the data section (type-tagged values: strings, doubles, maps,
  arrays, pointers, ...).

:func:`MMDBReader.networks` enumerates every routed prefix with its
decoded record; :func:`geo_table_from_mmdb` flattens that into the
(net_start, net_end, country, city, lat, lon) interval table the
binned broadcast equi-join in ``GeoipEnricher`` consumes — the mmdb
is a broadcast-scale dimension (city DB ~3M ranges), so parsing on
the driver and broadcasting the frame is the correct 100 TB shape;
events never touch Python.

:class:`MMDBWriter` builds a minimal valid database (24-bit records,
IPv4) so tests can round-trip real bytes without shipping a MaxMind
artifact in-repo.
"""

from __future__ import annotations

import struct
from typing import Iterator

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"

# type codes from the spec
_T_EXTENDED, _T_POINTER, _T_STRING, _T_DOUBLE, _T_BYTES = 0, 1, 2, 3, 4
_T_UINT16, _T_UINT32, _T_MAP = 5, 6, 7
_T_INT32, _T_UINT64, _T_UINT128, _T_ARRAY = 8, 9, 10, 11
_T_BOOL, _T_FLOAT = 14, 15


class MMDBError(ValueError):
    """Malformed or unsupported .mmdb payload."""


class _Decoder:
    """Decode type-tagged values; pointers resolve relative to
    ``base`` (the data section start), per spec."""

    def __init__(self, buf: bytes, base: int):
        self.buf = buf
        self.base = base

    def decode(self, offset: int):
        buf = self.buf
        ctrl = buf[offset]
        offset += 1
        typ = ctrl >> 5
        if typ == _T_EXTENDED:
            typ = 7 + buf[offset]
            offset += 1
        if typ == _T_POINTER:
            ss = (ctrl >> 3) & 0x3
            v = ctrl & 0x7
            if ss == 0:
                ptr = (v << 8) | buf[offset]
                offset += 1
            elif ss == 1:
                ptr = ((v << 16) | (buf[offset] << 8) | buf[offset + 1]) + 2048
                offset += 2
            elif ss == 2:
                ptr = (
                    (v << 24) | (buf[offset] << 16) | (buf[offset + 1] << 8) | buf[offset + 2]
                ) + 526336
                offset += 3
            else:
                ptr = struct.unpack_from(">I", buf, offset)[0]
                offset += 4
            value, _ = self.decode(self.base + ptr)
            return value, offset
        size = ctrl & 0x1F
        if size == 29:
            size = 29 + buf[offset]
            offset += 1
        elif size == 30:
            size = 285 + struct.unpack_from(">H", buf, offset)[0]
            offset += 2
        elif size == 31:
            size = 65821 + int.from_bytes(buf[offset : offset + 3], "big")
            offset += 3
        if typ == _T_STRING:
            return buf[offset : offset + size].decode("utf-8"), offset + size
        if typ == _T_BYTES:
            return bytes(buf[offset : offset + size]), offset + size
        if typ == _T_DOUBLE:
            if size != 8:
                raise MMDBError("double must be 8 bytes")
            return struct.unpack_from(">d", buf, offset)[0], offset + 8
        if typ == _T_FLOAT:
            if size != 4:
                raise MMDBError("float must be 4 bytes")
            return struct.unpack_from(">f", buf, offset)[0], offset + 4
        if typ in (_T_UINT16, _T_UINT32, _T_UINT64, _T_UINT128):
            return int.from_bytes(buf[offset : offset + size], "big"), offset + size
        if typ == _T_INT32:
            return int.from_bytes(buf[offset : offset + size], "big", signed=True), offset + size
        if typ == _T_BOOL:
            return bool(size), offset
        if typ == _T_MAP:
            out = {}
            for _ in range(size):
                key, offset = self.decode(offset)
                out[key], offset = self.decode(offset)
            return out, offset
        if typ == _T_ARRAY:
            items = []
            for _ in range(size):
                item, offset = self.decode(offset)
                items.append(item)
            return items, offset
        raise MMDBError(f"unsupported type code {typ}")


class MMDBReader:
    def __init__(self, payload: bytes):
        self.buf = payload
        marker_at = payload.rfind(_METADATA_MARKER)
        if marker_at < 0:
            raise MMDBError("no MaxMind metadata marker")
        meta_dec = _Decoder(payload, 0)
        self.metadata, _ = meta_dec.decode(marker_at + len(_METADATA_MARKER))
        self.node_count = int(self.metadata["node_count"])
        self.record_size = int(self.metadata["record_size"])
        self.ip_version = int(self.metadata.get("ip_version", 4))
        if self.record_size not in (24, 28, 32):
            raise MMDBError(f"record_size {self.record_size} invalid")
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        self.data_start = self.tree_size + 16  # 16-byte zero separator
        self._data = _Decoder(payload, self.data_start)

    def _record(self, node: int, side: int) -> int:
        base = node * self.node_bytes
        buf = self.buf
        if self.record_size == 24:
            o = base + 3 * side
            return int.from_bytes(buf[o : o + 3], "big")
        if self.record_size == 32:
            o = base + 4 * side
            return int.from_bytes(buf[o : o + 4], "big")
        # 28-bit: middle byte carries the high nibbles of both records
        if side == 0:
            return ((buf[base + 3] >> 4) << 24) | int.from_bytes(buf[base : base + 3], "big")
        return ((buf[base + 3] & 0xF) << 24) | int.from_bytes(buf[base + 4 : base + 7], "big")

    def _data_at(self, record: int):
        # spec: data offset = record - node_count - 16, relative to the
        # data section start
        value, _ = self._data.decode(self.data_start + (record - self.node_count - 16))
        return value

    def networks(self) -> Iterator[tuple[int, int, dict]]:
        """Yield (prefix_value, prefix_len, data) for every routed
        network, in tree order. For an IPv6 tree (ip_version=6) the
        walk starts at the IPv4-mapped ::ffff:0:0/96 subtree so the
        yielded prefixes are plain IPv4; a v4 tree walks from the
        root. Iterative DFS — a city database is ~millions of
        networks, recursion would blow the stack."""
        start_node, start_depth = 0, 0
        if self.ip_version == 6:
            # descend 96 zero bits; all-zero path stays valid even in
            # trees that alias it (standard readers do the same walk)
            node = 0
            for _ in range(96):
                if node >= self.node_count:
                    return
                node = self._record(node, 0)
            start_node = node
        if start_node >= self.node_count:
            return
        stack = [(start_node, 0, 0)]  # node, prefix, depth (within v4)
        while stack:
            node, prefix, depth = stack.pop()
            for side in (1, 0):
                rec = self._record(node, side)
                child_prefix = (prefix << 1) | side
                if rec < self.node_count:
                    if depth + 1 <= 32:
                        stack.append((rec, child_prefix, depth + 1))
                elif rec > self.node_count:
                    yield (
                        child_prefix << (32 - depth - 1),
                        depth + 1,
                        self._data_at(rec),
                    )
                # rec == node_count: empty branch

    def networks_v6(self) -> Iterator[tuple[int, int, dict]]:
        """Yield (prefix128, prefix_len, data) walking the FULL tree
        at v6 width (a v4 tree is lifted into the v4-mapped
        ``::ffff:0:0/96`` space). Complements :meth:`networks`, which
        collapses a v6 tree to its v4-mapped subtree."""
        if self.ip_version != 6:
            # MaxMind convention: v4 lives at bits 0-95 zero (::/96),
            # the same subtree networks() descends for v6 trees
            for prefix, plen, data in self.networks():
                yield (prefix, 96 + plen, data)
            return
        stack = [(0, 0, 0)]  # node, prefix, depth
        while stack:
            node, prefix, depth = stack.pop()
            for side in (1, 0):
                rec = self._record(node, side)
                child_prefix = (prefix << 1) | side
                if rec < self.node_count:
                    if depth + 1 <= 128:
                        stack.append((rec, child_prefix, depth + 1))
                elif rec > self.node_count:
                    yield (
                        child_prefix << (128 - depth - 1),
                        depth + 1,
                        self._data_at(rec),
                    )

    @staticmethod
    def _geo_fields(data: dict) -> dict:
        """Geoip2-style nested records (country.iso_code, city.names.
        en, location.latitude/longitude) or flat country/city/lat/
        lon."""
        country = data.get("country")
        if isinstance(country, dict):
            country = country.get("iso_code")
        city = data.get("city")
        if isinstance(city, dict):
            city = (city.get("names") or {}).get("en")
        loc = data.get("location") or {}
        lat = loc.get("latitude", data.get("lat"))
        lon = loc.get("longitude", data.get("lon"))
        return {
            "country": country,
            "city": city,
            "lat": float(lat) if lat is not None else None,
            "lon": float(lon) if lon is not None else None,
        }

    def interval_rows(self) -> list[dict]:
        """(net_start, net_end, country, city, lat, lon) rows for the
        GeoipEnricher v4 broadcast table."""
        rows = []
        for prefix, plen, data in self.networks():
            rows.append(
                {
                    "net_start": prefix,
                    "net_end": prefix | ((1 << (32 - plen)) - 1),
                    **self._geo_fields(data),
                }
            )
        return rows

    def interval_rows_v6(self) -> list[dict]:
        """(net_start_hex, net_end_hex, country, city, lat, lon) rows
        for the GeoipEnricher v6 broadcast table: 32-char lowercase
        hex bounds whose lexicographic order is the 128-bit numeric
        order (the ip_utils.py v6 key encoding)."""
        rows = []
        for prefix, plen, data in self.networks_v6():
            end = prefix | ((1 << (128 - plen)) - 1)
            rows.append(
                {
                    "net_start_hex": f"{prefix:032x}",
                    "net_end_hex": f"{end:032x}",
                    **self._geo_fields(data),
                }
            )
        return rows


def geo_table_from_mmdb(spark, path: str, ip_version: int = 4):
    """Load an .mmdb file into the interval DataFrame
    ``GeoipEnricher`` consumes: ``ip_version=4`` gives (net_start,
    net_end) longs from the v4(-mapped) networks; ``ip_version=6``
    gives (net_start_hex, net_end_hex) 32-char hex bounds for the
    string-BETWEEN join over the full v6 space."""
    with open(path, "rb") as fh:
        reader = MMDBReader(fh.read())
    if ip_version == 6:
        return spark.createDataFrame(
            reader.interval_rows_v6(),
            "net_start_hex string, net_end_hex string, "
            "country string, city string, lat double, lon double",
        )
    return spark.createDataFrame(
        reader.interval_rows(),
        "net_start long, net_end long, country string, city string, lat double, lon double",
    )


# --------------------------------------------------------------------
# Minimal writer (test fixtures only): 24-bit records, IPv4 tree
# --------------------------------------------------------------------


def _encode_value(value) -> bytes:
    """Encode one value (no pointers, sizes < 29 — ample for tests)."""
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return bytes([(_T_STRING << 5) | len(raw)]) + raw
    if isinstance(value, bool):
        # extended type: ctrl carries the size field (the bool value)
        return bytes([(0 << 5) | (1 if value else 0), _T_BOOL - 7])
    if isinstance(value, float):
        return bytes([(_T_DOUBLE << 5) | 8]) + struct.pack(">d", value)
    if isinstance(value, int):
        raw = value.to_bytes((value.bit_length() + 7) // 8 or 1, "big")
        return bytes([(_T_UINT32 << 5) | len(raw)]) + raw
    if isinstance(value, dict):
        out = bytes([(_T_MAP << 5) | len(value)])
        for k, v in value.items():
            out += _encode_value(str(k)) + _encode_value(v)
        return out
    if isinstance(value, list):
        out = bytes([(0 << 5) | len(value), _T_ARRAY - 7])
        for v in value:
            out += _encode_value(v)
        return out
    raise MMDBError(f"cannot encode {type(value).__name__}")


def _encode_uint64(value: int) -> bytes:
    raw = value.to_bytes((value.bit_length() + 7) // 8 or 1, "big")
    return bytes([(0 << 5) | len(raw), _T_UINT64 - 7]) + raw


class MMDBWriter:
    """Build a minimal spec-valid database with 24-bit records.
    ``ip_version=4`` (default) builds a 32-bit tree; ``ip_version=6``
    a 128-bit tree, with v4 CIDRs lifted into ``::ffff:0:0/96`` the
    way real dual-stack MaxMind databases store them."""

    def __init__(self, database_type: str = "Test-City", ip_version: int = 4):
        self.database_type = database_type
        self.ip_version = ip_version
        self.width = 32 if ip_version == 4 else 128
        self._entries: list[tuple[int, int, dict]] = []

    def insert(self, cidr: str, data: dict) -> None:
        import ipaddress

        net = ipaddress.ip_network(cidr, strict=False)
        value, plen = int(net.network_address), net.prefixlen
        if net.version == 4 and self.ip_version == 6:
            # MaxMind spec: v4 networks in a v6 tree sit under ::/96
            plen = 96 + plen
        elif net.version != self.ip_version:
            raise MMDBError(f"cannot insert v{net.version} cidr into v{self.ip_version} tree")
        self._entries.append((value, plen, data))

    def tobytes(self) -> bytes:
        # trie of dict nodes: {0: child, 1: child} or {"data": idx}
        root: dict = {}
        datas: list[dict] = []
        for value, plen, data in self._entries:
            node = root
            for i in range(plen):
                if "data" in node:
                    raise MMDBError("overlapping networks unsupported by test writer")
                bit = (value >> (self.width - 1 - i)) & 1
                node = node.setdefault(bit, {})
            if node:
                raise MMDBError("overlapping networks unsupported by test writer")
            node["data"] = len(datas)
            datas.append(data)

        # number internal nodes breadth-first
        order: list[dict] = []
        queue = [root]
        while queue:
            node = queue.pop(0)
            if "data" in node:
                continue
            node["_idx"] = len(order)
            order.append(node)
            for bit in (0, 1):
                if bit in node:
                    queue.append(node[bit])
        node_count = len(order)

        # data section: encode each record once, remember offsets
        data_blob = bytearray()
        offsets = []
        for data in datas:
            offsets.append(len(data_blob))
            data_blob += _encode_value(data)

        def record(node: dict, bit: int) -> int:
            child = node.get(bit)
            if child is None:
                return node_count  # empty
            if "data" in child:
                return node_count + 16 + offsets[child["data"]]
            return child["_idx"]

        tree = bytearray()
        for node in order:
            tree += record(node, 0).to_bytes(3, "big")
            tree += record(node, 1).to_bytes(3, "big")

        meta = {
            "binary_format_major_version": 2,
            "binary_format_minor_version": 0,
            "build_epoch": 0,  # fixed: fixture bytes stay deterministic
            "node_count": node_count,
            "record_size": 24,
            "ip_version": self.ip_version,
            "database_type": self.database_type,
            "languages": ["en"],
            "description": {"en": "test fixture"},
        }
        meta_blob = bytes([(_T_MAP << 5) | len(meta)])
        for key, val in meta.items():
            meta_blob += _encode_value(key)
            if key == "build_epoch":
                meta_blob += _encode_uint64(val)
            else:
                meta_blob += _encode_value(val)

        return bytes(tree) + b"\x00" * 16 + bytes(data_blob) + _METADATA_MARKER + meta_blob
