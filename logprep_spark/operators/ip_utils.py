"""Native-column IPv4 helpers shared by ip_informer /
network_comparison / geoip_enricher. All pure Catalyst expressions."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

IPV4_REGEX = r"^(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$"
IPV6_REGEX = r"^(?:[0-9A-Fa-f]{0,4}:){2,7}[0-9A-Fa-f]{0,4}$"


def is_ipv4(col: Column) -> Column:
    return col.cast("string").rlike(IPV4_REGEX)


def is_ipv6(col: Column) -> Column:
    return col.cast("string").rlike(IPV6_REGEX)


def ipv4_to_long(col: Column) -> Column:
    """Dotted-quad string -> 32-bit unsigned value in a long."""
    parts = F.split(col.cast("string"), r"\.")
    return (
        parts.getItem(0).cast("long") * F.lit(16777216)
        + parts.getItem(1).cast("long") * F.lit(65536)
        + parts.getItem(2).cast("long") * F.lit(256)
        + parts.getItem(3).cast("long")
    )


def in_cidr(col: Column, cidr: str) -> Column:
    """True when IPv4 ``col`` falls inside ``cidr`` (e.g. 10.0.0.0/8)."""
    net, _, prefix_s = cidr.partition("/")
    prefix = int(prefix_s) if prefix_s else 32
    net_long = 0
    for octet in net.split("."):
        net_long = net_long * 256 + int(octet)
    shift = 32 - prefix
    return is_ipv4(col) & (
        F.shiftrightunsigned(ipv4_to_long(col), shift) == F.lit(net_long >> shift)
    )


_PRIVATE_CIDRS = ["10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16"]


def is_private(col: Column) -> Column:
    out = in_cidr(col, _PRIVATE_CIDRS[0])
    for cidr in _PRIVATE_CIDRS[1:]:
        out = out | in_cidr(col, cidr)
    return out


def is_loopback(col: Column) -> Column:
    return in_cidr(col, "127.0.0.0/8")


def is_link_local(col: Column) -> Column:
    return in_cidr(col, "169.254.0.0/16")


def is_multicast(col: Column) -> Column:
    return in_cidr(col, "224.0.0.0/4")


def is_reserved(col: Column) -> Column:
    return in_cidr(col, "240.0.0.0/4")


def is_global(col: Column) -> Column:
    return (
        is_ipv4(col)
        & ~is_private(col)
        & ~is_loopback(col)
        & ~is_link_local(col)
        & ~is_multicast(col)
        & ~is_reserved(col)
    )
