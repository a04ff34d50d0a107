"""Native-column IP helpers shared by ip_informer /
network_comparison / geoip_enricher. All pure Catalyst expressions.

IPv6 strategy: a 128-bit address has no native Spark type, so v6
addresses are normalized to 32-char lowercase hex strings whose
LEXICOGRAPHIC order equals the numeric order — range membership and
interval joins become plain string BETWEENs, and equi-join bin keys
come from a fixed-width hex prefix. CIDR bounds are computed at plan
time with the stdlib ``ipaddress`` module and embedded as literals."""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column
from pyspark.sql import functions as F

IPV4_REGEX = r"^(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$"
IPV6_REGEX = (
    r"^(?:[0-9A-Fa-f]{0,4}:){2,7}"
    r"(?:[0-9A-Fa-f]{0,4}|(?:\d{1,3}\.){3}\d{1,3})$"  # plain or dotted-quad tail
)


def is_ipv4(col: Column) -> Column:
    return col.cast("string").rlike(IPV4_REGEX)


def is_ipv6(col: Column) -> Column:
    return col.cast("string").rlike(IPV6_REGEX)


def ipv4_to_long(col: Column) -> Column:
    """Dotted-quad string -> 32-bit unsigned value in a long.

    ``try_cast``, not ``cast``: under ANSI mode Catalyst's common-
    subexpression elimination can hoist this out of an enclosing
    ``when(is_ipv4(...), ...)`` guard, so a plain cast would throw on
    any non-v4 string in the column."""
    parts = F.split(col.cast("string"), r"\.")
    return (
        parts.getItem(0).try_cast("long") * F.lit(16777216)
        + parts.getItem(1).try_cast("long") * F.lit(65536)
        + parts.getItem(2).try_cast("long") * F.lit(256)
        + parts.getItem(3).try_cast("long")
    )


def ipv6_to_hex(col: Column) -> Column:
    """RFC-4291 literal (optionally ``::``-compressed, optionally with
    an embedded dotted-quad tail like ``::ffff:1.2.3.4``) -> 32-char
    lowercase hex string. Pure Catalyst: split/transform/lpad — no
    Python per row."""
    s = F.lower(col.cast("string"))
    # embedded dotted-quad tail -> two 16-bit hex groups
    v4_tail = F.element_at(F.split(s, ":"), -1)
    v4_long = ipv4_to_long(v4_tail)
    v4_groups = F.lower(F.lpad(F.hex(v4_long), 8, "0"))
    s = F.when(
        s.contains("."),
        F.concat(
            F.regexp_replace(s, r"[^:]+$", ""),
            F.substring(v4_groups, 1, 4),
            F.lit(":"),
            F.substring(v4_groups, 5, 4),
        ),
    ).otherwise(s)
    halves = F.split(s, "::")
    left_str = halves.getItem(0)
    right_str = F.when(F.size(halves) > 1, halves.getItem(1)).otherwise(F.lit(""))
    nonempty = lambda x: x != ""  # noqa: E731
    left = F.filter(F.split(left_str, ":"), nonempty)
    right = F.filter(F.split(right_str, ":"), nonempty)
    mid = F.array_repeat(
        F.lit("0"), F.greatest(F.lit(0), F.lit(8) - F.size(left) - F.size(right))
    )
    groups = F.concat(left, mid, right)
    return F.concat_ws("", F.transform(groups, lambda g: F.lpad(g, 4, "0")))


def ip_to_hex(col: Column) -> Column:
    """Unified 128-bit hex key. IPv4 maps to the zero-prefixed
    ``::/96`` space — where MaxMind v6 trees store v4 networks — and
    v4-MAPPED v6 literals (``::ffff:a.b.c.d``) normalize down to the
    same key, so ``1.2.3.4`` and ``::ffff:1.2.3.4`` compare equal."""
    v4_compat = F.concat(F.lit("0" * 24), F.lower(F.lpad(F.hex(ipv4_to_long(col)), 8, "0")))
    v6_hex = ipv6_to_hex(col)
    v6_unmapped = F.when(
        v6_hex.startswith("0" * 20 + "ffff"),
        F.concat(F.lit("0" * 24), F.substring(v6_hex, 25, 8)),
    ).otherwise(v6_hex)
    return (
        F.when(is_ipv4(col), v4_compat)
        .when(is_ipv6(col), v6_unmapped)
        .otherwise(F.lit(None).cast("string"))
    )


def cidr6_bounds(cidr: str) -> tuple[str, str]:
    """(start_hex, end_hex) 32-char bounds of a v6 CIDR — plan-time."""
    net = ipaddress.ip_network(cidr, strict=False)
    if net.version == 4:
        net = ipaddress.ip_network(
            f"::ffff:{net.network_address}/{96 + net.prefixlen}", strict=False
        )
    return f"{int(net.network_address):032x}", f"{int(net.broadcast_address):032x}"


def in_cidr6(col: Column, cidr: str) -> Column:
    """True when IPv6 ``col`` falls inside a v6 ``cidr`` — a literal
    string BETWEEN on the normalized hex key."""
    start, end = cidr6_bounds(cidr)
    return is_ipv6(col) & ipv6_to_hex(col).between(F.lit(start), F.lit(end))


def in_cidr_any(col: Column, cidr: str) -> Column:
    """Dispatch on the CIDR family: v6 networks match v6 addresses,
    v4 networks match v4 addresses (reference semantics — the stdlib
    ``ipaddress`` module never matches across families)."""
    return in_cidr6(col, cidr) if ":" in cidr else in_cidr(col, cidr)


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


# v4 blocks + the v6 equivalents the stdlib ipaddress module reports
# (unique-local fc00::/7 for private, ::1/128 loopback, fe80::/10
# link-local, ff00::/8 multicast) — dual-stack like the reference's
# ip_informer, which delegates to ipaddress directly.
_PRIVATE_CIDRS = ["10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16", "fc00::/7"]


def _any_cidr(col: Column, cidrs: list[str]) -> Column:
    out = in_cidr_any(col, cidrs[0])
    for cidr in cidrs[1:]:
        out = out | in_cidr_any(col, cidr)
    return out


def is_private(col: Column) -> Column:
    return _any_cidr(col, _PRIVATE_CIDRS)


def is_loopback(col: Column) -> Column:
    return _any_cidr(col, ["127.0.0.0/8", "::1/128"])


def is_link_local(col: Column) -> Column:
    return _any_cidr(col, ["169.254.0.0/16", "fe80::/10"])


def is_multicast(col: Column) -> Column:
    return _any_cidr(col, ["224.0.0.0/4", "ff00::/8"])


def is_reserved(col: Column) -> Column:
    return in_cidr(col, "240.0.0.0/4")


def is_global(col: Column) -> Column:
    return (
        (is_ipv4(col) | is_ipv6(col))
        & ~is_private(col)
        & ~is_loopback(col)
        & ~is_link_local(col)
        & ~is_multicast(col)
        & ~is_reserved(col)
    )
