"""IPv6 column helpers: the pure-Catalyst hex normalizer is checked
against the stdlib ``ipaddress`` module (the reference's ip_informer /
network_comparison delegate to it directly), and the dual-stack CIDR
predicates against ``ipaddress`` network membership."""

import ipaddress

import pytest
from pyspark.sql import functions as F

from logprep_spark.operators import ip_utils
from logprep_spark.operators.network_comparison import NetworkComparison

LITERALS = [
    "::",
    "::1",
    "2001:db8::1",
    "2001:db8::",
    "fe80::dead:beef",
    "2001:0db8:0001:0002:0003:0004:0005:0006",
    "ff02::2",
    "abcd:ef01::99",
    "1:2:3:4:5:6:7:8",
    "::ffff:192.168.1.7",
    "2001:db8:3:4::192.0.2.33",
    "64:ff9b::255.255.255.255",
]


def test_ipv6_to_hex_matches_ipaddress(spark):
    df = spark.createDataFrame([(s,) for s in LITERALS], "ip string")
    got = {r.ip: r.hex for r in df.select("ip", ip_utils.ipv6_to_hex(F.col("ip")).alias("hex")).collect()}
    for lit in LITERALS:
        assert got[lit] == f"{int(ipaddress.ip_address(lit)):032x}", lit


def test_ip_to_hex_unifies_families(spark):
    """v4 and its v4-mapped v6 literal land on the same ::/96 key."""
    df = spark.createDataFrame(
        [("1.2.3.4",), ("::ffff:1.2.3.4",), ("2001:db8::1",), ("junk",)], "ip string"
    )
    got = {r.ip: r.hex for r in df.select("ip", ip_utils.ip_to_hex(F.col("ip")).alias("hex")).collect()}
    assert got["1.2.3.4"] == got["::ffff:1.2.3.4"] == f"{0x01020304:032x}"
    assert got["2001:db8::1"] == f"{int(ipaddress.ip_address('2001:db8::1')):032x}"
    assert got["junk"] is None


@pytest.mark.parametrize(
    "cidr,inside,outside",
    [
        ("2001:db8::/32", "2001:db8:ffff::1", "2001:db9::1"),
        ("fe80::/10", "fe80::1", "fec0::1"),
        ("fc00::/7", "fdab::9", "fe00::9"),
        ("::1/128", "::1", "::2"),
    ],
)
def test_in_cidr6(spark, cidr, inside, outside):
    df = spark.createDataFrame([(inside,), (outside,), ("10.0.0.1",)], "ip string")
    got = {r.ip: r.hit for r in df.select("ip", ip_utils.in_cidr6(F.col("ip"), cidr).alias("hit")).collect()}
    assert got[inside] is True
    assert got[outside] is False
    assert got["10.0.0.1"] is False  # families never cross-match
    # agree with the stdlib
    net = ipaddress.ip_network(cidr)
    assert (ipaddress.ip_address(inside) in net) and (ipaddress.ip_address(outside) not in net)


def test_network_comparison_v6_lists(spark):
    """v6 CIDRs in network lists match v6 source IPs; v4 lists keep
    matching v4 — family-dispatched per CIDR."""
    events = spark.createDataFrame(
        [
            (1, "2001:db8:1::5"),
            (2, "fd00::1"),
            (3, "10.2.3.4"),
            (4, "8.8.8.8"),
        ],
        "id long, ip string",
    )
    proc = NetworkComparison(
        [
            {
                "filter": "*",
                "network_comparison": {
                    "source_fields": ["ip"],
                    "target_field": "net",
                    "networks": {
                        "docnet": ["2001:db8::/32"],
                        "internal": ["10.0.0.0/8", "fd00::/8"],
                    },
                },
            }
        ]
    )
    rows = {r.id: r for r in proc.transform(events).collect()}
    assert rows[1].net.in_network == ["docnet"]
    assert rows[2].net.in_network == ["internal"]
    assert rows[3].net.in_network == ["internal"]
    assert rows[4].net.in_network is None
    assert sorted(rows[4].net.not_in_network) == ["docnet", "internal"]
