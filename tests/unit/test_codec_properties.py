"""Property tests for the pure-Python binary codecs: any image
round-trips PNG under any filter type; any disjoint network set
round-trips the mmdb writer/reader. No Spark session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from logprep_spark.functions.multimodal import decode_png, encode_png
from logprep_spark.sources.mmdb import MMDBReader, MMDBWriter


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    ftype=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip_any_image_any_filter(h, w, ftype, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img, filter_type=ftype)), img)


@st.composite
def disjoint_networks(draw):
    """Up to 6 disjoint IPv4 CIDRs: distinct /8 top octets keep them
    trivially non-overlapping while prefix lengths vary freely."""
    octets = draw(
        st.lists(st.integers(1, 223), min_size=1, max_size=6, unique=True)
    )
    nets = []
    for o in octets:
        plen = draw(st.integers(8, 30))
        # a random address inside o.0.0.0/8, masked to the prefix
        addr = (o << 24) | draw(st.integers(0, (1 << 24) - 1))
        addr &= ~((1 << (32 - plen)) - 1) & 0xFFFFFFFF
        nets.append((addr, plen))
    return nets


@settings(max_examples=25, deadline=None)
@given(nets=disjoint_networks())
def test_mmdb_roundtrip_any_disjoint_networks(nets):
    w = MMDBWriter()
    for i, (addr, plen) in enumerate(nets):
        cidr = f"{addr >> 24}.{(addr >> 16) & 255}.{(addr >> 8) & 255}.{addr & 255}/{plen}"
        w.insert(cidr, {"idx": i, "tag": f"n{i}"})
    reader = MMDBReader(w.tobytes())
    got = {(p, l): d for p, l, d in reader.networks()}
    assert got == {
        (addr, plen): {"idx": i, "tag": f"n{i}"}
        for i, (addr, plen) in enumerate(nets)
    }
    rows = reader.interval_rows()
    assert len(rows) == len(nets)
    for row in rows:
        assert row["net_start"] <= row["net_end"]
