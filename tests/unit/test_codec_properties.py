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


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    q=st.integers(min_value=70, max_value=100),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
def test_jpeg_roundtrip_psnr(h, w, q, seed):
    """Lossy round-trip: shape/dtype exact for ANY content; smooth
    (low-frequency) content — JPEG's design target — must clear a
    real PSNR floor. Pure noise is excluded from the floor: heavy
    high-frequency loss there is correct JPEG behavior, not a bug."""
    from logprep_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(seed)
    noise = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=q))
    assert out.shape == noise.shape and out.dtype == np.uint8

    # smooth content: a tiny random image upsampled 8x has almost no
    # energy above the first DCT coefficients
    smooth = np.repeat(np.repeat(
        rng.randint(0, 256, size=(max(1, h // 4), max(1, w // 4), 3), dtype=np.uint8),
        8, axis=0), 8, axis=1)
    out = decode_jpeg(encode_jpeg(smooth, quality=q))
    mse = np.mean((out.astype(float) - smooth.astype(float)) ** 2)
    if mse > 0:
        psnr = 10 * np.log10(255**2 / mse)
        assert psnr > 28.0, (psnr, q)


def test_jpeg_closed_form_and_guards():
    from logprep_spark.functions.jpeg import JpegError, decode_jpeg, encode_jpeg

    # uniform color is DC-only: decode must be within 1 LSB everywhere
    img = np.full((16, 24, 3), [120, 64, 200], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    # gradients (smooth content, JPEG's home turf) decode above 40 dB
    grad = np.zeros((64, 64, 3), np.uint8)
    grad[:, :, 0] = np.arange(64, dtype=np.uint8)[None, :] * 4
    grad[:, :, 1] = np.arange(64, dtype=np.uint8)[:, None] * 4
    out = decode_jpeg(encode_jpeg(grad, quality=90))
    mse = np.mean((out.astype(float) - grad.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / mse) > 40.0

    # unsupported shapes fail loudly, never mis-decode
    import pytest as _pytest

    with _pytest.raises(JpegError):
        decode_jpeg(b"\x89PNG not a jpeg")
    blob = bytearray(encode_jpeg(grad))
    sof_at = bytes(blob).find(b"\xff\xc0")
    blob[sof_at + 1] = 0xC9  # rewrite frame marker to arithmetic-coded
    with _pytest.raises(JpegError, match="non-baseline"):
        decode_jpeg(bytes(blob))
    # a sequential scan mislabeled progressive (Ss=0, Se=63) must be
    # refused, not mis-decoded as a DC scan
    blob[sof_at + 1] = 0xC2
    with _pytest.raises(JpegError, match="spectral"):
        decode_jpeg(bytes(blob))


def test_jpeg_flows_through_decode_image_and_resize(spark):
    from logprep_spark.functions import multimodal
    from logprep_spark.functions.jpeg import encode_jpeg

    grad = np.zeros((48, 48, 3), np.uint8)
    grad[:, :, 0] = np.arange(48, dtype=np.uint8)[None, :] * 5
    payload = encode_jpeg(grad, quality=90)
    assert multimodal.decode_image(payload).shape == (48, 48, 3)
    media = spark.createDataFrame(
        [(1, "image", payload, {"mime": "image/jpeg", "width": 48, "height": 48,
                                "duration_ms": None})],
        multimodal.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in multimodal.resize_images(media, 24, 24).collect()}
    assert multimodal.decode_image(bytes(out[1].payload)).shape == (24, 24, 3)


@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    q=st.integers(min_value=75, max_value=98),
    rst=st.integers(min_value=0, max_value=3),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
def test_jpeg_420_roundtrip_psnr(h, w, q, rst, seed):
    """4:2:0 round-trip at any dimension (odd sizes exercise the
    MCU-edge padding in both directions) with and without restart
    intervals: shape/dtype exact always; smooth content clears a PSNR
    floor despite the chroma downsample."""
    from logprep_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(seed)
    noise = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=q, subsampling="420",
                                  restart_interval=rst))
    assert out.shape == noise.shape and out.dtype == np.uint8

    smooth = np.repeat(np.repeat(
        rng.randint(0, 256, size=(max(1, h // 8), max(1, w // 8), 3), dtype=np.uint8),
        16, axis=0), 16, axis=1)[:h, :w]
    out = decode_jpeg(encode_jpeg(smooth, quality=q, subsampling="420",
                                  restart_interval=rst))
    mse = np.mean((out.astype(float) - smooth.astype(float)) ** 2)
    if mse > 0:
        psnr = 10 * np.log10(255**2 / mse)
        assert psnr > 24.0, (psnr, q, rst)


def test_jpeg_restart_markers_do_not_change_pixels():
    """RSTn only re-segments the entropy stream (predictors reset,
    byte-aligned): decoded pixels must be IDENTICAL to the
    unsegmented encoding of the same image."""
    from logprep_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(40, 56, 3), dtype=np.uint8)
    for ss in ("444", "420"):
        base = decode_jpeg(encode_jpeg(img, 85, subsampling=ss))
        for rst in (1, 2, 5):
            seg = decode_jpeg(encode_jpeg(img, 85, subsampling=ss,
                                          restart_interval=rst))
            assert np.array_equal(base, seg), (ss, rst)
        # DRI segment is actually present in the stream
        blob = encode_jpeg(img, 85, subsampling=ss, restart_interval=2)
        assert b"\xff\xdd" in blob and b"\xff\xd0" in blob


def test_jpeg_420_uniform_near_exact():
    """Uniform color survives 4:2:0 within 1 LSB: the 2x2 chroma mean
    of a constant is the constant, so subsampling must cost nothing."""
    from logprep_spark.functions.jpeg import decode_jpeg, encode_jpeg

    img = np.full((24, 40, 3), [90, 180, 40], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling="420"))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


@settings(max_examples=10, deadline=None)
@given(
    h=st.integers(min_value=4, max_value=48),
    w=st.integers(min_value=4, max_value=48),
    q=st.integers(min_value=70, max_value=95),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
    ss=st.sampled_from(["444", "420"]),
)
def test_jpeg_progressive_matches_baseline(h, w, q, seed, ss):
    """The progressive scan ladder transmits every coefficient bit the
    sequential scan does, and both share the quantization path — so a
    progressive decode must be BIT-IDENTICAL to decoding the baseline
    encoding of the same image. This pins every Annex G path (EOB
    runs, spectral bands, DC and AC successive-approximation
    refinement) to the already-validated sequential decoder."""
    from logprep_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(seed)
    for img in (
        rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8),  # dense coefs
        np.repeat(np.repeat(  # smooth: long EOB runs, eobrun > 1
            rng.randint(0, 256, size=(max(1, h // 8), max(1, w // 8), 3),
                        dtype=np.uint8), 16, axis=0), 16, axis=1)[:h, :w],
    ):
        base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=ss))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q, subsampling=ss))
        assert np.array_equal(base, prog)


def test_jpeg_progressive_stream_shape():
    """The emitted stream really is progressive: SOF2 frame, multiple
    SOS scans; and a truncated-after-first-scans decode still raises
    cleanly rather than returning garbage."""
    from logprep_spark.functions.jpeg import (
        JpegError,
        decode_jpeg,
        encode_jpeg_progressive,
    )
    import pytest as _pytest

    img = np.full((16, 16, 3), [200, 30, 90], dtype=np.uint8)
    blob = encode_jpeg_progressive(img, 90)
    assert b"\xff\xc2" in blob
    assert blob.count(b"\xff\xda") == 11  # 2 DC + 9 AC scans
    out = decode_jpeg(blob)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    # truncation inside a scan's entropy data raises, never returns
    # garbage (noise image -> the DC scan alone spans many bytes;
    # SOS header is 14 bytes, so +16 lands 2 bytes into entropy)
    noisy = encode_jpeg_progressive(
        np.random.RandomState(3).randint(0, 256, (32, 32, 3)).astype(np.uint8), 90
    )
    cut = noisy.find(b"\xff\xda") + 16
    with _pytest.raises(JpegError, match="truncated"):
        decode_jpeg(noisy[:cut])


# --- GIF ---------------------------------------------------------------


def _lzw_compress_reference(indices, min_code_size):
    """Independent REAL LZW compressor (dictionary-building, width
    growth, 4096 reset) — validates the decoder against streams the
    in-repo uncompressed-style encoder never produces (KwKwK, width
    growth, dictionary resets)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    acc = nbits = 0
    out = bytearray()

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    put(clear)
    buf = b""
    for s in bytes(indices):
        cand = buf + bytes([s])
        if cand in table:
            buf = cand
            continue
        put(table[buf])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            put(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        buf = bytes([s])
    put(table[buf])
    put(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


@given(
    h=st.integers(2, 24),
    w=st.integers(2, 24),
    ncolors=st.integers(2, 8),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=25, deadline=None)
def test_gif_roundtrip_any_image(h, w, ncolors, interlace, seed):
    import numpy as np

    from logprep_spark.functions.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    img = (rng.integers(0, ncolors, (h, w, 1), dtype=np.uint8) * (255 // ncolors)).repeat(
        3, axis=2
    )
    assert (decode_gif(encode_gif(img, interlace=interlace)) == img).all()


def test_gif_lzw_decoder_vs_independent_compressor():
    import random

    from logprep_spark.functions.gif import _lzw_decode

    random.seed(42)
    cases = [
        (2, bytes([0, 1] * 500)),               # KwKwK-heavy alternation
        (2, bytes([i % 4 for i in range(3000)])),
        (4, bytes(random.choices(range(16), k=5000))),
        (2, b"\x00" * 4000),                    # one long run + dict reset
    ]
    for mcs, data in cases:
        comp = _lzw_compress_reference(data, mcs)
        assert bytes(_lzw_decode(mcs, comp, len(data))) == data


def test_gif_transparency_and_multiframe():
    import numpy as np
    import struct as _s

    from logprep_spark.functions.gif import decode_gif_frames, encode_gif

    base = np.zeros((4, 4, 3), dtype=np.uint8)
    base[:, :] = (10, 20, 30)
    g = bytearray(encode_gif(base))
    # splice a graphic-control extension declaring index 0 transparent
    # ahead of the image descriptor, then decode: every pixel is index
    # 0 -> transparent -> the background shows through unchanged
    img_desc = g.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 0x04, 0x01]) + _s.pack("<H", 0) + bytes([0x00, 0x00])
    g2 = bytes(g[:img_desc]) + gce + bytes(g[img_desc:])
    frames = decode_gif_frames(g2)
    assert len(frames) == 1
    # background color = global table entry 0 = the single color
    assert (frames[0] == base).all()


def _handcrafted_gif(frame_specs):
    """Minimal 2x2 GIF89a: GCT = [black, red, green, blue]; each spec
    is (left, top, w, h, indices, disposal)."""
    import struct as _s

    from logprep_spark.functions.gif import _lzw_encode_uncompressed

    out = bytearray(b"GIF89a")
    out += _s.pack("<HHBBB", 2, 2, 0x80 | 1, 0, 0)  # GCT, 4 entries, bg=0
    out += bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    for left, top, w, h, idx, disposal in frame_specs:
        out += bytes([0x21, 0xF9, 0x04, (disposal & 7) << 2])
        out += _s.pack("<H", 10) + bytes([0x00, 0x00])
        out += _s.pack("<BHHHHB", 0x2C, left, top, w, h, 0)
        out.append(2)  # min code size
        stream = _lzw_encode_uncompressed(bytes(idx), 2)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def test_gif_disposal_restore_to_background():
    import numpy as np

    from logprep_spark.functions.gif import decode_gif_frames

    # frame 1: full screen red, disposal=2 (restore rect to background)
    # frame 2: 1x1 green at (0,0) — the other 3 pixels must be the
    # BACKGROUND (black), not frame 1's red
    g = _handcrafted_gif(
        [(0, 0, 2, 2, [1, 1, 1, 1], 2), (0, 0, 1, 1, [2], 0)]
    )
    f = decode_gif_frames(g)
    assert len(f) == 2
    assert (f[0] == (255, 0, 0)).all()
    expect = np.zeros((2, 2, 3), dtype=np.uint8)
    expect[0, 0] = (0, 255, 0)
    assert (f[1] == expect).all()


def test_gif_disposal_restore_previous():
    import numpy as np

    from logprep_spark.functions.gif import decode_gif_frames

    # frame 1: full red; frame 2: green at (0,0) with disposal=3
    # (restore previous); frame 3: blue at (1,1) — (0,0) must be RED
    # again in frame 3 because disposal 3 undid frame 2
    g = _handcrafted_gif(
        [
            (0, 0, 2, 2, [1, 1, 1, 1], 0),
            (0, 0, 1, 1, [2], 3),
            (1, 1, 1, 1, [3], 0),
        ]
    )
    f = decode_gif_frames(g)
    assert len(f) == 3
    expect2 = np.full((2, 2, 3), (255, 0, 0), dtype=np.uint8)
    expect2[0, 0] = (0, 255, 0)
    assert (f[1] == expect2).all()
    expect3 = np.full((2, 2, 3), (255, 0, 0), dtype=np.uint8)
    expect3[1, 1] = (0, 0, 255)
    assert (f[2] == expect3).all()


@given(
    h=st.integers(3, 20), w=st.integers(3, 20),
    ftype=st.integers(0, 4), seed=st.integers(0, 10**6),
)
@settings(max_examples=12, deadline=None)
def test_png_adam7_interlace_matches_progressive_none(h, w, ftype, seed):
    """Adam7 decode is bit-identical to the non-interlaced decode of
    the same pixels, under every filter type."""
    import numpy as np

    from logprep_spark.functions.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    plain = decode_png(encode_png(img, filter_type=ftype))
    inter = decode_png(encode_png(img, filter_type=ftype, interlace=True))
    assert (plain == img).all()
    assert (inter == img).all()


def test_png_palette_roundtrip_and_subbyte_depths():
    """Palette PNGs: 8-bit indices round-trip through our encoder;
    1/2/4-bit packed index rows decode via hand-built streams."""
    import struct
    import zlib

    import numpy as np

    from logprep_spark.functions.multimodal import (
        _PNG_SIG, _png_chunk, decode_png, encode_png,
    )

    img = np.zeros((5, 7, 3), dtype=np.uint8)
    img[::2, :] = (255, 0, 0)
    img[:, ::3] = (0, 0, 255)
    out = decode_png(encode_png(img, filter_type=2, palette=True))
    assert (out == img).all()
    # interlaced palette
    out_i = decode_png(encode_png(img, filter_type=1, palette=True, interlace=True))
    assert (out_i == img).all()

    # hand-built sub-byte palette PNG: 2-bit indices, 5px wide (packed
    # into 2 bytes/row with 3 bits padding), palette of 4 colors
    plte = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    rows = []
    idx = [[0, 1, 2, 3, 0], [3, 2, 1, 0, 3]]
    for r in idx:
        packed = bytearray(2)
        for i, v in enumerate(r):
            packed[i // 4] |= v << (8 - 2 * (i % 4 + 1))
        rows.append(bytes([0]) + bytes(packed))
    ihdr = struct.pack(">IIBBBBB", 5, 2, 2, 3, 0, 0, 0)
    payload = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )
    got = decode_png(payload)
    pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
    expect = pal[np.array(idx)]
    assert (got == expect).all()


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    ftype=st.integers(min_value=0, max_value=4),
    interlace=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_16bit_roundtrip_any_filter_and_interlace(h, w, ftype, interlace, seed):
    """16-bit depth (r6): the encoder promotes by the spec's exact
    v*257 scaling, the decoder collapses big-endian samples to their
    high byte — bit-identical round trip under every filter type and
    both interlace modes (filters run over the 2-byte-sample stride,
    bpp = 6)."""
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    blob = encode_png(img, filter_type=ftype, interlace=interlace, bit_depth=16)
    # IHDR declares depth 16 (byte 24 of the file: 8-sig + 4-len +
    # 4-type + 8-dims)
    assert blob[24] == 16
    assert np.array_equal(decode_png(blob), img)
