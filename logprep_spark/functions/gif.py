"""Pure-Python GIF87a/89a codec (public spec: W3C GIF89a specification,
CompuServe GIF87a). Decode is real: logical screen descriptor, global/
local color tables, graphic-control transparency, full LZW with
variable code width and 4096-entry dictionary, 4-pass interlacing,
multi-frame walk. The encoder exists for test fixtures: spec-valid
"uncompressed" LZW (clear codes emitted before the code width would
grow — every symbol stays a literal root code), optional interlace.

Posture mirrors functions/jpeg.py: decode any baseline GIF a crawler
meets; animated GIFs expose every frame (decode_image takes frame 0).
"""

from __future__ import annotations

import struct


def _color_table(data: bytes, off: int, size_field: int) -> tuple[list, int]:
    n = 2 << size_field  # 2^(size+1) entries
    table = [tuple(data[off + 3 * i : off + 3 * i + 3]) for i in range(n)]
    return table, off + 3 * n


def _sub_blocks(data: bytes, off: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = data[off]
        off += 1
        if n == 0:
            return bytes(out), off
        out += data[off : off + n]
        off += n


def _lzw_decode(min_code_size: int, stream: bytes, expected: int) -> bytearray:
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    # dictionary: list of byte strings
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < expected:
        while nbits < code_size:
            if pos >= len(stream):
                return out  # truncated stream: return what decoded
            acc |= stream[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW: code {code} out of range")
        out += entry
        if prev is not None and len(table) >= (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(indices, height: int, width: int):
    out = [None] * height
    row = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, height, step):
            out[y] = indices[row * width : (row + 1) * width]
            row += 1
    flat = bytearray()
    for r in out:
        flat += r
    return flat


def decode_gif_animation(payload: bytes) -> tuple[list, list]:
    """(frames, delays_ms): every frame composited onto the logical
    screen plus its graphic-control delay (centiseconds -> ms; the
    0-delay convention renders as the de-facto 100 ms)."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    off = 13
    gct = None
    if packed & 0x80:
        gct, off = _color_table(payload, off, packed & 0x07)
    bg_rgb = gct[bg_idx] if gct and bg_idx < len(gct) else (0, 0, 0)
    screen = np.zeros((sh, sw, 3), dtype=np.uint8)
    screen[:, :] = bg_rgb
    frames = []
    delays = []
    transparent = None
    delay_ms = 100
    disposal = 0
    while off < len(payload):
        block = payload[off]
        off += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[off]
            off += 1
            data, off = _sub_blocks(payload, off)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags, delay_cs, tix = struct.unpack_from("<BHB", data, 0)
                transparent = tix if flags & 0x01 else None
                delay_ms = delay_cs * 10 if delay_cs else 100
                disposal = (flags >> 2) & 0x07
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, off)
        off += 9
        table = gct
        if ipacked & 0x80:
            table, off = _color_table(payload, off, ipacked & 0x07)
        if table is None:
            raise ValueError("GIF image with no color table")
        min_code = payload[off]
        off += 1
        stream, off = _sub_blocks(payload, off)
        idx = _lzw_decode(min_code, stream, w * h)
        if len(idx) < w * h:
            idx = idx + bytearray(w * h - len(idx))
        if ipacked & 0x40:
            idx = _deinterlace(bytes(idx), h, w)
        arr = np.frombuffer(bytes(idx), dtype=np.uint8).reshape(h, w)
        pal = np.array(
            [table[i] if i < len(table) else (0, 0, 0) for i in range(256)],
            dtype=np.uint8,
        )
        rgb = pal[arr]
        prev_screen = screen.copy() if disposal == 3 else None
        region = screen[top : top + h, left : left + w]
        if transparent is not None:
            mask = arr != transparent
            region[mask] = rgb[mask]
        else:
            region[:, :] = rgb
        frames.append(screen.copy())
        delays.append(delay_ms)
        # GCE disposal (flag bits 2-4) applies AFTER display, before
        # the next frame composites: 2 = restore the frame rect to the
        # background color, 3 = restore the screen as it was before
        # this frame; 0/1 leave the pixels in place
        if disposal == 2:
            screen[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3 and prev_screen is not None:
            screen = prev_screen
        transparent = None
        delay_ms = 100
        disposal = 0
    if not frames:
        raise ValueError("GIF contained no image data")
    return frames, delays


def decode_gif_frames(payload: bytes) -> list:
    """Every frame as an (H, W, 3) uint8 RGB numpy array."""
    return decode_gif_animation(payload)[0]


def decode_gif(payload: bytes):
    """First frame as (H, W, 3) uint8 RGB."""
    return decode_gif_frames(payload)[0]


def _lzw_encode_uncompressed(indices: bytes, min_code_size: int) -> bytes:
    """Spec-valid LZW stream where every symbol is a literal root
    code: a CLEAR is emitted whenever the (never-used) dictionary
    would force the code width past min+1 — the classic
    'uncompressed GIF' technique."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    cap = (1 << code_size) - end - 2  # symbols emittable before width grows
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    since_clear = 0
    for sym in indices:
        if since_clear >= max(cap, 1):
            put(clear)
            since_clear = 0
        put(sym)
        since_clear += 1
    put(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(arr, interlace: bool = False) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a single-frame GIF89a.
    Colors are quantized to the distinct colors present (≤256
    required — fixture images keep small palettes)."""
    import numpy as np

    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    size_field = 0
    while (2 << size_field) < len(colors):
        size_field += 1
    n_entries = 2 << size_field
    min_code = max(2, size_field + 1)
    indices = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            for y in range(start, h, step):
                rows.append(indices[y])
        indices = np.stack(rows)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_field & 7), 0, 0)
    for i in range(n_entries):
        out += bytes(colors[i]) if i < len(colors) else b"\x00\x00\x00"
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    out.append(min_code)
    stream = _lzw_encode_uncompressed(indices.tobytes(), min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(0x3B)
    return bytes(out)


def encode_gif_animation(frames, delays_ms) -> bytes:
    """Multi-frame GIF89a for fixtures: one global color table over
    the union palette (≤256), a graphic-control extension with the
    real centisecond delay ahead of every frame."""
    import numpy as np

    h, w = frames[0].shape[:2]
    union = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(union) > 256:
        raise ValueError("encode_gif_animation: more than 256 distinct colors")
    size_field = 0
    while (2 << size_field) < len(union):
        size_field += 1
    n_entries = 2 << size_field
    min_code = max(2, size_field + 1)
    lut = {tuple(c): i for i, c in enumerate(union)}
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_field & 7), 0, 0)
    for i in range(n_entries):
        out += bytes(union[i]) if i < len(union) else b"\x00\x00\x00"
    for frame, delay in zip(frames, delays_ms):
        out += bytes([0x21, 0xF9, 0x04, 0x00])
        out += struct.pack("<H", max(delay // 10, 1))
        out += bytes([0x00, 0x00])
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(min_code)
        idx = bytes(lut[tuple(p)] for p in frame.reshape(-1, 3))
        stream = _lzw_encode_uncompressed(idx, min_code)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
