"""Pure-stdlib image decoding fallback.

The container ships no image libraries, but the multimodal real lane
should still RUN (VERDICT r3 item 8): PNG needs only zlib (stdlib) for
a full pixel decode, and JPEG/GIF dimensions are plain header parses
(public format specs: PNG RFC 2083, JPEG ISO/IEC 10918 SOF markers,
GIF89a logical screen descriptor).

Exposed surface: `decode_features(data) -> (width, height,
mean_intensity | None)`. PNG returns the exact grayscale mean
(ITU-R 601 luma, matching PIL's "L" conversion weights); JPEG/GIF
return header dimensions with mean=None (entropy-coded payloads need a
real codec).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# bytes per pixel by PNG color type at bit depth 8
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Undo per-scanline filtering (PNG spec §6): each row starts with
    a filter-type byte; reconstruction references the previous row."""
    stride = width * bpp
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        pos += 1
        row = bytearray(raw[pos:pos + stride])
        pos += stride
        if ftype == 1:    # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out.extend(row)
        prev = row
    return out


def decode_png(data: bytes) -> tuple[int, int, float]:
    """Full PNG decode: dimensions + exact grayscale mean in [0, 1].
    Supports bit depth 8, color types 0/2/3/4/6, no interlace."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    depth = ctype = interlace = None
    palette = b""
    idat = bytearray()
    while pos + 8 <= len(data):
        length, tag = struct.unpack(">I4s", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            palette = body
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if depth != 8 or interlace != 0 or ctype not in _CHANNELS:
        raise ValueError(f"PNG: unsupported (depth={depth}, "
                         f"color={ctype}, interlace={interlace})")
    bpp = _CHANNELS[ctype]
    pixels = _unfilter(zlib.decompress(bytes(idat)), width, height, bpp)
    total = 0.0
    n = width * height
    if ctype == 0:
        total = float(sum(pixels))
    elif ctype == 4:  # gray + alpha
        total = float(sum(pixels[0::2]))
    elif ctype == 3:  # palette -> expand to RGB luma
        for idx in pixels:
            r, g, b = palette[idx * 3:idx * 3 + 3]
            total += (r * 299 + g * 587 + b * 114) / 1000.0
    else:             # 2 = RGB, 6 = RGBA
        for i in range(0, len(pixels), bpp):
            r, g, b = pixels[i], pixels[i + 1], pixels[i + 2]
            total += (r * 299 + g * 587 + b * 114) / 1000.0
    return width, height, total / (n * 255.0)


def jpeg_size(data: bytes) -> tuple[int, int]:
    """Walk JFIF segments to the first SOFn frame header."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        # SOF0-15 minus DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
            return w, h
        pos += 2 + seglen
    raise ValueError("JPEG: no SOF marker found")


def gif_size(data: bytes) -> tuple[int, int]:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", data[6:10])
    return w, h


def decode_features(data: bytes) -> tuple[int, int, float | None]:
    """Dispatch on magic bytes. PNG: full decode with exact mean.
    JPEG/GIF: header dimensions, mean=None (needs a real codec)."""
    if data.startswith(PNG_SIG):
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        w, h = jpeg_size(data)
        return w, h, None
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = gif_size(data)
        return w, h, None
    raise ValueError("unsupported image format (magic bytes unrecognized)")


# -- test/fixture helper ----------------------------------------------------

def encode_png(rows: list[list[tuple[int, int, int]]],
               filters: list[int] | None = None) -> bytes:
    """Minimal RGB PNG encoder for fixtures: applies the given filter
    type per row (default cycles 0-4 to exercise every unfilter
    branch in tests)."""
    height = len(rows)
    width = len(rows[0])
    bpp = 3
    stride = width * bpp
    flat = [bytearray(b for px in r for b in px) for r in rows]
    raw = bytearray()
    prev = bytearray(stride)
    for y, row in enumerate(flat):
        ftype = (filters[y % len(filters)] if filters else y % 5)
        raw.append(ftype)
        enc = bytearray(row)
        if ftype == 1:
            for i in range(stride - 1, bpp - 1, -1):
                enc[i] = (row[i] - row[i - bpp]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                enc[i] = (row[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                enc[i] = (row[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                enc[i] = (row[i] - _paeth(left, prev[i], ul)) & 0xFF
        raw.extend(enc)
        prev = row

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))
