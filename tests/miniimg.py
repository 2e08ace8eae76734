"""Minimal REAL image codec fixtures — zero third-party dependencies.

This container ships no codec libraries (no Pillow), so the
"real-encoder" branch of the multimodal ladder tests would otherwise
skip forever. These encoders emit fully VALID streams derived from the
public specs — not hand-planted header bytes:

* ``encode_png``    — PNG (ISO/IEC 15948): 8-bit RGB, filter 0 rows,
  one zlib IDAT, CRC'd chunks. Any PNG decoder accepts it.
* ``decode_png``    — the matching REAL decode: walks chunks, inflates
  the IDAT, verifies the unfiltered pixel payload length. Used to
  drive multimodal.decode_image's injectable decoder end-to-end.
* ``encode_jpeg``   — JPEG (ITU-T T.81): grayscale, all-zero DCT
  coefficients (a uniform mid-gray image), custom one-symbol Huffman
  tables (DC symbol 0 and AC EOB each coded as the single bit '0' —
  T.81 permits any table that is not all-ones), so every 8x8 block
  encodes as exactly two bits. baseline=SOF0 single scan;
  progressive=SOF2 with a DC scan (Ss=0,Se=0) then an AC scan
  (Ss=1,Se=63), per-block EOB. Entropy segments are valid for any
  conforming decoder; no 0xFF bytes occur, so no stuffing is needed
  (the pad path still stuffs, for safety under table changes).

Kept under tests/ on purpose: this is test fixture machinery, not an
engine operator (the engine's parsers live in
etl_hero_spark/multimodal.py and never depend on these).
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int, height: int, rgb: tuple[int, int, int] = (128, 128, 128)
) -> bytes:
    """A real, decodable 8-bit RGB PNG of the given size (uniform
    color, filter-type-0 rows, single IDAT)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = b"\x00" + bytes(rgb) * width
    idat = zlib.compress(row * height)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int]:
    """REAL decode of the fixture-scope PNG subset (8-bit RGB, filter
    0): walk chunks, inflate the IDAT stream, verify every row's
    filter byte and the exact pixel payload length. Raises on corrupt
    or non-PNG bytes — callers map that to NULL dimensions."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, width, height, idat = 8, None, None, b""
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated chunk")
        pos += 12 + ln
        if typ == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            if (depth, ctype) != (8, 2):
                raise ValueError("outside the fixture subset")
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    stride = width * 3 + 1
    if len(raw) != stride * height:
        raise ValueError("pixel payload length mismatch")
    for y in range(height):
        if raw[y * stride] != 0:
            raise ValueError("outside the fixture subset (filter != 0)")
    return width, height


# ---------------------------------------------------------------------------
# JPEG (ITU-T T.81)
# ---------------------------------------------------------------------------


def _marker(code: int, payload: bytes = b"") -> bytes:
    if not payload:
        return bytes([0xFF, code])
    return bytes([0xFF, code]) + struct.pack(">H", len(payload) + 2) + payload


def _dht(table_class: int, table_id: int, code: int) -> bytes:
    """A one-symbol Huffman table: the symbol ``code`` gets the single
    1-bit codeword '0' (T.81 only forbids the all-ones codeword)."""
    bits = bytes([1] + [0] * 15)  # one code of length 1, none longer
    return _marker(0xC4, bytes([table_class << 4 | table_id]) + bits + bytes([code]))


def _entropy(bits: str) -> bytes:
    """Pack a bitstring MSB-first, pad with 1s, stuff 0x00 after 0xFF."""
    bits += "1" * (-len(bits) % 8)
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = int(bits[i : i + 8], 2)
        out.append(b)
        if b == 0xFF:
            out.append(0x00)
    return bytes(out)


def encode_jpeg(width: int, height: int, progressive: bool = False) -> bytes:
    """A real, decodable grayscale JPEG of the given size: a uniform
    mid-gray image (every DCT coefficient zero after level shift), so
    each 8x8 block's entropy coding is DC-diff-0 + EOB. Baseline emits
    SOF0 + one scan; progressive emits SOF2 + a DC scan + an AC scan."""
    n_blocks = -(-width // 8) * -(-height // 8)
    app0 = _marker(
        0xE0, b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    dqt = _marker(0xDB, bytes([0]) + bytes([16] * 64))
    sof = _marker(
        0xC2 if progressive else 0xC0,
        bytes([8])
        + struct.pack(">HH", height, width)
        + bytes([1, 1, 0x11, 0]),  # 1 component, 1:1 sampling, DQT 0
    )
    dht = _dht(0, 0, 0x00) + _dht(1, 0, 0x00)  # DC cat 0; AC EOB
    out = b"\xff\xd8" + app0 + dqt + sof + dht
    if progressive:
        # DC scan (Ss=0, Se=0, Ah=0, Al=0): one 1-bit '0' per block
        out += _marker(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
        out += _entropy("0" * n_blocks)
        # AC scan (Ss=1, Se=63): per-block EOB (run-of-1), no AC table
        # extra bits needed for all-zero blocks
        out += _marker(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
        out += _entropy("0" * n_blocks)
    else:
        # sequential scan: per block DC cat 0 ('0') then EOB ('0')
        out += _marker(0xDA, bytes([1, 1, 0x00, 0, 63, 0x00]))
        out += _entropy("00" * n_blocks)
    return out + b"\xff\xd9"
