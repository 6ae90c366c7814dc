#!/usr/bin/env python3
"""Dev-side fixture generator: LZW-compressed GeoTIFFs written with an
independent, spec-derived TIFF-LZW encoder (TIFF 6.0 §13: MSB-first bit
packing, 9-bit initial width, ClearCode 256 / EOI 257, early-change width
bumps) plus predictor-2 horizontal differencing. The Scala reader must
decode these bit-exactly; the two implementations meet only at the spec.

Writes src/test/resources/lzw_{uint8,uint16,f64}.tif with deterministic
pixel formulas (asserted in GeoTiffSpec).
"""
import struct, os, sys

outdir = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources"


def lzw_encode(data: bytes) -> bytes:
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out = bytearray()
    acc = 0
    nacc = 0

    def emit(code):
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            out.append((acc >> (nacc - 8)) & 0xFF)
            nacc -= 8

    emit(256)  # streams begin with a ClearCode
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        # the decoder's table lags the encoder's by one define, so the
        # encoder bumps one define later than the decoder's early-change
        # point (decoder: next-to-define == (1<<w)-1) for the SAME stream
        # position — verified by round-trip against the decoder rule
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:  # table (nearly) full: reset
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(257)
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def hdiff(row_bytes: bytes, bytes_per: int) -> bytes:
    """Predictor 2: store each sample as the little-endian delta from its
    left neighbour."""
    n = len(row_bytes) // bytes_per
    vals = [int.from_bytes(row_bytes[i * bytes_per:(i + 1) * bytes_per],
                           "little") for i in range(n)]
    mod = 1 << (8 * bytes_per)
    out = bytearray()
    prev = 0
    for i, v in enumerate(vals):
        d = v if i == 0 else (v - prev) % mod
        out += d.to_bytes(bytes_per, "little")
        prev = v
    return bytes(out)


def write_tiff(path, w, h, bits, sample_format, pixels, rows_per_strip,
               predictor, epsg=28992, origin=(135000.0, 456000.0),
               cell=(0.5, 0.5)):
    bytes_per = bits // 8
    # pack pixel rows
    def pack(v):
        if sample_format == 3:
            return struct.pack("<d" if bits == 64 else "<f", v)
        return int(v).to_bytes(bytes_per, "little", signed=(sample_format == 2))

    strips = []
    y = 0
    while y < h:
        rows = min(rows_per_strip, h - y)
        raw = bytearray()
        for r in range(rows):
            row = b"".join(pack(pixels(x, y + r)) for x in range(w))
            raw += hdiff(row, bytes_per) if predictor == 2 else row
        strips.append(lzw_encode(bytes(raw)))
        y += rows

    # layout: header(8) + IFD + out-of-line arrays + strip data
    tags = []  # (tag, type, count, value_or_offset_placeholder)
    extra = bytearray()  # out-of-line data, offset-fixed later
    base_guess = 8

    def defer(fmt, values):
        off = len(extra)
        for v in values:
            extra.extend(struct.pack(fmt, v))
        return off  # relative; fixed after IFD size known

    n_tags = 12
    ifd_size = 2 + n_tags * 12 + 4
    data_base = base_guess + ifd_size

    strip_off_rel = defer("<I", [0] * len(strips))  # patched below
    strip_cnt_rel = defer("<I", [len(s) for s in strips])
    scale_rel = defer("<d", [cell[0], cell[1], 0.0])
    tie_rel = defer("<d", [0.0, 0.0, 0.0, origin[0], origin[1], 0.0])
    geokey_rel = defer("<H", [1, 1, 0, 1, 3072, 0, 1, epsg])

    strip_data_base = data_base + len(extra)
    offs = []
    at = strip_data_base
    for s in strips:
        offs.append(at)
        at += len(s)
    for i, o in enumerate(offs):
        extra[strip_off_rel + 4 * i:strip_off_rel + 4 * (i + 1)] = \
            struct.pack("<I", o)

    def off_of(rel):
        return data_base + rel

    def tag(t, typ, count, val):
        tags.append(struct.pack("<HHII", t, typ, count, val))

    tag(256, 4, 1, w)
    tag(257, 4, 1, h)
    tag(258, 3, 1, bits)
    tag(259, 3, 1, 5)  # LZW
    # count-1 LONG values live inline in the tag; arrays live out of line
    tag(273, 4, len(strips),
        offs[0] if len(strips) == 1 else off_of(strip_off_rel))
    tag(278, 4, 1, rows_per_strip)
    tag(279, 4, len(strips),
        len(strips[0]) if len(strips) == 1 else off_of(strip_cnt_rel))
    tag(317, 3, 1, predictor)
    tag(339, 3, 1, sample_format)
    tag(33550, 12, 3, off_of(scale_rel))
    tag(33922, 12, 6, off_of(tie_rel))
    tag(34735, 3, 8, off_of(geokey_rel))
    assert len(tags) == n_tags

    with open(path, "wb") as f:
        f.write(b"II*\x00" + struct.pack("<I", 8))
        f.write(struct.pack("<H", n_tags))
        for t in tags:
            f.write(t)
        f.write(struct.pack("<I", 0))  # no next IFD
        f.write(extra)
        for s in strips:
            f.write(s)
    print(f"wrote {path} ({os.path.getsize(path)} bytes, "
          f"{len(strips)} strips)")


os.makedirs(outdir, exist_ok=True)
write_tiff(os.path.join(outdir, "lzw_uint8.tif"), 100, 40, 8, 1,
           lambda x, y: (x * 7 + y * 13) % 251, 16, predictor=2)
write_tiff(os.path.join(outdir, "lzw_uint16.tif"), 64, 48, 16, 1,
           lambda x, y: (x * 531 + y * 7919) % 65521, 16, predictor=2)
write_tiff(os.path.join(outdir, "lzw_f64.tif"), 60, 30, 64, 3,
           lambda x, y: x * 0.5 + y * 1.25, 8, predictor=1)


# high-entropy single-strip uint8: the LZW table walks through every code
# width (9→12 bits) and hits the 4094-entry reset — the zones where
# early-change bugs live. LCG reproduced verbatim in GeoTiffSpec.
def lcg_byte(x, y, w=128):
    s = (y * w + x + 1) & 0x7FFFFFFF
    for _ in range(2):
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
    return (s >> 16) & 0xFF


write_tiff(os.path.join(outdir, "lzw_noise.tif"), 128, 128, 8, 1,
           lcg_byte, 128, predictor=1)

