#!/usr/bin/env python3
"""Dev-side fixture generator: BigTIFF (version 43, 8-byte offsets,
20-byte IFD entries, LONG8 offset arrays) and big-endian classic TIFF
files, written from the published TIFF 6.0 / BigTIFF specs independently
of the Scala reader. Covers the byte-order-sensitive paths: multi-byte
sample decode, predictor-2 differencing in BE, inline vs out-of-line
value resolution (including a short inline ASCII GDAL_NODATA), and
DEFLATE segments.

Writes src/test/resources/{bigtiff_le_f64,bigtiff_be_u16,classic_be_u8}.tif
with deterministic pixel formulas (asserted in GeoTiffSpec).
"""
import os
import struct
import sys
import zlib

outdir = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources"


def fpdiff(row: bytes, bytes_per: int) -> bytes:
    """Predictor 3 (TechNote 3): split the row into byte planes (MSB plane
    first), then byte-wise horizontal differencing over the planar row."""
    n = len(row) // bytes_per
    planes = bytearray(len(row))
    for x in range(n):
        for k in range(bytes_per):  # k counts from the LSB of an LE sample
            planes[(bytes_per - 1 - k) * n + x] = row[x * bytes_per + k]
    out = bytearray(planes)
    for i in range(len(out) - 1, 0, -1):
        out[i] = (out[i] - out[i - 1]) & 0xFF
    return bytes(out)


def hdiff(row: bytes, bytes_per: int, e: str) -> bytes:
    n = len(row) // bytes_per
    order = "little" if e == "<" else "big"
    vals = [int.from_bytes(row[i * bytes_per:(i + 1) * bytes_per], order)
            for i in range(n)]
    mod = 1 << (8 * bytes_per)
    out = bytearray()
    prev = 0
    for i, v in enumerate(vals):
        d = v if i == 0 else (v - prev) % mod
        out += d.to_bytes(bytes_per, order)
        prev = v
    return bytes(out)


def write_tiff(path, w, h, bits, sample_format, pixels, rows_per_strip,
               endian="<", big=False, compression=1, predictor=1,
               nodata=None, epsg=28992, origin=(135000.0, 456000.0),
               cell=(0.5, 0.5)):
    e = endian
    bytes_per = bits // 8

    def pack(v):
        if sample_format == 3:
            return struct.pack(e + ("d" if bits == 64 else "f"), v)
        return int(v).to_bytes(bytes_per, "little" if e == "<" else "big",
                               signed=(sample_format == 2))

    strips = []
    y = 0
    while y < h:
        rows = min(rows_per_strip, h - y)
        raw = bytearray()
        for r in range(rows):
            row = b"".join(pack(pixels(x, y + r)) for x in range(w))
            if predictor == 2:
                raw += hdiff(row, bytes_per, e)
            elif predictor == 3:
                assert e == "<", "fp predictor fixture is little-endian"
                raw += fpdiff(row, bytes_per)
            else:
                raw += row
        strips.append(zlib.compress(bytes(raw)) if compression == 8 else bytes(raw))
        y += rows

    # layout: header + IFD + out-of-line data + strips
    hdr_size = 16 if big else 8
    entry_size = 20 if big else 12
    count_size = 8 if big else 2
    next_size = 8 if big else 4
    inline_cap = 8 if big else 4
    off_type = 16 if big else 4       # LONG8 vs LONG for offset arrays
    off_fmt = "Q" if big else "I"

    type_sizes = {1: 1, 2: 1, 3: 2, 4: 4, 12: 8, 16: 8}

    tag_specs = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [bits]),
        (259, 3, [compression]),
        (273, off_type, None),  # strip offsets, patched later
        (278, 4, [rows_per_strip]),
        (279, off_type, [len(s) for s in strips]),
        (317, 3, [predictor]),
        (339, 3, [sample_format]),
        (33550, 12, [cell[0], cell[1], 0.0]),
        (33922, 12, [0.0, 0.0, 0.0, origin[0], origin[1], 0.0]),
        (34735, 3, [1, 1, 0, 1, 3072, 0, 1, epsg]),
    ]
    if nodata is not None:
        nd = nodata.encode("ascii") + b"\x00"
        tag_specs.append((42113, 2, list(nd)))
    tag_specs.sort()

    n_tags = len(tag_specs)
    ifd_size = count_size + n_tags * entry_size + next_size
    data_base = hdr_size + ifd_size

    def fmt_of(typ):
        return {1: "B", 2: "B", 3: "H", 4: "I", 12: "d", 16: "Q"}[typ]

    extra = bytearray()
    entries = []
    strip_off_patch = None  # (in_extra, rel) or (inline, entry_index)
    for idx, (tag, typ, values) in enumerate(tag_specs):
        if values is None:  # strip offsets: reserve space, patch later
            values = [0] * len(strips)
        count = len(values)
        byte_len = type_sizes[typ] * count
        packed = b"".join(struct.pack(e + fmt_of(typ), v) for v in values)
        if byte_len <= inline_cap:
            value_field = packed + b"\x00" * (inline_cap - byte_len)
            if tag == 273:
                strip_off_patch = ("inline", idx)
        else:
            rel = len(extra)
            extra.extend(packed)
            if tag == 273:
                strip_off_patch = ("extra", rel)
            value_field = struct.pack(e + off_fmt, data_base + rel)
        entries.append((tag, typ, count, value_field))

    strip_base = data_base + len(extra)
    offs = []
    at = strip_base
    for s in strips:
        offs.append(at)
        at += len(s)
    packed_offs = b"".join(struct.pack(e + off_fmt, o) for o in offs)
    where, loc = strip_off_patch
    if where == "extra":
        extra[loc:loc + len(packed_offs)] = packed_offs
    else:
        tag, typ, count, _ = entries[loc]
        entries[loc] = (tag, typ, count,
                        packed_offs + b"\x00" * (inline_cap - len(packed_offs)))

    with open(path, "wb") as f:
        bom = b"II" if e == "<" else b"MM"
        if big:
            f.write(bom + struct.pack(e + "HHHQ", 43, 8, 0, hdr_size))
            f.write(struct.pack(e + "Q", n_tags))
        else:
            f.write(bom + struct.pack(e + "HI", 42, hdr_size))
            f.write(struct.pack(e + "H", n_tags))
        for tag, typ, count, value_field in entries:
            f.write(struct.pack(e + ("HHQ" if big else "HHI"), tag, typ, count))
            f.write(value_field)
        f.write(struct.pack(e + ("Q" if big else "I"), 0))  # no next IFD
        f.write(extra)
        for s in strips:
            f.write(s)
    print(f"wrote {path} ({os.path.getsize(path)} bytes, {len(strips)} strips)")


os.makedirs(outdir, exist_ok=True)

# BigTIFF little-endian float64, DEFLATE, LONG8 offset arrays
write_tiff(os.path.join(outdir, "bigtiff_le_f64.tif"), 40, 30, 64, 3,
           lambda x, y: x * 1.5 - y * 0.75, 8, endian="<", big=True,
           compression=8)

# BigTIFF BIG-endian uint16, predictor 2 over BE samples, DEFLATE
write_tiff(os.path.join(outdir, "bigtiff_be_u16.tif"), 48, 32, 16, 1,
           lambda x, y: (x * 523 + y * 7817) % 65521, 8, endian=">",
           big=True, compression=8, predictor=2)

# classic big-endian uint8, uncompressed, with a short INLINE ASCII
# GDAL_NODATA ("7\0" = 2 bytes) — the inline-value resolution edge
write_tiff(os.path.join(outdir, "classic_be_u8.tif"), 60, 25, 8, 1,
           lambda x, y: (x * 11 + y * 29) % 251, 8, endian=">",
           nodata="7")

# classic LE float32, floating-point predictor (3) + DEFLATE — the byte
# planes make smooth float gradients compressible; values chosen to be
# exactly float32-representable so the formula pins them bit-for-bit
write_tiff(os.path.join(outdir, "fp_pred_f32.tif"), 64, 20, 32, 3,
           lambda x, y: x * 0.25 - y * 8.5, 8, endian="<",
           compression=8, predictor=3)

# classic LE float64, predictor 3, multi-strip
write_tiff(os.path.join(outdir, "fp_pred_f64.tif"), 30, 22, 64, 3,
           lambda x, y: x * 1.125 + y * 0.0625 - 100.0, 6, endian="<",
           compression=8, predictor=3)
