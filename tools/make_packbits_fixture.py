#!/usr/bin/env python3
"""Dev-side fixture generator: PackBits-compressed GeoTIFFs written with an
independent, spec-derived encoder (TIFF 6.0 §9: literal runs [n, bytes...]
for n in [0,127] meaning n+1 literals; repeat runs [257-cnt, byte] for
2..128 repeats; rows packed separately, runs never cross row boundaries).
The Scala reader must decode these byte-exactly; the two implementations
meet only at the spec.

Writes src/test/resources/packbits_{uint8,f64}.tif with deterministic
pixel formulas (asserted in GeoTiffSpec).
"""
import struct, os, sys

outdir = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources"


def packbits_encode_row(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        # find run length of equal bytes at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        run = j - i
        if run >= 2:
            out.append(257 - run)  # two's-complement -(run-1)
            out.append(row[i])
            i = j
        else:
            # literal stretch: until the next 3+ repeat (2-byte runs are
            # cheaper folded into the literal) or 128 bytes
            lit_start = i
            i += 1
            while i < n and i - lit_start < 128:
                j = i + 1
                while j < n and j - i < 128 and row[j] == row[i]:
                    j += 1
                if j - i >= 3:
                    break
                i = j
            out.append(i - lit_start - 1)
            out.extend(row[lit_start:i])
    return bytes(out)


def packbits_encode(raw: bytes, row_bytes: int) -> bytes:
    out = bytearray()
    for r in range(0, len(raw), row_bytes):
        out.extend(packbits_encode_row(raw[r:r + row_bytes]))
    return bytes(out)


def write_tiff(path, w, h, bits, sample_format, pixels, rows_per_strip,
               epsg=28992, origin=(135000.0, 456000.0), cell=(0.5, 0.5)):
    bytes_per = bits // 8

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
            raw += b"".join(pack(pixels(x, y + r)) for x in range(w))
        strips.append(packbits_encode(bytes(raw), w * bytes_per))
        y += rows

    tags = []
    extra = bytearray()

    def defer(fmt, values):
        off = len(extra)
        for v in values:
            extra.extend(struct.pack(fmt, v))
        return off

    n_tags = 11
    ifd_size = 2 + n_tags * 12 + 4
    data_base = 8 + ifd_size

    strip_off_rel = defer("<I", [0] * len(strips))
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
    tag(259, 3, 1, 32773)  # PackBits
    tag(273, 4, len(strips),
        offs[0] if len(strips) == 1 else off_of(strip_off_rel))
    tag(278, 4, 1, rows_per_strip)
    tag(279, 4, len(strips),
        len(strips[0]) if len(strips) == 1 else off_of(strip_cnt_rel))
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
        f.write(struct.pack("<I", 0))
        f.write(extra)
        for s in strips:
            f.write(s)
    print(f"wrote {path} ({os.path.getsize(path)} bytes, "
          f"{len(strips)} strips)")


os.makedirs(outdir, exist_ok=True)

# runs-heavy uint8: flat plateaus (repeat runs), sharp edges (literals),
# exact 128-byte plateau spans to hit the max-run boundary
write_tiff(os.path.join(outdir, "packbits_uint8.tif"), 200, 60, 8, 1,
           lambda x, y: (x // 40) * 50 + (7 if (x * 31 + y * 17) % 23 == 0 else 0),
           16)

# float64 gradient: little repetition, mostly literal runs across the
# 8-byte sample boundary
write_tiff(os.path.join(outdir, "packbits_f64.tif"), 50, 40, 64, 3,
           lambda x, y: x * 0.25 - y * 2.0 + (1.0 if x == y else 0.0),
           8)
