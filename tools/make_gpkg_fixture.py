#!/usr/bin/env python3
"""Dev-side fixture generator: builds src/test/resources/fixture.gpkg with
python's stdlib sqlite3 (no GDAL). The file exercises the pure-JVM SQLite
reader: multiple leaf pages (interior-page walk), an overflow-chain payload,
NULL geometries, and all GeoPackage metadata tables."""
import sqlite3, struct, os, sys

out = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/fixture.gpkg"
os.makedirs(os.path.dirname(out), exist_ok=True)
if os.path.exists(out):
    os.remove(out)

def wkb_point(x, y):
    return struct.pack("<BIdd", 1, 1, x, y)

def wkb_polygon(rings):
    b = struct.pack("<BII", 1, 3, len(rings))
    for r in rings:
        b += struct.pack("<I", len(r)) + b"".join(struct.pack("<dd", x, y) for x, y in r)
    return b

def gpb(wkb, srs=28992, env=None):
    flags = 0x01  # little-endian
    head = b""
    if env is not None:
        flags |= 0x02  # envelope [minx maxx miny maxy]
        head = struct.pack("<4d", *env)
    return struct.pack("<2sBBi", b"GP", 0, flags, srs) + head + wkb

con = sqlite3.connect(out)
con.execute("PRAGMA application_id = 1196444487")  # 'GPKG'
con.execute("PRAGMA user_version = 10300")
con.execute("""CREATE TABLE gpkg_spatial_ref_sys (
  srs_name TEXT NOT NULL, srs_id INTEGER NOT NULL PRIMARY KEY,
  organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
  definition TEXT NOT NULL, description TEXT)""")
con.execute("INSERT INTO gpkg_spatial_ref_sys VALUES ('RD New', 28992, 'EPSG', 28992, 'undefined', NULL)")
con.execute("""CREATE TABLE gpkg_contents (
  table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
  identifier TEXT UNIQUE, description TEXT DEFAULT '',
  last_change DATETIME NOT NULL DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
  min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)""")
con.execute("""CREATE TABLE gpkg_geometry_columns (
  table_name TEXT NOT NULL, column_name TEXT NOT NULL,
  geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
  z TINYINT NOT NULL, m TINYINT NOT NULL,
  CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))""")
con.execute("""CREATE TABLE plots (
  fid INTEGER PRIMARY KEY AUTOINCREMENT,
  geom BLOB, name TEXT, value DOUBLE, count INTEGER, note TEXT)""")
con.execute("INSERT INTO gpkg_contents (table_name, data_type, identifier, srs_id, last_change) "
            "VALUES ('plots', 'features', 'plots', 28992, '2024-01-01T00:00:00.000Z')")
con.execute("INSERT INTO gpkg_geometry_columns VALUES ('plots', 'geom', 'GEOMETRY', 28992, 0, 0)")

rows = []
for i in range(2000):
    if i % 97 == 0:
        g = None  # NULL geometry
    elif i % 3 == 0:
        s = (i % 7) + 1
        ring = [(i, 0), (i + s, 0), (i + s, s), (i, s), (i, 0)]
        g = gpb(wkb_polygon([ring]), env=(i, i + s, 0, s))
    else:
        g = gpb(wkb_point(i * 1.5, -i * 0.25))
    note = ("lorem-" + str(i)) * (400 if i == 1234 else 1)  # one overflow row
    rows.append((g, f"plot{i}", i * 0.125, i * 3, note))
con.executemany("INSERT INTO plots (geom, name, value, count, note) VALUES (?,?,?,?,?)", rows)
con.commit()
con.close()
sz = os.path.getsize(out)
print(f"wrote {out}: {sz} bytes, {sz // 4096} pages")
