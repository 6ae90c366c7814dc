#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare: runs each
oracle_sql.json query against the same parquet tables and diffs against the
Verify parquet dumps (column-name-sorted, row-sorted, value compare)."""
import sys, json, glob, warnings
import duckdb
import pandas as pd
warnings.filterwarnings("ignore", category=RuntimeWarning)

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

sqls = json.load(open(f"{outdir}/oracle_sql.json"))
ok = mis = err = 0
for name in sorted(sqls):
    sql = sqls[name]
    try:
        got = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        want = con.execute(sql).df()
        # Type gate calibrated to the driver's hasher (r6 evidence): int32 vs
        # int64 hashes equal (9 such queries were driver-green), but a HUGEINT
        # oracle column — which pandas lands as float64 — hashed red against
        # Spark's int64 even with bit-identical values. So a *kind* divergence
        # (int vs float/object) on either side is fatal here, before the
        # normalization below collapses it.
        oracle_desc = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        type_bad = []
        for c in sorted(set(got.columns) & set(want.columns)):
            gk, wk = got[c].dtype, want[c].dtype
            if (gk.kind in "iu" or wk.kind in "iu") and gk.kind != wk.kind:
                type_bad.append(f"{c}: spark={gk} oracle={wk} (duckdb {oracle_desc.get(c)})")
            elif str(oracle_desc.get(c, "")).startswith(("HUGEINT", "UHUGEINT")):
                # pandas collapsed it to the same dtype, but warn: the driver
                # may hash the arrow decimal128 differently — prefer a CAST.
                print(f"WARN {name}.{c}: oracle DuckDB type {oracle_desc[c]} "
                      f"(pandas {wk}) — consider an explicit CAST")
        def norm(df):
            df = df.reindex(sorted(df.columns), axis=1)
            for c in df.columns:
                if df[c].dtype.kind in "fc":
                    df[c] = df[c].round(9)
                if df[c].dtype.kind in "iu":
                    df[c] = df[c].astype("float64")
                if str(df[c].dtype).startswith("datetime"):
                    df[c] = df[c].astype("datetime64[us]")
            return df.sort_values(list(df.columns)).reset_index(drop=True)
        g, w = norm(got), norm(want)
        if type_bad:
            print(f"MISMATCH-TYPE {name}: " + "; ".join(type_bad))
            mis += 1
        elif list(g.columns) != list(w.columns):
            print(f"MISMATCH-COLS {name}: got {list(g.columns)} want {list(w.columns)}")
            mis += 1
        elif len(g) != len(w):
            print(f"MISMATCH-ROWS {name}: got {len(g)} want {len(w)}")
            mis += 1
        elif not g.equals(w):
            neq = (g != w) & ~(g.isna() & w.isna())
            bad = neq.any(axis=1)
            print(f"MISMATCH-VALS {name}: {bad.sum()}/{len(g)} rows differ; first:")
            print(pd.concat([g[bad].head(3).add_suffix("_got"),
                             w[bad].head(3).add_suffix("_want")], axis=1).to_string())
            mis += 1
        else:
            ok += 1
            print(f"OK {name} ({len(g)} rows)")
    except Exception as e:
        print(f"ERROR {name}: {str(e)[:300]}")
        err += 1
# queries without oracles: rows-only check
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = d.rstrip("/").split("/")[-1]
    if name not in sqls:
        try:
            n = con.execute(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"ROWS-ONLY {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
        except Exception as e:
            print(f"ERROR {name}: {str(e)[:200]}")
print(f"\n== {ok} ok, {mis} mismatch, {err} error")
