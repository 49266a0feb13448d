#!/usr/bin/env python3
"""Targeted single-key oracle compare: python3 tools/check_one.py <sfDir> <verifyOutDir> <key> [key...]"""
import sys, json, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), [cols[i] for i in order]

def nonscalar_cols(df):
    """Columns holding list/array/dict cells — the driver's pandas hasher
    errors on these (r15: vs_ingest_w2v), so FAIL them loudly."""
    return [c for c in df.columns if df[c].dtype.kind == "O" and any(
        hasattr(x, "__len__") and not isinstance(x, (str, bytes))
        for x in df[c] if x is not None)]

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-12 * max(1.0, abs(fa), abs(fb))
    return a == b or str(a) == str(b)

def main(sf_dir, out_dir, keys):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    rc = 0
    for name in keys:
        sql = oracle[name]
        odf = con.execute(sql).df()
        orows, ocols = canon(odf.values.tolist(), list(odf.columns))
        sdf = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        srows, scols = canon(sdf.values.tolist(), list(sdf.columns))
        ns = sorted(set(nonscalar_cols(sdf)) | set(nonscalar_cols(odf)))
        if ns:
            print(f"FAIL {name}: non-scalar cells in {ns} — driver-unhashable"); rc = 1; continue
        if ocols != scols:
            print(f"FAIL {name}: schema {scols} vs oracle {ocols}"); rc = 1; continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows {len(srows)} vs oracle {len(orows)}"); rc = 1; continue
        bad = [(s, o) for s, o in zip(srows, orows) if not all(eq(a, b) for a, b in zip(s, o))]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: {bad[0]}"); rc = 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
    return rc

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3:]))
