#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
Reads oracle_sql.json, registers each table parquet as a view, runs the
oracle SQL, loads the Spark result parquet, sorts columns by name and
rows by all values, and compares cell-by-cell.
"""
import sys, json, glob, math

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    # sort columns by name, then rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t)), [cols[i] for i in order]

def nonscalar_cols(df):
    """Columns holding list/array/dict cells. The DRIVER's pandas hasher
    cannot sort/factorize such cells and errors the whole key (r15:
    vs_ingest_w2v shipped green locally because eq() stringified arrays,
    then red in the driver) — so the local gate must FAIL them loudly,
    never stringify-pass them."""
    bad = []
    for c in df.columns:
        if df[c].dtype.kind == "O" and any(
                hasattr(x, "__len__") and not isinstance(x, (str, bytes))
                for x in df[c] if x is not None):
            bad.append(c)
    return bad

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

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        ocols = list(odf.columns)
        orows = [tuple(r) for r in odf.itertuples(index=False)]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").df()
        scols = list(sdf.columns)
        srows = [tuple(r) for r in sdf.itertuples(index=False)]
        ns = sorted(set(nonscalar_cols(sdf)) | set(nonscalar_cols(odf)))
        if ns:
            print(f"FAIL {name}: non-scalar cells in {ns} — the driver's "
                  f"pandas hasher cannot hash array/map/struct columns")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        # Dtype-family check: the driver's pandas hasher distinguishes
        # int64 from float64 even when values compare equal (e.g. an
        # uncast DuckDB HUGEINT window sum renders float64). Mirror that
        # strictness here so the class of bug is caught locally.
        fam = lambda k: {"i": "int", "u": "int", "f": "float"}.get(k, k)
        tbad = [c for c in scols
                if fam(sdf[c].dtype.kind) != fam(odf[c].dtype.kind)]
        if tbad:
            print(f"FAIL {name}: dtype family mismatch on {tbad}: "
                  f"spark={[str(sdf[c].dtype) for c in tbad]} "
                  f"oracle={[str(odf[c].dtype) for c in tbad]}")
            n_fail += 1
            continue
        so, _ = canon(srows, scols)
        oo, _ = canon(orows, ocols)
        if len(so) != len(oo):
            print(f"FAIL {name}: rows spark={len(so)} oracle={len(oo)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(so, oo)):
            if not all(eq(x, y) for x, y in zip(sr, orow)):
                bad = (i, sr, orow)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}\n  spark : {bad[1]}\n  oracle: {bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(so)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
