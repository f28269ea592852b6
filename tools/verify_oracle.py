#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle check.

Usage: verify_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
query in DuckDB over the sfDir parquet tables (registered by filename
stem), and compares against the Spark result parquet in
<verifyOutDir>/<name>/: columns sorted by name, floats rounded to 5
decimals, rows compared as sorted lists (every declared query has a total
deterministic order, so sorted-row equality is equivalent to ordered
equality up to ties the driver also tolerates).
"""
import duckdb
import glob
import json
import sys


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 5)
    if isinstance(v, bytes):
        return v.hex()
    return v


def rows_of(df):
    cols = sorted(df.columns)
    df = df[cols]
    out = []
    for r in df.itertuples(index=False):
        out.append(tuple(norm_cell(x) for x in r))
    return cols, sorted(out, key=lambda t: tuple(str(x) for x in t))


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in sorted(glob.glob(f"{sfdir}/*.parquet")):
        stem = t.split("/")[-1].replace(".parquet", "")
        con.execute(f"CREATE VIEW {stem} AS SELECT * FROM read_parquet('{t}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok, fails = 0, []
    for name in sorted(oracle):
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            fails.append((name, f"oracle error: {e}"))
            continue
        try:
            sdf = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        except Exception as e:  # noqa: BLE001
            fails.append((name, f"spark result missing: {e}"))
            continue
        ocols, orows = rows_of(odf)
        scols, srows = rows_of(sdf)
        if [c.lower() for c in ocols] != [c.lower() for c in scols]:
            fails.append((name, f"schema mismatch: oracle {ocols} vs spark {scols}"))
            continue
        if orows != srows:
            diff_o = [r for r in orows if r not in srows][:3]
            diff_s = [r for r in srows if r not in orows][:3]
            fails.append((name, f"rows differ: n_oracle={len(orows)} n_spark={len(srows)}"
                                f" only_oracle={diff_o} only_spark={diff_s}"))
            continue
        n_ok += 1
    print(f"OK {n_ok}/{len(oracle)}")
    for name, msg in fails:
        print(f"FAIL {name}: {msg}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
