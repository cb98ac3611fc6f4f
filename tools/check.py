#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate: for each query result
parquet written by graft.Verify, run the paired DuckDB oracle on the same
source tables and compare (columns sorted by name, rows sorted by all
columns, exact values). Driver-side tooling only — not part of the library.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp = con.execute(sql).fetch_arrow_table()
            files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: no result parquet"); fail += 1; continue
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
            ecols, gcols = sorted(exp.column_names), sorted(got.column_names)
            if ecols != gcols:
                print(f"FAIL {name}: cols got={gcols} oracle={ecols}")
                fail += 1; continue
            e = exp.select(ecols).to_pandas()
            g = got.select(gcols).to_pandas()
            if len(e) != len(g):
                print(f"FAIL {name}: rows got={len(g)} oracle={len(e)}")
                fail += 1; continue
            e = e.sort_values(by=ecols, kind="mergesort").reset_index(drop=True)
            g = g.sort_values(by=gcols, kind="mergesort").reset_index(drop=True)
            if [str(d) for d in e.dtypes] != [str(d) for d in g.dtypes]:
                print(f"WARN {name}: dtypes got={list(map(str, g.dtypes))} "
                      f"oracle={list(map(str, e.dtypes))}")
            try:
                pd.testing.assert_frame_equal(
                    g, e, check_dtype=False, check_exact=True)
            except AssertionError as ae:
                neq = (e.astype(object) != g.astype(object)) & ~(e.isna() & g.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {bad.sum()}/{len(e)} rows differ")
                print("  got:   ", g[bad].head(2).to_dict("records"))
                print("  oracle:", e[bad].head(2).to_dict("records"))
                fail += 1; continue
            ok += 1
            print(f"OK   {name} ({len(g)} rows)")
        except Exception as ex:
            print(f"ERR  {name}: {str(ex)[:300]}")
            fail += 1
    print(f"== {ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
