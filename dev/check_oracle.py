#!/usr/bin/env python3
"""Dev-only oracle pre-validation (mimics the driver's t2 check).

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run  : python3 dev/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out

Not part of the Spark library — local feedback loop only.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for compare: timestamps -> iso strings, floats -> repr
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata tables are single files; ScaleCorpus writes
        # scaled tables as Spark DIRECTORIES of part files — glob those
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = con.execute(f"SELECT * FROM read_parquet({files!r})").df() if files else pd.DataFrame()
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}" + (" EMPTY!" if len(got) == 0 else "")
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH got={list(g.columns)} exp={list(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT got={len(g)} exp={len(e)}"
        elif not g.equals(e):
            neq = (g != e) & ~(g.isna() & e.isna())
            bad_cols = [c for c in g.columns if neq[c].any()]
            idx = neq.any(axis=1)
            results[name] = (f"VALUE_MISMATCH cols={bad_cols} nrows={int(idx.sum())} "
                             f"sample_got={g[idx].head(2).to_dict('records')} "
                             f"sample_exp={e[idx].head(2).to_dict('records')}")
        else:
            results[name] = f"OK rows={len(g)}"
    width = max(len(k) for k in results)
    fails = 0
    for k in sorted(results):
        v = results[k]
        if not v.startswith(("OK", "ROWS_ONLY")):
            fails += 1
        print(f"{k:<{width}}  {v[:400]}")
    print(f"\n{len(results) - fails}/{len(results)} ok")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
