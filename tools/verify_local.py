#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare (dev tooling only —
the engine itself is pure Scala/Spark). Usage:
    python3 tools/verify_local.py <sfDir> <verifyOutDir>
Compares each <outDir>/<name> parquet (Spark result) against the DuckDB
result of <outDir>/oracle_sql.json[name], with columns sorted by name and
rows sorted by all columns.
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64[ns,"):
            df[c] = df[c].dt.tz_localize(None)
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            want = canon(con.execute(sql).df())
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
                n_fail += 1
                continue
            # dtype-tolerant value compare (driver hashes values).
            # Floats are SIGN-BIT-STRICT: -0.0 == 0.0 under `==` but the
            # driver's hash distinguishes the bit patterns (the r3 q107
            # failure class), so require signbit equality too.
            mism = []
            for c in got.columns:
                a, b = got[c], want[c]
                try:
                    eq = (a.isna() & b.isna()) | (a == b)
                    if str(a.dtype).startswith("float") \
                            and str(b.dtype).startswith("float"):
                        import numpy as np
                        sg = np.signbit(a.to_numpy(dtype="f8", na_value=0.0))
                        sw = np.signbit(b.to_numpy(dtype="f8", na_value=0.0))
                        eq = eq & pd.Series(sg == sw, index=a.index)
                except Exception:
                    eq = a.astype(str) == b.astype(str)
                if not bool(eq.all()):
                    bad = (~eq).idxmax()
                    mism.append((c, a[bad], b[bad], int((~eq).sum())))
            if mism:
                print(f"FAIL {name}: {len(mism)} col mismatches; first: {mism[0]}")
                n_fail += 1
            else:
                sg = {c: str(got[c].dtype) for c in got.columns}
                sw = {c: str(want[c].dtype) for c in want.columns}
                dt = "" if sg == sw else f"  [dtype diff: { {c: (sg[c], sw[c]) for c in sg if sg[c] != sw[c]} }]"
                print(f"PASS {name} ({len(got)} rows){dt}")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
