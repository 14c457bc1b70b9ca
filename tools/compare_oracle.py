#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query result
parquet written by `graft.Verify`, run the matching oracle SQL from
oracle_sql.json in DuckDB against the same testdata parquet tables and
compare row count + (column-name-sorted) value hash.

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        s = df[col]
        for v in s:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                h.update(b"<null>")
            elif isinstance(v, float):
                h.update(repr(round(v, 9)).encode())
            else:
                h.update(str(v).encode())
            h.update(b"|")
    return h.hexdigest()


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            results[name] = "MISSING_SPARK_RESULT"
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        except Exception as e:
            results[name] = f"SPARK_READ_ERR: {e}"
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_ERR: {type(e).__name__}: {e}"
            continue
        s, d = norm(spark_df), norm(duck_df)
        if len(s) != len(d):
            results[name] = f"ROWS {len(s)} vs {len(d)}"
            continue
        if list(s.columns) != list(d.columns):
            results[name] = f"COLS {list(s.columns)} vs {list(d.columns)}"
            continue
        hs, hd = value_hash(s), value_hash(d)
        if hs != hd:
            # find first differing row/col for debugging
            diff = ""
            for c in s.columns:
                sv, dv = s[c].tolist(), d[c].tolist()
                for i, (a, b) in enumerate(zip(sv, dv)):
                    na, nb = pd.isna(a) if not isinstance(a, (list, tuple)) else False, \
                             pd.isna(b) if not isinstance(b, (list, tuple)) else False
                    if na and nb:
                        continue
                    if na != nb or (isinstance(a, float) and isinstance(b, float) and round(a, 9) != round(b, 9)) \
                       or (not isinstance(a, float) and str(a) != str(b)):
                        diff = f" first diff col={c} row={i}: spark={a!r} duck={b!r}"
                        break
                if diff:
                    break
            results[name] = "HASH_MISMATCH" + diff
        else:
            results[name] = "OK"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for k, v in results.items():
        print(("PASS " if v == "OK" else "FAIL ") + k + ("" if v == "OK" else "  -> " + v))
    print(f"\n{n_ok}/{len(results)} queries match")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
