#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query result
parquet written by `graft.Verify`, run the matching oracle SQL from
oracle_sql.json in DuckDB against the same testdata parquet tables and
compare row count + (column-name-sorted) value hash.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

Every oracle statement is timed; any single statement slower than
GRAFT_ORACLE_SLOW_SEC (default 10 s — generous at sf0.01, where the
whole suite's oracles run in minutes) FAILS the compare even when the
hash matches. Rationale (BENCHNOTES r13): DuckDB inlines a CTE
referenced more than once, so a chain of doubly-referenced CTEs
re-expands exponentially with depth — one unmateralized GD-chain oracle
silently cost 432 s until found by hand. The timing guard makes the
next such cliff a named failure instead of a mystery-slow verify.
`--selftest` proves the guard trips (runs one deliberately slow
statement under a tiny threshold).
"""
import sys, os, json, glob, time
import duckdb
import pandas as pd
import hashlib

SLOW_SEC = float(os.environ.get("GRAFT_ORACLE_SLOW_SEC", "10"))

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
    timings = {}
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
            t0 = time.monotonic()
            duck_df = con.execute(oracle[name]).df()
            oracle_sec = time.monotonic() - t0
        except Exception as e:
            results[name] = f"ORACLE_ERR: {type(e).__name__}: {e}"
            continue
        timings[name] = oracle_sec
        if oracle_sec > SLOW_SEC:
            results[name] = (f"ORACLE_SLOW: {oracle_sec:.1f}s > {SLOW_SEC:.1f}s "
                             "(doubly-referenced CTE chain? AS MATERIALIZED)")
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
        t = f"  [{timings[k]:.2f}s]" if timings.get(k, 0.0) >= 0.5 else ""
        print(("PASS " if v == "OK" else "FAIL ") + k + t
              + ("" if v == "OK" else "  -> " + v))
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:5]
    if slowest and slowest[0][1] >= 0.5:
        print("slowest oracles: "
              + ", ".join(f"{k}={v:.2f}s" for k, v in slowest if v >= 0.5))
    print(f"\n{n_ok}/{len(results)} queries match")
    sys.exit(0 if n_ok == len(results) else 1)


def selftest() -> None:
    """Prove the slow-oracle guard trips: a doubly-referenced CTE chain
    (each level referenced twice -> DuckDB inlines 2^depth copies of the
    base scan) under a tiny threshold must be reported ORACLE_SLOW."""
    global SLOW_SEC
    SLOW_SEC = 0.05
    con = duckdb.connect()
    # depth-8 chain over a 100k-row base: milliseconds when materialized,
    # ~0.7 s when inlined (the r13 GD-chain shape, sized to prove the trip
    # without burning CI time — at depth 14 over 3M rows it runs minutes)
    levels = ["c0 AS (SELECT range AS x FROM range(100000))"]
    for i in range(1, 9):
        levels.append(
            f"c{i} AS (SELECT a.x FROM c{i-1} a JOIN c{i-1} b ON a.x = b.x "
            f"WHERE a.x % 2 = {i % 2} OR a.x % 2 = {(i + 1) % 2})")
    sql = "WITH " + ",\n".join(levels) + "\nSELECT count(*) AS n FROM c8"
    t0 = time.monotonic()
    con.execute(sql).df()
    sec = time.monotonic() - t0
    assert sec > SLOW_SEC, f"selftest query finished in {sec:.3f}s (< {SLOW_SEC}s)"
    print(f"selftest OK: doubly-referenced CTE chain took {sec:.2f}s "
          f"> {SLOW_SEC}s threshold -> would be flagged ORACLE_SLOW")


if __name__ == "__main__":
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
    else:
        main(sys.argv[1], sys.argv[2])
