#!/usr/bin/env python3
"""Local parity harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <outDir>/<name> parquet (Spark result), runs the oracle SQL from
<outDir>/oracle_sql.json in DuckDB against the sf parquet tables, and
compares as a sorted multiset of rows (columns sorted by name) — the
strictest plausible version of the driver's hash compare.
"""
import sys, json, math, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        if v == int(v) and abs(v) < 2**53: return repr(float(v))
        return repr(v)
    if isinstance(v, list): return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)

def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm(r[i]) for i in order) for r in rows)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        try:
            spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not spark_files:
                print(f"FAIL {name}: no spark output"); n_bad += 1; continue
            sres = con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").fetchall()
            scols = [d[0] for d in con.description]
            dres = con.execute(sql).fetchall()
            dcols = [d[0] for d in con.description]
            if sorted(scols) != sorted(dcols):
                print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(dcols)}")
                n_bad += 1; continue
            a, b = rowset(scols, sres), rowset(dcols, dres)
            if a == b:
                print(f"OK   {name} ({len(a)} rows)"); n_ok += 1
            else:
                print(f"FAIL {name}: {len(a)} spark vs {len(b)} duckdb rows")
                sa, sb = set(a), set(b)
                for x in list(sa - sb)[:3]: print(f"  spark-only: {x[:200]}")
                for x in list(sb - sa)[:3]: print(f"  duck-only:  {x[:200]}")
                n_bad += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_bad += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
