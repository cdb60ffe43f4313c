#!/usr/bin/env python3
"""Local parity harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <outDir>/<name> parquet (Spark result), runs the oracle SQL from
<outDir>/oracle_sql.json in DuckDB against the sf parquet tables, and
compares the way the DRIVER does: both sides materialized through pandas
(so DuckDB HUGEINT becomes float64, exactly as in the driver), columns
sorted by name, rows sorted by all columns, values compared by str() repr —
repr-sensitive, so int64 3 vs float64 3.0 FAILS here like it fails there.
Array columns crash the sort (unhashable ndarray) — also like the driver.
"""
import sys, json, glob
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def rows_repr(df):
    return ["|".join(str(v) for v in row) for row in df.itertuples(index=False)]

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
            sdf = con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").df()
            ddf = con.execute(sql).df()
            if sorted(sdf.columns) != sorted(ddf.columns):
                print(f"FAIL {name}: schema {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
                n_bad += 1; continue
            if len(sdf) != len(ddf):
                print(f"FAIL {name}: {len(sdf)} spark vs {len(ddf)} duckdb rows")
                n_bad += 1; continue
            sdf, ddf = canon(sdf), canon(ddf)
            a, b = rows_repr(sdf), rows_repr(ddf)
            if a == b:
                print(f"OK   {name} ({len(a)} rows)"); n_ok += 1
            else:
                print(f"FAIL {name}: hash mismatch ({len(a)} rows)")
                shown = 0
                for i, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        print(f"  row {i}: spark={x[:160]}")
                        print(f"         duck ={y[:160]}")
                        shown += 1
                        if shown >= 3: break
                n_bad += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_bad += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
