#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: oracle_compare.py <sfDir> <verifyOutDir> [qname ...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
every <sfDir>/*.parquet as a DuckDB view named after the file, runs each
oracle query, and compares the multiset of rows (stringified, sorted)
against the Spark parquet dump at <verifyOutDir>/<qname>/. Prints a
summary line per query and exits non-zero on any mismatch.
"""
import sys, os, json, glob
import duckdb

def canon(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)

def rows_of(cur):
    return sorted("|".join(canon(v) for v in row) for row in cur.fetchall())

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        con = duckdb.connect()
        for p in glob.glob(os.path.join(sf, "*.parquet")):
            t = os.path.basename(p)[:-len(".parquet")]
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        spark_dir = os.path.join(out, name)
        if not os.path.isdir(spark_dir):
            print(f"{name}: MISSING spark output"); bad += 1; continue
        try:
            ocur = con.execute(sql)
            ocols = [d[0] for d in ocur.description]
            orows = rows_of(ocur)
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}"); bad += 1; continue
        try:
            scur = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            scols = [d[0] for d in scur.description]
            srows = rows_of(scur)
        except Exception as e:
            print(f"{name}: SPARK READ ERROR {e}"); bad += 1; continue
        ok = orows == srows and [c.lower() for c in ocols] == [c.lower() for c in scols]
        if ok:
            print(f"{name}: OK rows={len(srows)}")
        else:
            bad += 1
            print(f"{name}: MISMATCH spark_rows={len(srows)} oracle_rows={len(orows)} "
                  f"cols {scols} vs {ocols}")
            for i, (a, b) in enumerate(zip(srows, orows)):
                if a != b:
                    print(f"  first diff at {i}:\n   spark  {a[:300]}\n   oracle {b[:300]}")
                    break
        con.close()
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
