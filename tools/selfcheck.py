#!/usr/bin/env python3
"""Dev-aid replica of the driver's correctness gate.

Usage: python3 tools/selfcheck.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out_dir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle_sql.json entry in DuckDB against the sf_dir parquet tables,
and compares rows / schema (column names sorted) / value hash the way the
driver does: columns sorted by name, rows sorted by all columns, floats
rounded to 4dp before hashing.
"""
import json, sys, glob, hashlib
import duckdb

def canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                v = round(v, 4)
                if v == int(v):
                    v = int(v)
            if isinstance(v, list):
                v = tuple(round(x, 4) if isinstance(x, float) else x for x in v)
            vals.append((c, v))
        out.append(tuple(vals))
    out.sort(key=lambda t: str(t))
    return hashlib.md5(str(out).encode()).hexdigest()

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    fails = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        con = duckdb.connect()
        for t in tables:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            fails.append(name); print(f"{name}: NO SPARK OUTPUT"); continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM parquet_scan({files!r})").fetch_arrow_table()
            orc_rel = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            fails.append(name); print(f"{name}: ERR {e}"); continue
        scols = sorted(spark_rel.column_names)
        ocols = sorted(orc_rel.column_names)
        ok_schema = scols == ocols
        ok_rows = spark_rel.num_rows == orc_rel.num_rows
        ok_hash = False
        if ok_schema and ok_rows:
            sh = canon(spark_rel.to_pylist(), scols)
            oh = canon(orc_rel.to_pylist(), ocols)
            ok_hash = sh == oh
        status = "OK" if (ok_schema and ok_rows and ok_hash) else "FAIL"
        if status == "FAIL":
            fails.append(name)
            print(f"{name}: {status} rows={spark_rel.num_rows}/{orc_rel.num_rows} "
                  f"schema={ok_schema} hash={ok_hash}")
            if not ok_schema:
                print(f"  spark cols: {scols}\n  oracle cols: {ocols}")
        else:
            print(f"{name}: OK ({spark_rel.num_rows} rows)")
        con.close()
    print(f"\n{'ALL GREEN' if not fails else 'FAILURES: ' + ', '.join(fails)}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
