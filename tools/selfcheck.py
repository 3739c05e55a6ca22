#!/usr/bin/env python3
"""Dev-aid replica of the driver's correctness gate.

Usage:
  python3 tools/selfcheck.py <verify_out_dir> <sf_dir> [query ...]
  python3 tools/selfcheck.py --bench-parse <stdout_capture_file>

Correctness mode reads each <out_dir>/<name>/ parquet (written by
graft.Verify), runs the matching oracle_sql.json entry in DuckDB against the
sf_dir parquet tables, and compares rows / schema / value hash.

Tolerance note: this replica rounds floats to 4dp before hashing, which is
LOOSER than the driver's compare (per-column values exact; the engine rounds
scores to 6dp before ranking). A selfcheck OK with values differing past 4dp
could still fail the driver — treat OK as "almost certainly green", FAIL as
"definitely investigate". Schema compare covers names AND Arrow dtypes, like
the driver's dtype preflight.

--bench-parse simulates the driver's BENCH capture: tail -c 4096 of the
captured stdout, then the LAST line that parses as a JSON object wins.
Prints the parsed summary or PARSE-FAIL (exit 1).
"""
import json, sys, glob, hashlib, math
import duckdb


def _canon_val(v):
    """Normalize one value the same way on both engines: floats rounded to
    4dp, float-integers collapsed to int, NaN/Inf mapped to sentinel strings
    (math.isfinite guard — round()/int() on them would raise), applied
    recursively inside lists/tuples so 2.0 vs 2 inside an array hashes
    identically."""
    if isinstance(v, float):
        if not math.isfinite(v):
            return "NaN" if math.isnan(v) else ("Inf" if v > 0 else "-Inf")
        v = round(v, 4)
        if v == int(v):
            v = int(v)
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_canon_val(x) for x in v)
    return v


def canon(rows, cols):
    out = []
    for r in rows:
        out.append(tuple((c, _canon_val(r[c])) for c in cols))
    out.sort(key=lambda t: str(t))
    return hashlib.md5(str(out).encode()).hexdigest()


def bench_parse(path):
    """Driver tail-parse simulation: last JSON-object line of the final
    4096 bytes of captured stdout."""
    data = open(path, "rb").read()[-4096:]
    parsed = None
    for line in data.decode("utf-8", "replace").splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                parsed = json.loads(line)
            except ValueError:
                pass
    if parsed is None:
        print("PARSE-FAIL: no JSON line in last 4096 bytes")
        sys.exit(1)
    print(json.dumps(parsed, indent=2))
    sys.exit(0)


def main():
    if sys.argv[1] == "--bench-parse":
        bench_parse(sys.argv[2])
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    tables = ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]
    fails = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        # `with` closes the connection (and its 10 views) on every path,
        # including the NO-OUTPUT / ERR continues that used to leak it
        with duckdb.connect() as con:
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
            # driver's dtype preflight fails on int32-vs-int64 etc., not just
            # names — compare (name, arrow type) pairs
            styps = sorted((f.name, str(f.type)) for f in spark_rel.schema)
            otyps = sorted((f.name, str(f.type)) for f in orc_rel.schema)
            scols = [n for n, _ in styps]
            ocols = [n for n, _ in otyps]
            ok_schema = styps == otyps
            ok_rows = spark_rel.num_rows == orc_rel.num_rows
            ok_hash = False
            if scols == ocols and ok_rows:
                try:
                    sh = canon(spark_rel.to_pylist(), scols)
                    oh = canon(orc_rel.to_pylist(), ocols)
                    ok_hash = sh == oh
                except Exception as e:
                    print(f"{name}: CANON ERR {e}")
            status = "OK" if (ok_schema and ok_rows and ok_hash) else "FAIL"
            if status == "FAIL":
                fails.append(name)
                print(f"{name}: {status} rows={spark_rel.num_rows}/{orc_rel.num_rows} "
                      f"schema={ok_schema} hash={ok_hash}")
                if not ok_schema:
                    diff = [(s, o) for s, o in zip(styps, otyps) if s != o] \
                        if len(styps) == len(otyps) else [("spark", styps), ("oracle", otyps)]
                    print(f"  schema diff (spark vs oracle): {diff}")
            else:
                print(f"{name}: OK ({spark_rel.num_rows} rows)")
    print(f"\n{'ALL GREEN' if not fails else 'FAILURES: ' + ', '.join(fails)}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
