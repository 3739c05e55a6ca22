#!/usr/bin/env python3
"""Round-start testdata preflight: diff every table's Arrow schema at all
three scale factors against the expectations the engine was built on.

The driver regenerates testdata between rounds and CAN change dtypes —
round 7 lost four event-time queries to a silent ns-int64 ->
timestamp[us] flip. Run this FIRST thing every round:

  python3 tools/preflight.py            # uses /root/testdata
  python3 tools/preflight.py <root>     # alternate testdata root

Exit 0 = all schemas match; exit 1 lists every divergence. A divergence
is not necessarily fatal (eventsWithTsNs adapts to both known ts forms)
— but it must be SEEN before any query runs.
"""
import sys
import pyarrow.parquet as pq

EXPECT = {
    "region":    {"r_regionkey": "int32", "r_name": "string"},
    "nation":    {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer":  {"c_custkey": "int64", "c_name": "string", "c_nationkey": "int32",
                  "c_acctbal": "double", "c_mktsegment": "string"},
    "supplier":  {"s_suppkey": "int64", "s_name": "string", "s_nationkey": "int32",
                  "s_acctbal": "double"},
    "part":      {"p_partkey": "int64", "p_name": "string", "p_brand": "string",
                  "p_type": "string", "p_size": "int32", "p_retailprice": "double"},
    "orders":    {"o_orderkey": "int64", "o_custkey": "int64", "o_orderstatus": "string",
                  "o_totalprice": "double", "o_orderdate": "timestamp[us]",
                  "o_orderpriority": "string"},
    "lineitem":  {"l_orderkey": "int64", "l_partkey": "int64", "l_suppkey": "int64",
                  "l_linenumber": "int32", "l_quantity": "double",
                  "l_extendedprice": "double", "l_discount": "double", "l_tax": "double",
                  "l_returnflag": "string", "l_linestatus": "string",
                  "l_shipdate": "timestamp[us]"},
    # ts has shipped as BOTH int64 (ns) and timestamp[us]; either is
    # acceptable to eventsWithTsNs — flag anything ELSE loudly.
    "events":    {"event_id": "int64", "ts": ("timestamp[us]", "int64"),
                  "user_id": "int64", "event_type": "string", "value": "double",
                  "props": "string"},
    "documents": {"doc_id": "int64", "text": "string", "lang": "string",
                  "source": "string", "n_chars": "int64"},
    "embeddings": {"vec_id": "int64", "embedding": "list<element: float>",
                   "label": "int32"},
}


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata"
    problems = []
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        for tbl, exp in EXPECT.items():
            path = f"{root}/{sf}/{tbl}.parquet"
            try:
                schema = pq.read_schema(path)
            except Exception as e:
                problems.append(f"{sf}/{tbl}: UNREADABLE ({e})")
                continue
            got = {f.name: str(f.type) for f in schema}
            for cname, ctype in exp.items():
                ok = got.get(cname) in (ctype if isinstance(ctype, tuple) else (ctype,))
                if cname not in got:
                    problems.append(f"{sf}/{tbl}.{cname}: MISSING (have {sorted(got)})")
                elif not ok:
                    problems.append(f"{sf}/{tbl}.{cname}: {got[cname]} (expected {ctype})")
            for extra in set(got) - set(exp):
                problems.append(f"{sf}/{tbl}.{extra}: UNEXPECTED NEW COLUMN ({got[extra]})")
    if problems:
        print("TESTDATA SCHEMA DRIFT:")
        for p in problems:
            print(f"  {p}")
        sys.exit(1)
    print("preflight OK: all testdata schemas match expectations at all three SFs")


if __name__ == "__main__":
    main()
