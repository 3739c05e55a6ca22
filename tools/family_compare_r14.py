#!/usr/bin/env python3
"""Round-14 bench decomposition: touched delta/stream family vs untouched
controls, across the r12 / r13 / r14 full sf0.1 benches (task #2's
done-criterion — the family must come back inside the drift band of its
r12 contribution, or the residual must be shown irreducible).

Family = every query whose execution path crosses the written-index delta
machinery or a streaming foreachBatch loop (the set the r13 verdict
counted as 20).
"""
import json, sys

def load(p):
    d = json.load(open(p))
    return d["queries"]

def is_family(q):
    return ("_delta" in q) or ("_incremental" in q) or q.startswith("q_stream_")

def main():
    r12 = load("bench/bench_r12_sf01.json")
    r13 = load("bench/bench_r13_sf01.json")
    r14 = load(sys.argv[1] if len(sys.argv) > 1 else "target/scale_logs/r14_bench_sf01.json")
    common12 = sorted(set(r12) & set(r13) & set(r14))
    fam = [q for q in common12 if is_family(q)]
    unt = [q for q in common12 if not is_family(q)]
    def tot(d, qs): return sum(d[q] for q in qs)
    print(f"common queries: {len(common12)}  family: {len(fam)}  untouched: {len(unt)}")
    for name, qs in (("family", fam), ("untouched", unt), ("common-total", common12)):
        a, b, c = tot(r12, qs), tot(r13, qs), tot(r14, qs)
        print(f"{name:>13}: r12 {a:7.1f}s  r13 {b:7.1f}s ({(b/a-1)*100:+5.1f}%)  "
              f"r14 {c:7.1f}s ({(c/a-1)*100:+5.1f}% vs r12, {(c/b-1)*100:+5.1f}% vs r13)")
    # r13-only additions (the 4 cluster gates) tracked separately
    new13 = sorted(set(r13) & set(r14) - set(r12))
    if new13:
        b, c = tot(r13, new13), tot(r14, new13)
        print(f"  r13-new gates ({len(new13)}): r13 {b:5.1f}s  r14 {c:5.1f}s ({(c/b-1)*100:+5.1f}%)")
        for q in new13:
            print(f"    {q:42s} r13 {r13[q]:6.2f}  r14 {r14[q]:6.2f}")
    print("\nfamily detail (r12 -> r13 -> r14):")
    for q in fam:
        print(f"  {q:42s} {r12[q]:6.2f} {r13[q]:6.2f} {r14[q]:6.2f}")

if __name__ == "__main__":
    main()
