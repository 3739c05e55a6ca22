#!/usr/bin/env python3
"""Round-12 measurement summary: drift attribution table, vecrand curve,
delta-vs-full disjoint cells, qset chunk sweep. Reads target/scale_logs/
r12_*.json + the committed r10/r11 bench artifacts and prints the tables
that go into SCALE.md / COVERAGE.md."""
import json, subprocess, sys, os

LOGS = 'target/scale_logs'

def load(p):
    try:
        with open(p) as f: return json.load(f)
    except Exception:
        return None

def git_show(ref, path):
    r = subprocess.run(['git', 'show', f'{ref}:{path}'], capture_output=True, text=True)
    return json.loads(r.stdout) if r.returncode == 0 else None

r10 = git_show('73a836b', 'bench_out.json')
r11 = load('bench_out.json')
drift = load(f'{LOGS}/r12_drift_x1.json')
bench12 = load(f'{LOGS}/r12_bench_sf01.json')

if drift:
    print('== drift attribution: isolated x1 5-pass medians (r12 code) vs in-bench ==')
    print(f"{'query':28} {'r10bench':>8} {'r11bench':>8} {'iso_r12':>8} {'r12bench':>8}")
    for q in sorted(drift['queries']):
        v = drift['queries'][q]['x1']
        f = lambda d: ('%.2f' % d[q]) if d and isinstance(d.get('queries', d).get(q) if 'queries' in (d or {}) else d.get(q), float) else '-'
        r10v = r10['queries'].get(q) if r10 else None
        r11v = r11['queries'].get(q) if r11 else None
        b12v = bench12['queries'].get(q) if bench12 else None
        fmt = lambda x: ('%8.2f' % x) if isinstance(x, float) else '%8s' % '-'
        print(f"{q:28}{fmt(r10v)}{fmt(r11v)}{'%8.2f' % v}{fmt(b12v)}")

if bench12 and r10 and r11:
    for tag, other in (('r10', r10), ('r11', r11)):
        common = [q for q in other['queries'] if q in bench12['queries']
                  and isinstance(other['queries'][q], float)
                  and isinstance(bench12['queries'][q], float)]
        a = sum(other['queries'][q] for q in common)
        b = sum(bench12['queries'][q] for q in common)
        print(f'common set vs {tag}: {len(common)} queries, {tag}={a:.1f}s r12={b:.1f}s ({(b/a-1)*100:+.1f}%)')
    print('r12 full total: %.1fs over %d queries' % (
        sum(v for v in bench12['queries'].values() if isinstance(v, float)),
        len(bench12['queries'])))
    biggest = sorted(((bench12['queries'][q] - r11['queries'][q], q)
                      for q in r11['queries'] if q in bench12['queries']
                      and isinstance(r11['queries'][q], float)
                      and isinstance(bench12['queries'][q], float)), reverse=True)
    print('biggest moves vs r11:', [(q, '%+.2f' % d) for d, q in biggest[:6]],
          '...', [(q, '%+.2f' % d) for d, q in biggest[-4:]])

for name in ('r12_vecrand', 'r12b_vecrand_uncapped', 'r12_disjoint',
             'r12_shared', 'r12_boilerplate', 'r12_semantic'):
    d = load(f'{LOGS}/{name}.json')
    if not d: continue
    print(f'== {name} (mode={d.get("mode")}, git={d.get("git")}) ==')
    for q, cells in d['queries'].items():
        xs = [k for k in cells if k.startswith('x')]
        def cell(k):
            p = cells['phys'][k]
            return f"{cells[k]:.1f}s/{p['shuffle_write_mb']}MBw/{p['spill_disk_mb']}MBsp"
        print(f"  {q:34} " + '  '.join(f'{k}={cell(k)}' for k in sorted(xs, key=lambda s: int(s[1:]))))

q = load(f'{LOGS}/r12_qset.json')
if q:
    print('== r12_qset (chunk sweep) ==')
    for name, cells in q['queries'].items():
        row = '  '.join(f"{k}={v['sec']:.1f}s({v['ms_per_query']:.1f}ms/q)"
                        for k, v in sorted(cells.items()))
        print(f'  {name:20} {row}')
