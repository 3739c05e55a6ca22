#!/usr/bin/env python3
"""Merge the narrowed round-12 disjoint re-runs (r12b_disjoint_mw +
r12b_disjoint_emb, both measured on the post-fix commit) into ONE
bench/scale_r12_disjoint.json for Bench's scaling embed, with per-query
provenance. Also copies the other per-mode artifacts into bench/."""
import json, shutil, os, sys

LOGS = 'target/scale_logs'

def load(p):
    with open(p) as f:
        return json.load(f)

mw = load(f'{LOGS}/r12c_disjoint_mw.json')
emb = load(f'{LOGS}/r12c_disjoint_emb.json')
assert mw['mode'] == emb['mode'] == 'disjoint'
merged = {
    'mode': 'disjoint', 'src': mw['src'],
    'git': mw['git'], 'round': mw.get('round'),
    'note': 'merged from two narrowed same-commit sessions (r11 protocol)',
    'factors': mw['factors'],
    'queries': {**{q: dict(c, measured_in='mw-session') for q, c in mw['queries'].items()},
                **{q: dict(c, measured_in='emb-session') for q, c in emb['queries'].items()}},
}
os.makedirs('bench', exist_ok=True)
with open('bench/scale_r12_disjoint.json', 'w') as f:
    json.dump(merged, f)
print('wrote bench/scale_r12_disjoint.json',
      list(merged['queries']), 'git', merged['git'])

copies = {
    f'{LOGS}/r12_vecrand.json': 'bench/scale_r12_vecrand.json',
    f'{LOGS}/r12b_vecrand_uncapped.json': 'bench/scale_r12b_vecrand_uncapped.json',
    f'{LOGS}/r12_shared.json': 'bench/scale_r12_shared.json',
    f'{LOGS}/r12_boilerplate.json': 'bench/scale_r12_boilerplate.json',
    f'{LOGS}/r12_semantic.json': 'bench/scale_r12_semantic_contrast.json',
    f'{LOGS}/r12_qset.json': 'bench/scale_r12_qset.json',
    f'{LOGS}/r12_drift_x1.json': 'bench/drift_r12_isolated.json',
    f'{LOGS}/r12_bench_sf01.json': 'bench/bench_r12_sf01_pass1.json',
    f'{LOGS}/r12c_bench_sf01.json': 'bench/bench_r12_sf01.json',
}
for src, dst in copies.items():
    if os.path.exists(src):
        shutil.copy(src, dst)
        print('copied', dst)
    else:
        print('MISSING', src, file=sys.stderr)
