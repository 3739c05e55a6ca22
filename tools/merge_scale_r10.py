#!/usr/bin/env python3
"""Compose bench/scale_r10_{disjoint,shared,boilerplate,qset}.json.

Base: the round-9 per-mode artifacts (bench/scale_r09_*.json). Overlay: the
round-10 whole-curve/isolated re-measures under target/scale_logs/ (which
carry the new phys{} shuffle/spill columns and the x30 factor). Every query
cell records which artifact measured it (provenance), in the established
merge protocol: never re-stamp an old number with a new git hash.
"""
import json
import pathlib
import subprocess

REPO = pathlib.Path(__file__).resolve().parent.parent
LOGS = REPO / "target/scale_logs"
BENCH = REPO / "bench"

git = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                     capture_output=True, text=True).stdout.strip()


def load(p):
    with open(p) as f:
        return json.load(f)


def merge(mode, base_name, overlays, only=None):
    """overlays: list of (json path) whose queries REPLACE/extend base's.
    only: restrict overlay queries to this set (e.g. tdata's query list)."""
    base = load(BENCH / base_name)
    out = {
        "mode": mode,
        "src": base["src"],
        "git": git,
        "round": 10,
        "factors": base["factors"],
        "queries": dict(base["queries"]),
        "provenance": {},
    }
    prov = {}
    # base queries keep their r9 provenance (collapse the r9 prov map)
    base_prov = base.get("provenance", {})
    for commit, qs in base_prov.items():
        for q in qs:
            if q in out["queries"]:
                prov[q] = f"r9:{commit}"
    for q in out["queries"]:
        prov.setdefault(q, f"r9:{base.get('git', '?')}")
    notes = [f"base: r9 artifact {base_name}"]
    for ov_path in overlays:
        ov = load(ov_path)
        for q, cell in ov["queries"].items():
            if only is not None and q not in only:
                continue
            out["queries"][q] = cell
            prov[q] = f"r10:{ov['git']}:{pathlib.Path(ov_path).name}"
        if max(ov["factors"]) > max(out["factors"]):
            out["factors"] = ov["factors"]
        notes.append(
            f"r10 overlay {pathlib.Path(ov_path).name} (git {ov['git']}): "
            + ",".join(sorted(ov["queries"])))
    inv = {}
    for q, src in sorted(prov.items()):
        inv.setdefault(src, []).append(q)
    out["provenance"] = inv
    out["note"] = (
        "r10 overlay cells are whole-curve ISOLATED runs with phys{} "
        "shuffle/spill columns (median over 3 passes) and AQE partition "
        "headroom; r9 base cells carried unchanged (their code untouched "
        "this round) | " + " | ".join(notes))
    dest = BENCH / f"scale_r10_{mode}.json"
    dest.write_text(json.dumps(out))
    print(f"wrote {dest} ({len(out['queries'])} queries)")


merge("disjoint", "scale_r09_disjoint.json",
      [LOGS / "r10_prefixcurve_disjoint.json", LOGS / "r10_x30_disjoint.json",
       LOGS / "r10b_prefix_disjoint.json",
       LOGS / "r10c_semantic_disjoint.json",
       LOGS / "r10e_sparsepruned_disjoint.json"])
merge("shared", "scale_r09_shared.json",
      [LOGS / "r10_x30_shared.json", LOGS / "r10c_auto_shared.json"])
merge("boilerplate", "scale_r09_boilerplate.json",
      [LOGS / "r10_x30_boilerplate.json",
       LOGS / "r10b_minhashcap_boilerplate.json",
       LOGS / "r10c_auto_boilerplate.json",
       LOGS / "r10d_capped_boilerplate.json"])

# tdata (the training-data query set over the disjoint replicas): r9 base,
# with the two cells r10 re-measured (x30 octaves) overlaid
merge("tdata", "scale_r09_tdata.json", [LOGS / "r10_x30_disjoint.json"],
      only=set(load(BENCH / "scale_r09_tdata.json")["queries"]))

# qset is new this round — copy verbatim
qset = load(LOGS / "r10_qset.json")
(BENCH / "scale_r10_qset.json").write_text(json.dumps(qset))
print(f"wrote {BENCH / 'scale_r10_qset.json'}")
