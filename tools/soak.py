#!/usr/bin/env python3
"""Promote the 10x soak to a machine-comparable artifact (VERDICT r16
#5): graft.Stress prints per-probe walls + one counts JSON line, but
as PLANS prose the 10x trend was only eyeball-comparable. This runs
the soak once (idle box, one sbt/Spark — the ops_cards rule), parses
every `[stress] <probe> <sec>s` line and the final counts object, and
writes docs/soak_r{N}.json so probe walls and replication invariants
(e.g. triangles = mult x base, hll registers bit-identical) band
round-over-round the way bench medians do.

Round 18 (VERDICT r17 #4) adds BANDS: after writing soak_r{N}.json,
every docs/soak_r*.json with the same (sf, mult) pools into per-probe
min-basis bands (the bench-band rule applied to the 10x stress
surface), the current round's probes compare against them, and
>2x drifts land in docs/soak_bands.json as flags. One data point
bands against itself (ratio 1.0) and becomes the basis next round.

Usage:
    python3 tools/soak.py --round 17                 # sf0.1, mult 10
    python3 tools/soak.py --round 17 --sf /root/testdata/sf0.01 --mult 20
    python3 tools/soak.py --bands-only --round 18    # re-band, no run
"""
import argparse
import json
import os
import re
import subprocess
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def band_soaks(cur_round, sf, mult):
    """Pool every docs/soak_r*.json with the same (sf, mult) into
    per-probe MIN-basis bands, compare the current round against
    them, and write docs/soak_bands.json with >2x drift flags."""
    import glob
    pool = {}
    for path in sorted(glob.glob(os.path.join(REPO, "docs", "soak_r*.json"))):
        m = re.search(r"soak_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            d = json.load(f)
        if d.get("sf") != sf or d.get("mult") != mult or d.get("err"):
            continue
        pool[int(m.group(1))] = d.get("probes", {})
    if cur_round not in pool:
        print(f"soak bands: round {cur_round} not poolable (err or missing)")
        return
    basis = {}
    for rnd, probes in pool.items():
        for name, wall in probes.items():
            if name not in basis or wall < basis[name][0]:
                basis[name] = (wall, rnd)
    cur = pool[cur_round]
    bands = {n: {"band": w, "basis_round": r} for n, (w, r) in basis.items()}
    flags, ratios = [], {}
    for name, wall in cur.items():
        band = basis[name][0]
        ratio = wall / band if band > 0 else 1.0
        ratios[name] = round(ratio, 2)
        if ratio > 2.0:
            flags.append({"probe": name, "wall": wall, "band": band,
                          "ratio": round(ratio, 2)})
    out = {"round": cur_round, "sf": sf, "mult": mult,
           "rounds_pooled": sorted(pool), "bands": bands,
           "ratios": ratios, "flags": flags}
    path = os.path.join(REPO, "docs", "soak_bands.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}: {len(bands)} probes banded over rounds "
          f"{sorted(pool)}, {len(flags)} flagged >2x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--bands-only", action="store_true",
                    help="re-band existing soak_r*.json without running")
    args = ap.parse_args()
    if args.bands_only:
        band_soaks(args.round, args.sf, args.mult)
        return
    out = {"round": args.round, "sf": args.sf, "mult": args.mult,
           "probes": {}, "counts": None}
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=args.sf)
    t0 = time.time()
    try:
        proc = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Stress {args.mult}"],
            cwd=REPO, capture_output=True, text=True, env=env, timeout=3600)
    except subprocess.TimeoutExpired as e:
        tail = (e.stdout or b"")
        if isinstance(tail, bytes):
            tail = tail.decode("utf-8", "replace")
        out["err"] = f"timeout after {time.time() - t0:.0f}s"
        out["tail"] = tail[-400:]
        proc = None
    if proc is not None:
        out["runner_wall_sec"] = round(time.time() - t0, 1)
        if proc.returncode != 0:
            out["err"] = f"rc={proc.returncode}"
            out["tail"] = proc.stdout[-400:] + proc.stderr[-200:]
        probe_re = re.compile(r"\[stress\] (.+?)\s+([0-9.]+)s\s*$")
        for raw in proc.stdout.splitlines():
            # try the raw line FIRST: an unprefixed '[stress] ...'
            # line (forked-JVM stdout) would be MANGLED by the sbt
            # prefix strip ('] '-split removes '[stress] ' itself)
            m = probe_re.search(raw)
            line = raw.split("] ", 1)[-1] if raw.startswith("[") else raw
            if m:
                out["probes"][m.group(1).strip()] = float(m.group(2))
            elif line.startswith('{"docs":'):
                out["counts"] = json.loads(line)
    path = os.path.join(REPO, "docs", f"soak_r{args.round}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}: {len(out['probes'])} probes, "
          f"counts={'ok' if out['counts'] else 'MISSING'}"
          + (f", err={out.get('err')}" if out.get("err") else ""))
    band_soaks(args.round, args.sf, args.mult)


if __name__ == "__main__":
    main()
