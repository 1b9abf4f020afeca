#!/usr/bin/env python3
"""Regenerate docs/bench_bands.json — per-entry reference floor bands.

VERDICT r13 #1: the driver box has polluted committed bench medians
three rounds running, and the noise flags (contended/unstable/starved)
provably cannot catch a box that is UNIFORMLY 3-5x slow (r13: mm10
5.14s vs 1.74s judge-idle, unflagged). The fix is a reference point:
band(entry) = min over the last N driver rounds of that entry's
UNFLAGGED headline median. graft.Bench reads the file and flags any
median > 2x its band as `overband` regardless of cpuFrac, and spends
its retry budget in band-deviation order instead of roster order.

Run after each round lands a new BENCH_r*.json:
    python3 tools/make_bands.py            # last 3 rounds
    python3 tools/make_bands.py --rounds 4
"""
import argparse
import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def final_line(tail):
    """The compact medians-only artifact line (kind:"final", printed
    last so it survives the driver's tail-capture truncation)."""
    idx = tail.rfind('{"metric":"total","kind":"final"')
    if idx < 0:
        return None
    line = tail[idx:]
    nl = line.find("\n")
    if nl > 0:
        line = line[:nl]
    try:
        return json.loads(line)
    except json.JSONDecodeError:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3,
                    help="how many most-recent rounds to pool (default 3)")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "bench_bands.json"))
    args = ap.parse_args()

    # keep (round, path) PAIRS from the glob — re-deriving a
    # zero-padded filename from the round number breaks on unpadded
    # or otherwise-named artifacts the glob legitimately matched, and
    # a glob hit the regex rejects (e.g. BENCH_rerun.json) must be
    # skipped, not crash the comprehension
    hits = []
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            hits.append((int(m.group(1)), path))
    use = sorted(hits)[-args.rounds:]
    bands, sf, used = {}, None, []
    for r, path in use:
        with open(path) as fh:
            d = json.load(fh)
        f = final_line(d.get("tail") or "")
        if f is None:
            print(f"round {r}: no parsable final line, skipped")
            continue
        used.append(r)
        sf = f.get("sf", sf)
        flagged = set((f.get("flagged") or {}).keys())
        for name, med in (f.get("queries") or {}).items():
            if name in flagged or med is None or med < 0:
                continue
            if name not in bands or med < bands[name]:
                bands[name] = med
    out = {
        "sf": sf,
        "source_rounds": used,
        "rule": "min unflagged driver-headline median over source_rounds; "
                "Bench flags median > 2x band as overband",
        "bands": {k: round(v, 3) for k, v in sorted(bands.items())},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"wrote {args.out}: {len(bands)} bands from rounds {used} (sf={sf})")


if __name__ == "__main__":
    main()
