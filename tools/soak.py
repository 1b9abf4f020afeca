#!/usr/bin/env python3
"""Promote the 10x soak to a machine-comparable artifact (VERDICT r16
#5): graft.Stress prints per-probe walls + one counts JSON line, but
as PLANS prose the 10x trend was only eyeball-comparable. This runs
the soak once (idle box, one sbt/Spark — the ops_cards rule), parses
every `[stress] <probe> <sec>s` line and the final counts object, and
writes docs/soak_r{N}.json so probe walls and replication invariants
(e.g. triangles = mult x base, hll registers bit-identical) band
round-over-round the way bench medians do.

Usage:
    python3 tools/soak.py --round 17                 # sf0.1, mult 10
    python3 tools/soak.py --round 17 --sf /root/testdata/sf0.01 --mult 20
"""
import argparse
import json
import os
import re
import subprocess
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()
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


if __name__ == "__main__":
    main()
