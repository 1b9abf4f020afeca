#!/usr/bin/env python3
"""Local driver-sim: run DuckDB oracle SQL against the same testdata
and compare with the parquet dumped by `graft.Verify`.

Usage:
  python3 tools/check.py <sfdir> <verify_outdir> [query ...]

Assumes Verify has already been run into <verify_outdir>. Compares
exactly: columns sorted by name, rows sorted by all columns, values
must match (floats exactly; small diffs reported with magnitude).

The row/column sort mirrors the DRIVER's compare (it also sorts both
sides before hashing) — it is NOT a weakening of the gate. Queries
still end in a total order as a debugging convenience (stable diffs
when a row mismatches), not because the compare needs it.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="last")
    return df.reset_index(drop=True)


def values_equal(a, b):
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    import numbers
    is_bool = lambda x: isinstance(x, (bool,)) or type(x).__name__ == "bool_"
    if is_bool(a) or is_bool(b):
        return is_bool(a) and is_bool(b) and bool(a) == bool(b)
    is_int = lambda x: isinstance(x, numbers.Integral)
    if is_int(a) and is_int(b):
        return int(a) == int(b)  # exact — no float round-trip past 2^53
    if is_int(a) != is_int(b) and isinstance(a, numbers.Number) \
            and isinstance(b, numbers.Number):
        # int-vs-float type drift (e.g. DuckDB HUGEINT → float64 vs
        # Spark bigint) breaks the driver's type-sensitive hash — fail
        # here so the local gate is as strict as the real one.
        return False
    if isinstance(a, numbers.Number) and isinstance(b, numbers.Number):
        fa, fb = float(a), float(b)
        return fa == fb or (math.isnan(fa) and math.isnan(fb))
    # array cells (a LIST-valued oracle column): `a == b` would return
    # an elementwise array whose truthiness raises and kills the whole
    # gate — compare as plain lists, element by element. This runs
    # BEFORE the cross-type name guard: a numpy ndarray on one side vs
    # a plain list/tuple on the other (possible across duckdb/pandas
    # versions) is a representation difference, not engine type drift,
    # and the guard would otherwise red the gate on an environment bump
    if (hasattr(a, "tolist") or isinstance(a, (list, tuple))) and (
            hasattr(b, "tolist") or isinstance(b, (list, tuple))):
        la = a.tolist() if hasattr(a, "tolist") else list(a)
        lb = b.tolist() if hasattr(b, "tolist") else list(b)
        return len(la) == len(lb) and all(
            values_equal(x, y) for x, y in zip(la, lb))
    # cross-type equality (e.g. "42" vs 42) must FAIL: type drift
    # between engines is exactly what this gate exists to catch
    if type(a).__name__ != type(b).__name__ and not (
            hasattr(a, "isoformat") and hasattr(b, "isoformat")):
        return False
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sfdir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(outdir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        qdir = Path(outdir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(qdir))
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = []
        for c in got.columns:
            gv, wv = got[c].tolist(), want[c].tolist()
            for i, (x, y) in enumerate(zip(gv, wv)):
                if not values_equal(x, y):
                    bad.append((c, i, x, y))
                    if len(bad) > 4:
                        break
            if len(bad) > 4:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ value diffs, e.g. {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
