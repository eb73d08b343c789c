#!/usr/bin/env python3
"""Dev tool: check which q20 (approaches table) columns are closed-form
in the flight id mods (flight%3 flavor, %5/%7/%11/%13 violations,
(flight+1)%8 airport), to derive/validate the q20 DuckDB oracle.

Usage: python3 tools/derive_q20.py [/tmp/verify_out/q20_approaches]
"""
import sys
from collections import defaultdict

import pyarrow.parquet as pq

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out/q20_approaches"
t = pq.read_table(path)
rows = t.to_pylist()
print(f"{len(rows)} rows, columns: {t.column_names}")

MODS = {
    "v3": lambda f: f % 3,
    "a5": lambda f: f % 5 == 0,
    "s7": lambda f: f % 7 == 0,
    "f11": lambda f: f % 11 == 0,
    "f13": lambda f: f % 13 == 0,
    "ap8": lambda f: (f + 1) % 8,
}

# for each column, find the smallest mod-subset that explains it
import itertools

for col in t.column_names:
    if col == "flight_id":
        continue
    vals = [(r["flight_id"], r[col]) for r in rows]
    explained = None
    for k in range(0, len(MODS) + 1):
        for combo in itertools.combinations(MODS, k):
            groups = defaultdict(set)
            for f, v in vals:
                key = tuple(MODS[m](f) for m in combo)
                groups[key].add(repr(v))
            if all(len(s) == 1 for s in groups.values()):
                explained = (combo, {k2: next(iter(s)) for k2, s in sorted(groups.items())})
                break
        if explained:
            break
    combo, mapping = explained if explained else (None, None)
    if combo is None:
        print(f"\n== {col}: NOT explained by mods (value varies within groups)")
        continue
    print(f"\n== {col}: function of {combo or 'CONSTANT'}")
    for key, v in list(mapping.items())[:40]:
        print(f"   {dict(zip(combo, key))} -> {v}")
