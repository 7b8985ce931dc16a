#!/usr/bin/env python3
"""Regenerate BENCH_sf1.json from one full-bench stdout capture.

Usage: python3 tools/make_bench_sf1.py <bench_stdout_file>

Extracts the single JSON line graft.Bench prints, then recomputes the
top-level `value` as the SUM OF THE HEADLINE TIME CELLS ONLY — the
`queries` dict also carries section/telemetry cells (counts, _mb,
_files_read, depth cells) that are NOT seconds, and summing the whole
dict corrupts `value` (the r12 lesson). Headline names are read from
Bench.scala's `headline` list so the two can never drift.
"""
import json
import re
import sys

bench_lines = open("src/main/scala/graft/Bench.scala").read().splitlines()
start = next(i for i, l in enumerate(bench_lines)
             if "val headline: Seq[String] = Seq(" in l)
headline = []
for l in bench_lines[start:]:
    headline += re.findall(r'"([a-z0-9_]+)"', l)
    if re.search(r'"\)', l):  # the list closes with `"name")`
        break

raw = open(sys.argv[1]).read()
line = next(l for l in raw.splitlines() if '{"metric"' in l)
j = json.loads(line[line.index('{'):])

cells = j["queries"]
missing = [n for n in headline if n not in cells]
value = sum(v for k, v in cells.items() if k in set(headline))
j["value"] = value
json.dump(j, open("BENCH_sf1.json", "w"))
print(f"headline rows: {len(headline)}, cells: {len(cells)}, "
      f"value (headline time sum): {value:.4f}")
if missing:
    print(f"WARNING: {len(missing)} headline rows missing a cell "
          f"(failed or capped): {missing}")
