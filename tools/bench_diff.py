#!/usr/bin/env python3
"""Per-query diff between two bench outputs.

Usage: python3 tools/bench_diff.py <old.txt> <new.txt> [ratio_threshold]

Each input is a file containing graft.Bench stdout (the per-query JSON line
and/or the BENCH_r{N}.json "tail" format). Prints queries slower than
`ratio_threshold`x (default 1.5), queries only in one file, and totals —
the zero-regression check the judge applies between rounds.
"""
import json
import re
import sys


def load(path):
    text = open(path).read()
    # try proper JSON lines first
    for line in text.splitlines():
        line = line.strip()
        if '"per_query"' in line or '"queries"' in line:
            try:
                d = json.loads(line)
                if "queries" in d:
                    return {k: float(v) for k, v in d["queries"].items()}
            except json.JSONDecodeError:
                pass
    # fall back: scrape "q_name":seconds pairs anywhere (driver tail format)
    # tolerate JSON-escaped quotes (the driver stores the tail re-encoded)
    pairs = re.findall(r'\\?"(q_[a-zA-Z0-9_]+)\\?":([0-9.eE+-]+)', text)
    if not pairs:
        sys.exit(f"no per-query timings found in {path}")
    return {k: float(v) for k, v in pairs}


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, new = load(old_path), load(new_path)
    common = sorted(set(old) & set(new))
    regressions = [(q, old[q], new[q]) for q in common
                   if new[q] > old[q] * thr and new[q] - old[q] > 0.25]
    for q, o, n in sorted(regressions, key=lambda x: x[1] - x[2]):
        print(f"REGRESSED {q}: {o:.2f}s -> {n:.2f}s ({n / o:.2f}x)")
    improved = [(q, old[q], new[q]) for q in common
                if old[q] > new[q] * thr and old[q] - new[q] > 0.25]
    for q, o, n in sorted(improved, key=lambda x: x[2] - x[1]):
        print(f"improved  {q}: {o:.2f}s -> {n:.2f}s ({n / o:.2f}x)")
    for q in sorted(set(new) - set(old)):
        print(f"new       {q}: {new[q]:.2f}s")
    for q in sorted(set(old) - set(new)):
        print(f"removed   {q}: was {old[q]:.2f}s")
    co, cn = sum(old[q] for q in common), sum(new[q] for q in common)
    print(f"== common {len(common)} queries: {co:.1f}s -> {cn:.1f}s "
          f"({cn / co:.2f}x); {len(regressions)} regressed >{thr}x, "
          f"{len(improved)} improved >{thr}x")


if __name__ == "__main__":
    main()
