#!/usr/bin/env python3
"""Per-query diff between two bench outputs.

Usage: python3 tools/bench_diff.py <old.txt> <new.txt> [ratio_threshold]

Each input is a file containing graft.Bench stdout (the per-query JSON line
and/or the BENCH_r{N}.json "tail" format). Prints queries slower than
`ratio_threshold`x (default 1.5), queries only in one file, failed queries
(graft.Bench >= round 9 emits a "failed" metric line), and totals — the
zero-regression check the judge applies between rounds. A query listed as
failed books its time-to-failure in the timings, so it is excluded from the
improved/regressed classification and reported on its own line instead: a
crash must never read as a speedup.
"""
import json
import re
import sys


def load(path):
    """Returns (best_of_2, noise, failed). noise[q] = |p1-p2| pass spread
    when the file carries the per_query_passes line (graft.Bench >= round
    5), else {}; failed = set of query names from the "failed" metric line
    (graft.Bench >= round 9), else empty.
    """
    text = open(path).read()
    best, noise, failed = None, {}, set()
    load.pin_build = getattr(load, "pin_build", {})
    # tolerate JSON-escaped quotes (driver tail re-encoding)
    m = re.search(r'pin_build\\?"?[^}]*?value\\?"?\s*:\s*([0-9.eE+-]+)', text)
    if m:
        load.pin_build[path] = float(m.group(1))
    for line in text.splitlines():
        line = line.strip()
        if '"per_query_passes"' in line:
            try:
                d = json.loads(line)
                p1, p2 = d.get("p1", {}), d.get("p2", {})
                noise = {k: abs(float(p1[k]) - float(p2[k]))
                         for k in set(p1) & set(p2)}
            except json.JSONDecodeError:
                pass
        elif '"failed"' in line:
            # {"metric":"failed","queries":[...],...} — queries is a LIST
            # here, so this line must be consumed before the generic
            # "queries" branch below (which expects a name->seconds map)
            try:
                d = json.loads(line)
                if d.get("metric") == "failed" and isinstance(d.get("queries"), list):
                    failed |= set(d["queries"])
            except json.JSONDecodeError:
                pass
        elif '"per_query"' in line or '"queries"' in line:
            try:
                d = json.loads(line)
                if isinstance(d.get("queries"), dict):
                    best = {k: float(v) for k, v in d["queries"].items()}
            except json.JSONDecodeError:
                pass
    if best is not None:
        return best, noise, failed
    # fall back: scrape "q_name":seconds pairs anywhere (driver tail format)
    # tolerate JSON-escaped quotes (the driver stores the tail re-encoded)
    pairs = re.findall(r'\\?"(q_[a-zA-Z0-9_]+)\\?":([0-9.eE+-]+)', text)
    if not pairs:
        sys.exit(f"no per-query timings found in {path}")
    return {k: float(v) for k, v in pairs}, {}, failed


def main():
    if len(sys.argv) < 3:
        sys.exit("usage: bench_diff.py <old.txt> <new.txt> [ratio_threshold]")
    old_path, new_path = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    (old, old_noise, old_failed) = load(old_path)
    (new, new_noise, new_failed) = load(new_path)

    def noise_of(q):
        return max(old_noise.get(q, 0.0), new_noise.get(q, 0.0))

    def noise_tag(q, delta):
        n = noise_of(q)
        if not old_noise and not new_noise:
            return ""
        verdict = "WITHIN NOISE" if abs(delta) <= n else "real"
        return f" [spread {n:.2f}s: {verdict}]"

    # failed queries carry time-to-failure, not a timing — keep them out
    # of the ratio classification entirely and report them first, loudest
    for q in sorted(new_failed):
        was = f"{old[q]:.2f}s" if q in old else "absent"
        print(f"FAILED    {q}: crashed in new run (old: {was}"
              + (", also failed in old" if q in old_failed else "") + ")")
    for q in sorted(old_failed - new_failed):
        print(f"fixed     {q}: failed in old run, clean in new")

    common = sorted((set(old) & set(new)) - old_failed - new_failed)
    regressions = [(q, old[q], new[q]) for q in common
                   if new[q] > old[q] * thr and new[q] - old[q] > 0.25]
    for q, o, n in sorted(regressions, key=lambda x: x[1] - x[2]):
        print(f"REGRESSED {q}: {o:.2f}s -> {n:.2f}s ({n / o:.2f}x)"
              + noise_tag(q, n - o))
    improved = [(q, old[q], new[q]) for q in common
                if old[q] > new[q] * thr and old[q] - new[q] > 0.25]
    for q, o, n in sorted(improved, key=lambda x: x[2] - x[1]):
        print(f"improved  {q}: {o:.2f}s -> {n:.2f}s ({n / o:.2f}x)"
              + noise_tag(q, n - o))
    for q in sorted(set(new) - set(old)):
        print(f"new       {q}: {new[q]:.2f}s")
    for q in sorted(set(old) - set(new)):
        print(f"removed   {q}: was {old[q]:.2f}s")
    co, cn = sum(old[q] for q in common), sum(new[q] for q in common)
    if not common or co == 0:
        print("== no common (non-failed) queries between the two runs")
    else:
        noisy = sum(1 for q, o, n in regressions if abs(n - o) <= noise_of(q)
                    and (old_noise or new_noise))
        print(f"== common {len(common)} queries: {co:.1f}s -> {cn:.1f}s "
              f"({cn / co:.2f}x); {len(regressions)} regressed >{thr}x "
              f"({noisy} within pass spread), {len(improved)} improved >{thr}x"
              + (f"; {len(new_failed)} FAILED in new" if new_failed else ""))
    pins = getattr(load, "pin_build", {})
    for path in (old_path, new_path):
        if path in pins:
            print(f"== pin_build {path}: {pins[path]:.1f}s spent materializing "
                  "pinned views (inside pass 1; pass 2 rides the warm index)")


if __name__ == "__main__":
    main()
