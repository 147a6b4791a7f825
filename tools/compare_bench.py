#!/usr/bin/env python3
"""Cross-round bench diff with the host-load protocol applied.

Usage: python3 tools/compare_bench.py <benchA.json> <benchB.json> [topN]

Accepts either a raw Bench stdout line ({"metric":...,"queries":{...}})
or a driver BENCH_r*.json wrapper (whose "parsed" or "tail" carries the
line). Query names are compared on their qNN prefix, so cosmetic
renames don't break the diff. Prints: shared-sum delta, the largest
per-query deltas, added/removed queries, and a LOAD VERDICT — per the
README protocol, a run whose load1 exceeded ~3 at either end is flagged
non-comparable (the same HEAD has measured 69 s idle vs 86 s at
load ~2.4).

(Driver-side tooling only — the Scala engine does not depend on this.)
"""
import json
import sys


def extract(path):
    text = open(path).read()
    try:
        d = json.loads(text.splitlines()[0])
    except json.JSONDecodeError:
        d = json.loads(text)
    if "queries" not in d:
        parsed = d.get("parsed")
        if isinstance(parsed, dict) and "queries" in parsed:
            d = parsed
        else:
            tail = d.get("tail", "")
            i = tail.index('{"q')
            depth, j = 0, i
            for j in range(i, len(tail)):
                depth += tail[j] == "{"
                depth -= tail[j] == "}"
                if depth == 0:
                    break
            d = {"queries": json.loads(tail[i:j + 1])}
    qs = {k.split("_")[0]: v for k, v in d["queries"].items()}
    load = d.get("loadavg_start", [None]), d.get("loadavg_end", [None])
    return qs, load


def load_verdict(load):
    start, end = load
    if start[0] is None or end[0] is None:
        return "load unrecorded (pre-round-9 artifact) — treat with care"
    l1 = max(start[0], end[0])
    if l1 > 3:
        return f"NON-COMPARABLE: load1 peaked at {l1} (> 3)"
    return f"ok (load1 start {start[0]}, end {end[0]})"


def main(a_path, b_path, top=15):
    a, la = extract(a_path)
    b, lb = extract(b_path)
    print(f"A = {a_path}: {len(a)} queries, {load_verdict(la)}")
    print(f"B = {b_path}: {len(b)} queries, {load_verdict(lb)}")
    shared = sorted(set(a) & set(b))
    sa, sb = sum(a[q] for q in shared), sum(b[q] for q in shared)
    pct = (sb - sa) / sa * 100 if sa else 0
    print(f"shared ({len(shared)}): A {sa:.1f} s -> B {sb:.1f} s "
          f"({pct:+.1f}%)")
    deltas = sorted(((q, b[q] - a[q]) for q in shared),
                    key=lambda kv: -abs(kv[1]))
    print(f"largest deltas (top {top}):")
    for q, dv in deltas[:top]:
        print(f"  {q:8s}{dv:+6.2f}  (A {a[q]:5.2f} / B {b[q]:5.2f})")
    added = sorted(set(b) - set(a))
    removed = sorted(set(a) - set(b))
    if added:
        print("only in B:", ", ".join(f"{q} ({b[q]:.2f}s)" for q in added))
    if removed:
        print("only in A:", ", ".join(f"{q} ({a[q]:.2f}s)" for q in removed))
    return 0


if __name__ == "__main__":
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    sys.exit(main(sys.argv[1], sys.argv[2], top))
