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
    if "queries" not in d and "qid" not in d:
        parsed = d.get("parsed")
        if isinstance(parsed, dict) and ("queries" in parsed
                                         or "qid" in parsed):
            d = parsed
        else:
            tail = d.get("tail", "")
            try:
                i = tail.index('{"q')
                depth, j = 0, i
                for j in range(i, len(tail)):
                    depth += tail[j] == "{"
                    depth -= tail[j] == "}"
                    if depth == 0:
                        break
                qs = json.loads(tail[i:j + 1])
            except ValueError:
                # tail cut at the FRONT (starts mid-object, e.g.
                # BENCH_r09): regex-salvage whatever pairs survive and
                # report a PARTIAL comparison instead of crashing
                import re
                qs = {m.group(1): float(m.group(2)) for m in
                      re.finditer(r'"(q\d+[a-z_]*)":([0-9][0-9.]*)', tail)}
                if not qs:
                    # round-16+ paired-array encoding, front-cut. The
                    # value array (qcs/qds) FOLLOWS qid in the line, so
                    # a front cut leaves it complete while qid keeps
                    # only a suffix — align by zipping from the tail:
                    # surviving qid[k..] pairs with qcs[n-k..].
                    m = re.search(r'"q(cs|ds)":\[([0-9,]*)\]', tail)
                    if m:
                        scale = 100.0 if m.group(1) == "cs" else 10.0
                        vals = [int(x) for x in m.group(2).split(",") if x]
                        idseg = tail[:m.start()]
                        close = idseg.rfind("]")
                        opn = idseg.rfind("[", 0, close)
                        clean = opn >= 0 and idseg[:opn].endswith('"qid":')
                        seg = idseg[opn + 1:close] if opn >= 0 \
                            else idseg[:close]
                        ids = [int(x) for x in seg.split(",")
                               if x.strip().isdigit()]
                        if not clean and ids:
                            # the first surviving id may itself be a
                            # number cut mid-digits — drop it
                            ids = ids[1:]
                        ids = ids[-len(vals):]
                        qs = {f"q{i}": v / scale
                              for i, v in zip(ids, vals[-len(ids):])}
                if not qs:
                    sys.exit(f"ERROR: {path} tail is truncated and "
                             "salvage recovered ZERO per-query entries "
                             "— refusing a silent empty comparison")
                # a front cut never removes the TRAILING load fields —
                # let the recovery below scan the whole surviving tail
                j = 0
                print(f"NOTE: {path} tail is front-truncated — "
                      f"salvaged {len(qs)} per-query entries (partial)")
            rebuilt = {"queries": qs}
            # the tail may also carry the load fields AFTER the queries
            # object — recover them, or load_verdict() would misreport
            # a load-contaminated run as merely "unrecorded"
            for key in ("loadavg_start", "loadavg_end"):
                k = tail.find(f'"{key}":[', j)
                if k >= 0:
                    close = tail.index("]", k)
                    rebuilt[key] = json.loads(
                        tail[k + len(key) + 3:close + 1])
            d = rebuilt
    if "queries" in d:
        qs = {k.split("_")[0]: v for k, v in d["queries"].items()}
    else:
        # round-16 compact encoding: paired arrays qid (numeric query
        # ids) + qcs (centiseconds) or qds (deciseconds) — the full
        # query map re-shaped so the driver's 2000-char tail window
        # always holds one complete, parseable line
        vals, scale = (d["qcs"], 100.0) if "qcs" in d else (d["qds"], 10.0)
        qs = {f"q{i}": v / scale for i, v in zip(d["qid"], vals)}
    load = d.get("loadavg_start", [None]), d.get("loadavg_end", [None])
    return qs, load


def load_verdict(load):
    start, end = load
    if start[0] is None or end[0] is None:
        return "load unrecorded (pre-round-9 artifact) — treat with care"
    # the bench's own 32-core burst inflates load1/load5 at END; the
    # comparable-run signal is the EXTERNAL load, best read from the
    # START snapshot — and load5 there matters as much as load1 (a
    # round-9 run at load1 1.1 / load5 3.4 measured ~30% slower across
    # the board than the same HEAD idle)
    if start[0] > 3 or (len(start) > 1 and start[1] > 2.5):
        return (f"NON-COMPARABLE: external load at start "
                f"(load1 {start[0]}, load5 {start[1]})")
    return f"ok (start load1/5 {start[0]}/{start[1] if len(start) > 1 else '?'})"


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
    # the round-10 verdict's per-query regression gate: flag every
    # shared query that moved > 15% AND > 0.2 s (the absolute floor
    # keeps sub-second queries' scheduling jitter out of the list)
    moves = [(q, b[q] - a[q], (b[q] - a[q]) / a[q] * 100)
             for q in shared
             if a[q] > 0 and abs(b[q] - a[q]) > 0.2
             and abs(b[q] - a[q]) / a[q] > 0.15]
    moves.sort(key=lambda kv: -abs(kv[2]))
    print(f"moves > 15% and > 0.2 s: {len(moves)}")
    for q, dv, pc in moves:
        print(f"  {q:8s}{dv:+6.2f} ({pc:+5.0f}%)  "
              f"(A {a[q]:5.2f} / B {b[q]:5.2f})")
    added = sorted(set(b) - set(a))
    removed = sorted(set(a) - set(b))
    if added:
        print("only in B:", ", ".join(f"{q} ({b[q]:.2f}s)" for q in added))
    if removed:
        print("only in A:", ", ".join(f"{q} ({a[q]:.2f}s)" for q in removed))
    # one machine-grep-able verdict line: the comparable-subset delta
    # is meaningful only when BOTH runs pass the load gate
    gates_ok = all(not load_verdict(l).startswith("NON-COMPARABLE")
                   and "unrecorded" not in load_verdict(l)
                   for l in (la, lb))
    print(f"VERDICT: comparable-subset ({len(shared)} queries) "
          f"{pct:+.1f}%, {len(moves)} flagged moves, "
          f"load-gate {'OK' if gates_ok else 'FAILED — delta unreliable'}")
    return 0


if __name__ == "__main__":
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    sys.exit(main(sys.argv[1], sys.argv[2], top))
