#!/usr/bin/env python3
"""Compare two graft bench JSON outputs per query.

Usage: bench_compare.py OLD.json NEW.json [--threshold 1.5]

Flags queries slower than threshold× the old time (ignoring sub-100ms
noise), lists new/removed queries, and prints totals.
"""
import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    # tolerate sbt-wrapped output: find the metric line
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("[info]"):
            line = line[len("[info]"):].strip()
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    d = json.loads(text)
    if "queries" not in d and isinstance(d.get("tail"), str):
        # driver BENCH_r{N}.json wrapper: the metric line is embedded in the
        # captured sbt tail as an escaped substring
        import re
        m = re.search(r'\{"metric".*?"queries":\{.*?\}.*?\}', d["tail"])
        if m:
            return json.loads(m.group(0))
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=0.1,
                    help="ignore regressions where both times are under this")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old["queries"], new["queries"]

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    regressions = []
    for name in sorted(set(oq) & set(nq)):
        o, n = oq[name], nq[name]
        if max(o, n) < args.min_sec:
            continue
        if n > o * args.threshold:
            regressions.append((name, o, n, n / o))

    print(f"old total {old['value']:.2f}s ({len(oq)} queries)  "
          f"new total {new['value']:.2f}s ({len(nq)} queries)")
    if added:
        print(f"added ({len(added)}): " +
              ", ".join(f"{q}={nq[q]:.2f}s" for q in added))
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    if regressions:
        print(f"REGRESSIONS (> {args.threshold}x):")
        for name, o, n, r in sorted(regressions, key=lambda x: -x[3]):
            print(f"  {name}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    else:
        print(f"no per-query regressions > {args.threshold}x")
    comparable = [q for q in set(oq) & set(nq)]
    if comparable:
        ot = sum(oq[q] for q in comparable)
        nt = sum(nq[q] for q in comparable)
        print(f"comparable-set total: {ot:.2f}s -> {nt:.2f}s ({nt/ot:.2f}x)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
