#!/usr/bin/env python3
"""Scale-rehearsal report: read the per-scale ScaleRehearsal JSON lines
and print a table of per-op seconds, output rows, and fitted scaling
exponents (least-squares slope of log t vs log multiplier, plus the
work-normalized seconds-per-output-row trend for candidate-bound ops).

Usage: python3 tools/scale_report.py /tmp/scale_x1.full.log /tmp/scale_x3.full.log /tmp/scale_x10.full.log
"""
import json
import math
import sys


def main(paths):
    runs = {}  # op -> [(mult, seconds, rows)]
    for p in paths:
        for line in open(p):
            line = line.strip()
            if not line.startswith('{"op"'):
                continue
            d = json.loads(line)
            runs.setdefault(d["op"], []).append((d["mult"], d["seconds"], d["rows"]))
    print(f"{'op':26} " + " ".join(f"{'x%g' % m:>10}" for m in sorted({m for v in runs.values() for m, _, _ in v}))
          + f" {'t-expon':>8} {'rows-expon':>10} {'t/row-expon':>11}")
    for op, pts in runs.items():
        pts.sort()
        ms = [math.log10(m) for m, _, _ in pts]
        ts = [math.log10(s) for _, s, _ in pts]
        rs = [math.log10(max(r, 1)) for _, _, r in pts]
        def slope(xs, ys):
            n = len(xs)
            mx, my = sum(xs) / n, sum(ys) / n
            den = sum((x - mx) ** 2 for x in xs)
            return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / den if den else float("nan")
        a_t = slope(ms, ts)
        a_r = slope(ms, rs)
        a_tr = slope(ms, [t - r for t, r in zip(ts, rs)])
        cells = " ".join(f"{s:>9.1f}s" for _, s, _ in pts)
        print(f"{op:26} {cells} {a_t:>8.2f} {a_r:>10.2f} {a_tr:>11.2f}")
    print("\nrows per scale:")
    for op, pts in runs.items():
        print(f"  {op:26} " + " ".join(f"{r:>12,}" for _, _, r in sorted(pts)))


if __name__ == "__main__":
    main(sys.argv[1:])
