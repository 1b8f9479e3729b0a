#!/usr/bin/env python3
"""Join two ScaleCheck logs (sf0.1 + sf1.0) into per-query 10x ratios.

Usage: python3 tools/scale_ratio.py <sf01log> <sf10log> [flag_ratio]
Prints one line per query: name sf0.1s sf1.0s ratio rows01->rows10,
sorted by ratio descending, and a FLAG marker past the threshold
(default 3.0).
"""
import re
import sys


def parse(path, label):
    # keyed by FILE OF ORIGIN, not by a substring of the dir path: the
    # SPARK_GRAFT_SCALE_DIRS override means custom dirs need not contain
    # "sf1.0", and substring-bucketing would silently collapse them.
    # A log covering both dirs keeps the small scale under `label` and
    # anything under a different dir under the other label.
    out = {}
    dirs = {}
    for line in open(path, errors="replace"):
        m = re.match(
            r"SCALE (\S+) (\S+) wall=([0-9.]+) rows=(\d+)", line.strip())
        if m:
            name, d, w, r = m.group(1), m.group(2), float(m.group(3)), int(m.group(4))
            if d not in dirs:  # first dir seen = this file's label
                dirs[d] = label if not dirs else (
                    "sf1.0" if label == "sf0.1" else "sf0.1")
            out.setdefault(name, {})[dirs[d]] = (w, r)
    return out


def main(a, b, flag=3.0):
    pa, pb = parse(a, "sf0.1"), parse(b, "sf1.0")
    merged = {}
    for src in (pa, pb):
        for name, d in src.items():
            merged.setdefault(name, {}).update(d)
    rows = []
    for name, d in merged.items():
        if "sf0.1" in d and "sf1.0" in d:
            w0, r0 = d["sf0.1"]
            w1, r1 = d["sf1.0"]
            rows.append((w1 / max(w0, 1e-9), name, w0, w1, r0, r1))
        else:
            print(f"MISSING {name}: {sorted(d)}")
    rows.sort(reverse=True)
    for ratio, name, w0, w1, r0, r1 in rows:
        mark = " FLAG" if ratio > flag else ""
        print(f"{name:28s} {w0:7.2f} {w1:7.2f} {ratio:5.1f}x rows {r0}->{r1}{mark}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 3.0)
