#!/usr/bin/env python3
"""Mechanical creep watch over the quiet bench record (r20, VERDICT r19
item 7): rig-normalized per-query ratios vs BASELINE.md, appended to a
round-labeled history, with monotone-growth flagging — so three rounds
of slow drift are visible from the artifact alone instead of by judge
memory.

Usage:
  python3 tools/creep_check.py                # report vs history, no write
  python3 tools/creep_check.py --record r20   # append current quiet record

Reads BENCH_QUIET.json (min + rig_factor) and BASELINE.md's figure
table; writes/reads tools/creep_history.json. Flags:
  - any query whose ratio exceeds GATE (2.0, the judge's gate),
  - 3-round monotone growth: the last two RECORDED rounds plus the
    current run strictly increasing (gaps never splice — a query absent
    from a record is not comparable across it),
  - the WATCHLIST queries whenever they grow vs the last record.
"""
import json
import re
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(ROOT, "tools", "creep_history.json")
GATE = 2.0
# r19 verdict's elevated set: creeping two rounds running
WATCHLIST = ["q58_neardup_blocked", "q44_approx_distinct", "q43_cube",
             "q78_tfidf", "q82_retention_delete", "q51_dedup_clusters"]


def baselines():
    # first occurrence wins: the headline figure table leads the file;
    # later sections restate query names inside scale-probe tables whose
    # second column is NOT a baseline. The figure cell may carry a
    # parenthetical re-base note after the number.
    out = {}
    pat = re.compile(r"^\|\s*(q\S+?)(?:\s*\(bench-only\))?\s*\|\s*([0-9.]+)")
    with open(os.path.join(ROOT, "BASELINE.md")) as f:
        for line in f:
            m = pat.match(line)
            if m and m.group(1) not in out:
                out[m.group(1)] = float(m.group(2))
    return out


def quiet_ratios():
    with open(os.path.join(ROOT, "BENCH_QUIET.json")) as f:
        q = json.load(f)
    rig = q["rig_factor"]
    base = baselines()
    ratios = {}
    for name, rec in q["queries"].items():
        if name in base and base[name] > 0 and rec["min"] > 0:
            ratios[name] = round((rec["min"] / rig) / base[name], 3)
    return ratios, rig


def main():
    record = None
    if len(sys.argv) > 1 and sys.argv[1] == "--record":
        if len(sys.argv) < 3:
            sys.exit("--record needs a round label (e.g. --record r20); "
                     "nothing was appended")
        record = sys.argv[2]
    ratios, rig = quiet_ratios()
    hist = []
    if os.path.exists(HIST):
        with open(HIST) as f:
            hist = json.load(f)
    labels = [h["label"] for h in hist]

    flagged = []
    for name, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        # last two RECORDED rounds + current; a gap (None) disqualifies
        # the window instead of splicing non-adjacent rounds together
        series = [h["ratios"].get(name) for h in hist[-2:]] + [r]
        rising = (len(series) == 3 and None not in series and
                  series[0] < series[1] < series[2])
        prev = hist[-1]["ratios"].get(name) if hist else None
        if r > GATE:
            flagged.append((name, series, f"OVER GATE {GATE}x"))
        elif rising:
            flagged.append((name, series, "monotone 3-round growth"))
        elif name in WATCHLIST and prev is not None and r > prev:
            flagged.append((name, series, "watchlist grew"))
    print(f"quiet record rig_factor={rig:.3f}, {len(ratios)} baselined queries")
    if flagged:
        for name, series, why in flagged:
            print(f"  CREEP {name}: {series} — {why}")
    else:
        print("  no creep flags")
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:5]
    print("  worst ratios:", ", ".join(f"{n}={r}" for n, r in worst))

    if record:
        if record in labels:
            print(f"  label {record} already recorded — not appending")
        else:
            hist.append({"label": record, "rig_factor": rig, "ratios": ratios})
            with open(HIST, "w") as f:
                json.dump(hist, f, indent=1, sort_keys=True)
            print(f"  recorded as {record} ({len(hist)} rounds in history)")
    sys.exit(1 if any("OVER GATE" in w for _, _, w in flagged) else 0)


if __name__ == "__main__":
    main()
