#!/usr/bin/env python3
"""Cross-round bench trend report.

Reads every bench_summary_r*.json in the repo root and, for each pair
of consecutive rounds, compares the per-query min-of-N times from the
"total" record after normalizing by the recorded host_factor (the
calibration-kernel slowdown measured at pass start: seconds are
divided by it, so a slow host doesn't read as a code regression).

Flags queries whose normalized time grew by more than --threshold
(default 1.5x) AND by more than --floor seconds (default 0.3 s —
sub-second entries flap with scheduler noise). This is the slow-drift
net the per-round 2x driver gate can't see: a query regressing 1.3x
every round passes each gate and doubles in three rounds.

Usage: python3 tools/bench_trend.py [--threshold 1.5] [--floor 0.3]
"""
import argparse
import glob
import json
import os
import re
import sys


def load_rounds(root):
    rounds = []
    for path in sorted(glob.glob(os.path.join(root, "bench_summary_r*.json"))):
        m = re.search(r"bench_summary_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                d = json.load(f)
        except (json.JSONDecodeError, OSError) as e:
            print(f"  [skip] {os.path.basename(path)}: {e}", file=sys.stderr)
            continue
        total = d.get("total") or {}
        queries = {}
        for fam in ("queries", "scale_queries", "streaming_queries"):
            queries.update(total.get(fam) or {})
        hf = total.get("host_factor") or 1.0
        if not queries:
            continue
        rounds.append((int(m.group(1)), hf, queries))
    return rounds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="flag growth beyond this ratio (normalized)")
    ap.add_argument("--floor", type=float, default=0.3,
                    help="ignore absolute growth under this many seconds")
    ap.add_argument("--raw-threshold", type=float, default=1.2,
                    dest="raw_threshold",
                    help="when a round pair is calibration-skewed "
                         "(normalized total inflated past this ratio over "
                         "a flat raw total), a flag must also regress raw "
                         "beyond this ratio to count")
    ap.add_argument("--root", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args()

    rounds = load_rounds(args.root)
    if len(rounds) < 2:
        print(f"need >=2 bench_summary_r*.json records, found {len(rounds)}")
        return 0

    print(f"rounds: {[r[0] for r in rounds]}  "
          f"(times normalized by each round's host_factor)")
    any_flag = False
    for (ra, hfa, qa), (rb, hfb, qb) in zip(rounds, rounds[1:]):
        common = sorted(set(qa) & set(qb))
        na = sum(qa[k] for k in common if qa[k] > 0) / hfa
        nb = sum(qb[k] for k in common if qb[k] > 0) / hfb
        print(f"\nr{ra:02d} -> r{rb:02d}: {len(common)} common keys, "
              f"normalized totals {na:.1f}s -> {nb:.1f}s "
              f"({nb / na:.2f}x)  [host_factor {hfa} -> {hfb}]")
        # calibration-skew diagnosis for the PAIR (r10 post-mortem: an
        # extreme host_factor=0.592 pass inflated every normalized time
        # ~1.4x while raw min totals IMPROVED). Only when the batch
        # shows that signature — normalized total up, raw total flat —
        # do raw-flat per-key flags demote to suspects; otherwise every
        # normalized flag reports (annotated with its raw ratio), so a
        # genuine regression under an honestly-faster host still exits 1.
        rawA = sum(qa[k] for k in common if qa[k] > 0 and qb[k] > 0)
        rawB = sum(qb[k] for k in common if qa[k] > 0 and qb[k] > 0)
        skewed = rawA > 0 and na > 0 and \
            rawB / rawA < 1.1 and (nb / na) / (rawB / rawA) > args.raw_threshold
        if skewed:
            print("  [calibration-skew detected: normalized total "
                  f"{nb / na:.2f}x vs raw total {rawB / rawA:.2f}x — "
                  "raw-flat flags demote to suspects]")
        flagged = []
        suspects = []
        for k in common:
            a, b = qa[k], qb[k]
            if a <= 0 or b <= 0:
                continue  # -1 = failed/capped entry; absence is its own alarm
            an, bn = a / hfa, b / hfb
            if bn > an * args.threshold and bn - an > args.floor:
                if skewed and b <= a * args.raw_threshold:
                    suspects.append((k, an, bn, a, b))
                else:
                    flagged.append((k, an, bn, a, b))
        for k, an, bn, a, b in sorted(flagged, key=lambda t: t[1] - t[2]):
            print(f"  REGRESSED {k}: {an:.2f}s -> {bn:.2f}s "
                  f"({bn / an:.2f}x normalized, {b / a:.2f}x raw)")
            any_flag = True
        if suspects:
            sa = sum(t[3] for t in suspects)
            sb = sum(t[4] for t in suspects)
            print(f"  host-artifact suspects (normalized ratio trips, raw "
                  f"does not): {len(suspects)} keys, raw sums "
                  f"{sa:.1f}s -> {sb:.1f}s ({sb / sa:.2f}x)")
        gone = sorted(set(qa) - set(qb))
        if gone:
            print(f"  dropped keys: {', '.join(gone)}")
        if not flagged:
            print("  no regressions past "
                  f"{args.threshold}x/+{args.floor}s")
    return 1 if any_flag else 0


if __name__ == "__main__":
    sys.exit(main())
