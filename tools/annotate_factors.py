#!/usr/bin/env python3
"""Retrofit a bench_summary-style record's total line with the round-16
provenance fields Bench now emits natively: a self-consistent
host_factor (min start kernel over passes that were clean END TO END —
not the min over all passes, which the round-15 review showed can come
from a pass whose middle collapsed and loosen the anchor gate ~1.45x)
plus per-key query_factors / all_keys_clean / unclean_keys derived from
the record's own pass lines by the exact rule Bench.scala ships
(Pass.brackets / cleanBracket / bracketFactor + provOver):

 - a key's observations are (time, bracket-min factor, clean) triples,
   one per pass line that timed it, where the brackets are the
   calibration kernels adjacent to the key's family segment
   (host_factor_segments = [start, boundary1, boundary2, end]; lines
   without segments fall back to (start, end));
 - the min ignores failed (-1) observations; its factor is the
   bracket-min of the pass achieving the min (clean preferred on
   ties, then the smaller factor);
 - clean = both bracketing kernels measured and <= the gate (2.0).

Purpose: make pinned records (BASELINE_noop_anchor.json) self-
consistent instead of relying on bench_trend's load-time re-derivation
(round-15 ADVICE), and give pre-r16 records the per-key normalization
r16+ records carry natively. Idempotent; rewrites in place.

Usage: python3 tools/annotate_factors.py <record.json> [--gate 2.0]
"""
import argparse
import json
import sys

FAMS = ("queries", "scale_queries", "streaming_queries")


def r3(x):
    return round(x * 1000) / 1000.0


def pass_brackets(p, fam_idx):
    """(left, right) calibration kernels adjacent to the family's
    segment in this pass line; (start, end) when the line predates
    boundary kernels."""
    segs = p.get("host_factor_segments") or []
    if len(segs) >= 4:
        return segs[fam_idx], segs[fam_idx + 1]
    start = p.get("host_factor")
    end = p.get("host_factor_end")
    return (start if start is not None else -1.0,
            end if end is not None else -1.0)


def bracket_factor(left, right):
    ok = [f for f in (left, right) if f is not None and f > 0]
    return min(ok) if ok else -1.0


def clean_bracket(left, right, gate):
    return (left is not None and right is not None and
            left > 0 and right > 0 and left <= gate and right <= gate)


def derive(record, gate):
    """(host_factor, {fam: {key: factor}}, unclean_keys)."""
    passes = record.get("passes") or []
    full = [p for p in passes
            if p.get("metric") not in ("retry", "salvage")]
    clean_starts = [p.get("host_factor") for p in full
                    if not p.get("degraded_start")
                    and not p.get("degraded_mid")
                    and p.get("host_factor") is not None
                    and p.get("host_factor") > 0]
    ok_starts = [p.get("host_factor") for p in full
                 if p.get("host_factor") is not None
                 and p.get("host_factor") > 0]
    hf = min(clean_starts) if clean_starts else (
        min(ok_starts) if ok_starts else -1.0)

    factors = {}
    unclean = []
    for fi, fam in enumerate(FAMS):
        obs = {}
        for p in passes:
            left, right = pass_brackets(p, fi)
            bf = bracket_factor(left, right)
            cl = clean_bracket(left, right, gate)
            for k, v in (p.get(fam) or {}).items():
                if v is None or v < 0:
                    continue
                obs.setdefault(k, []).append((v, bf, cl))
        for k, o in obs.items():
            mn = min(v for v, _, _ in o)
            winner = sorted((x for x in o if x[0] == mn),
                            key=lambda x: (not x[2], x[1]))[0]
            if winner[1] > 0:
                factors.setdefault(fam, {})[k] = r3(winner[1])
            if not any(cl for _, _, cl in o):
                unclean.append(k)
    return hf, factors, sorted(unclean)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("record")
    ap.add_argument("--gate", type=float, default=2.0)
    args = ap.parse_args()
    with open(args.record) as f:
        record = json.load(f)
    total = record.get("total")
    if not total:
        print("no total line — nothing to annotate", file=sys.stderr)
        return 1
    hf, factors, unclean = derive(record, args.gate)
    qf = {}
    for fam in FAMS:
        # only keys the total actually reports carry factors
        qf.update({k: v for k, v in (factors.get(fam) or {}).items()
                   if k in (total.get(fam) or {})})
    reported = set()
    for fam in FAMS:
        reported.update(k for k, v in (total.get(fam) or {}).items()
                        if v is not None and v >= 0)
    unclean = [k for k in unclean if k in reported]
    old_hf = total.get("host_factor")
    total["host_factor"] = r3(hf) if hf > 0 else old_hf
    total["query_factors"] = qf
    total["unclean_keys"] = unclean
    total["n_unclean"] = len(unclean)
    total["all_keys_clean"] = not unclean
    with open(args.record, "w") as f:
        json.dump(record, f)
        f.write("\n")
    print(f"{args.record}: host_factor {old_hf} -> "
          f"{total['host_factor']}, {len(qf)} query_factors, "
          f"{len(unclean)} unclean, all_keys_clean="
          f"{total['all_keys_clean']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
