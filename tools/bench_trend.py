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

Streaming keys get a second lens: the min-of-N TOTAL hides 2x
pass-to-pass swings (pass scheduling, source listing, query startup)
that would mask a real regression — r12 saw s14 hit 7.47 s on one
pass vs a 3.06 s min while its per-batch cost never moved. So for
streaming keys the report also tracks the PER-BATCH MAX from each
pass's streaming_detail (the number that matters for a monitor:
state-update cost per trigger), normalized by host_factor:
 - cross-round: min-of-passes per-batch max compared like any other
   key (these DO flag as regressions);
 - within-round: keys whose total swings across passes while the
   per-batch max stays flat are reported as sum-vs-max divergence —
   harness/pacing variance, informational, not a gate.

Trust rules (round 14, extended round 16):
 - records whose passes ALL began above Bench's start-health gate
   (degraded_start, or derived for pre-flag records from per-pass
   host_factor > 2.0) are reported and then SKIPPED for trending —
   the r13 driver record (one pass begun at 4.66) is the archetype;
 - EXCEPT when the record self-reports all_keys_clean=true (r16+
   Bench: contention salvage re-measured every key that lacked a
   clean-bracketed observation, so each reported min is backed by a
   measurement taken between healthy calibration kernels) — such a
   record is usable even though no FULL pass was clean end to end;
 - r16+ records carry total.query_factors (per-key pass-of-origin
   bracket-min factors); when present each key normalizes by ITS
   factor instead of the one record-level host_factor, collapsing
   the cross-pass normalization ambiguity BASELINE.md documents;
 - the latest noop-era round is also compared against the pinned
   anchor in BASELINE_noop_anchor.json (see BASELINE.md — r15
   health-gated min-of-4 since round 15, r13 clean min-of-3 before),
   the like-for-like baseline for the 2x gate after the count() ->
   noop write action change. When noop-era rounds exist but NONE is
   usable, the gate loudly reports NOT EVALUATED and exits 1 — it
   must never silently fall back to the pre-noop informational skip.

Usage: python3 tools/bench_trend.py [--threshold 1.5] [--floor 0.3]
"""
import argparse
import glob
import json
import os
import re
import sys


def load_record(path):
    """(host_factor, per-key times, per-pass streaming obs, degraded,
    per-key factors) or None for an unreadable / empty record."""
    try:
        with open(path) as f:
            d = json.load(f)
    except (json.JSONDecodeError, OSError) as e:
        print(f"  [skip] {os.path.basename(path)}: {e}", file=sys.stderr)
        return None
    total = d.get("total") or {}
    queries = {}
    for fam in ("queries", "scale_queries", "streaming_queries"):
        queries.update(total.get(fam) or {})
    if not queries:
        return None
    hf = total.get("host_factor") or 1.0
    # per-key pass-of-origin bracket-min factors (r16+): normalize each
    # key by the host health of the segment its min was measured in,
    # not one record-level number
    factors = total.get("query_factors") or {}
    if "degraded_start" in total:
        # degraded_mid (round 15): no full pass was clean END TO END —
        # Bench re-runs the calibration kernel at family boundaries and
        # pass end, so a start-healthy pass that collapsed mid-pass
        # (the r14 t101-t105 block, 20-40x inflated between healthy
        # start/end kernels) now flags. Either flag refuses the record.
        degraded = bool(total.get("degraded_start")) or \
            bool(total.get("degraded_mid"))
        # salvage rescue (round 16): the pass-level flags stay honest,
        # but when contention salvage left EVERY reported key with a
        # clean-bracketed observation the mins cannot be inflated —
        # the record is usable despite its degraded passes
        if degraded and total.get("all_keys_clean") is True:
            print(f"  [{os.path.basename(path)}: degraded at pass level "
                  "but all_keys_clean (salvage provenance) — usable]")
            degraded = False
    else:
        # pre-r14 records predate the flag: derive it the same way Bench
        # does — degraded only when EVERY pass began above the start gate
        # (2.0) or with a failed calibration. This retroactively marks the
        # r13 driver record (one pass begun at host_factor 4.66).
        starts = [p.get("host_factor") for p in d.get("passes") or []
                  if p.get("metric") != "retry"
                  and p.get("host_factor") is not None]
        degraded = bool(starts) and all(s < 0 or s > 2.0 for s in starts)
    # When mid-pass segments exist (r15+), the record's own host_factor
    # (min START kernel over all passes) can come from a pass whose
    # MIDDLE breached the gate — the r15 anchor's 1.042 belongs to a
    # pass that hit 2.149/2.911 mid-run — which loosens the anchor-gate
    # normalization ~1.45x (round-15 review finding). Derive the record
    # factor from passes that were clean END TO END instead; records
    # without segments keep their recorded factor (nothing better is
    # derivable).
    clean_starts = []
    for p in d.get("passes") or []:
        # retry and salvage lines re-time a targeted subset after a
        # cooldown; their (usually healthy) start kernels must not
        # become the record factor for mins whole passes produced
        if p.get("metric") in ("retry", "salvage"):
            continue
        segs = p.get("host_factor_segments") or []
        s0 = p.get("host_factor")
        if segs and s0 is not None and s0 > 0 and \
                not p.get("degraded_start") and not p.get("degraded_mid"):
            clean_starts.append(s0)
    if clean_starts:
        hf = min(clean_starts)
    stream = {}
    for p in d.get("passes") or []:
        # Streams run LAST in a pass, BETWEEN the scale->streaming
        # boundary kernel (host_factor_segments[-2], r15+) and the
        # pass-END kernel — normalize by the MIN of the two adjacent
        # kernels (fallback: end, then start). Min, not "nearest": a
        # transient spike on one boundary kernel must not deflate the
        # streaming numbers it brackets (round-15 review finding: the
        # anchor's pass 4 read 2.911 at the boundary but 1.151 at end,
        # with raw per-batch maxima equal to the clean pass's — dividing
        # by 2.911 would halve every baseline). Normalizing by the
        # START factor was the original sin that manufactured the r14
        # s18/s20 "drift": the r13 anchor's pass 1 began at 3.327 and
        # ended at 1.402, deflating its baselines ~2.4x.
        segs = p.get("host_factor_segments") or []
        cands = [c for c in
                 ([segs[-2]] if len(segs) >= 2 else []) +
                 [p.get("host_factor_end")] if c is not None and c > 0]
        phf = min(cands) if cands else \
            next((c for c in [p.get("host_factor")]
                  if c is not None and c > 0), 1.0)
        det = p.get("streaming_detail") or {}
        for k, secs in (p.get("streaming_queries") or {}).items():
            if secs is None or secs <= 0:
                continue
            mb = (det.get(k) or {}).get("max_batch_ms")
            mbn = mb / 1000.0 / phf if mb else None
            stream.setdefault(k, []).append((secs / phf, mbn))
    return hf, queries, stream, degraded, factors


def norm(queries, factors, hf):
    """Per-key normalized times: each key divides by its own
    pass-of-origin factor when the record carries one (r16+), else by
    the record-level host_factor."""
    return {k: v / (factors.get(k) or hf) for k, v in queries.items()}


def load_rounds(root):
    rounds = []
    for path in sorted(glob.glob(os.path.join(root, "bench_summary_r*.json"))):
        m = re.search(r"bench_summary_r(\d+)\.json$", path)
        if not m:
            continue
        rec = load_record(path)
        if rec is None:
            continue
        hf, queries, stream, degraded, factors = rec
        rnd = int(m.group(1))
        if rnd in KNOWN_MID_DEGRADED:
            degraded = True
        rounds.append((rnd, hf, queries, stream, degraded, factors))
    return rounds


def batch_mins(stream):
    """min-of-passes normalized per-batch max, per streaming key."""
    out = {}
    for k, obs in stream.items():
        vals = [mb for _, mb in obs if mb is not None]
        if vals:
            out[k] = min(vals)
    return out


# Bench's gated/scale timing action changed in round 13: count() ->
# noop write. Under count() Catalyst pruned projection-shaped operators
# to a bare scan (left-join elimination dropped t54's whole excision
# chain — its 0.1 s "cost" timed nothing), so r13+ numbers for
# projection-heavy keys are HIGHER because they are finally honest.
# Across that boundary gated/scale flags demote to an action-change
# list; streaming keys always drove the noop sink and compare normally.
NOOP_ACTION_FROM = 13

# Records that predate host_factor_segments (r15) cannot carry
# degraded_mid, so a mid-pass collapse between healthy start/end
# kernels is underivable from the record itself. r14 is the verified
# archetype: start 1.844 / end 1.953 (both under the gate) while
# mid-pass contention inflated its t101-t105 block 20-40x over clean
# passes (t105 64.1 s vs 1.48 s — adjudicated in the r14 verdict and
# PLANS.md). Exclude it by round number, the same precedent as
# NOOP_ACTION_FROM; r15+ records carry segments and self-flag.
KNOWN_MID_DEGRADED = {14}


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

    all_rounds = load_rounds(args.root)
    # a degraded_start record (every pass began above Bench's start-health
    # gate — round-13's driver record was one contended pass begun at
    # host_factor 4.66, early keys 10-20x inflated) is untrustworthy for
    # trending: report it, then trend across it as if it didn't exist
    degraded = [r[0] for r in all_rounds if r[4]]
    if degraded:
        print("degraded (start or mid-pass) records skipped for trending: "
              f"{['r%02d' % r for r in degraded]}")
    rounds = [r for r in all_rounds if not r[4]]
    # fewer than 2 usable rounds kills the PAIRWISE trend, but must NOT
    # kill the anchor gate (round-14 ADVICE: returning 0 here let the
    # exact scenario the trust rules target — latest round degraded, or
    # all-but-one prior degraded — exit 0 with the 2x gate never
    # evaluated). Zero usable rounds IS an anchor-gate failure.
    if not rounds:
        print("no usable (non-degraded) bench_summary_r*.json records")
        print("\nANCHOR GATE NOT EVALUATED: no usable round to compare "
              "— the 2x noop-era comparison did NOT run; record a "
              "healthy pass")
        return 1
    if len(rounds) < 2:
        print(f"need >=2 usable records for the pairwise trend, found "
              f"{len(rounds)} — skipping pair comparisons, anchor gate "
              "still runs")

    print(f"rounds: {[r[0] for r in rounds]}  "
          f"(times normalized by each round's host_factor)")
    any_flag = False
    # only the LATEST pair (and the anchor gate below) sets the exit
    # code: a historical pair's flags were that round's gate and were
    # adjudicated then (the r8->r9 host artifacts, the r11->r12
    # calibration skew) — re-failing every future run on them makes
    # the exit code permanently useless as a gate for NEW regressions
    latest_rb = rounds[-1][0] if len(rounds) >= 2 else None
    for (ra, hfa, qa, sa_, _, fa), (rb, hfb, qb, sb_, _, fb) in zip(
            rounds, rounds[1:]):
        gates = rb == latest_rb
        hist = "" if gates else " [historical — report-only]"
        qan, qbn = norm(qa, fa, hfa), norm(qb, fb, hfb)
        common = sorted(set(qa) & set(qb))
        # symmetric filter: a key that failed (-1) in EITHER round is
        # excluded from BOTH sums, otherwise its other-round time skews
        # the headline pair ratio one-sidedly (round-14 review finding)
        both_ok = [k for k in common if qa[k] > 0 and qb[k] > 0]
        na = sum(qan[k] for k in both_ok)
        nb = sum(qbn[k] for k in both_ok)
        print(f"\nr{ra:02d} -> r{rb:02d}: {len(common)} common keys "
              f"({len(both_ok)} in the totals — failed-either-round "
              "excluded), "
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
        action_change = ra < NOOP_ACTION_FROM <= rb
        if action_change:
            print("  [action change: r%d- timed gated/scale keys under "
                  "count(), r%d+ under the noop write — growth on "
                  "non-streaming keys across this boundary is the "
                  "pruned work becoming visible, not a regression]"
                  % (NOOP_ACTION_FROM - 1, NOOP_ACTION_FROM))
        flagged = []
        suspects = []
        action_moved = []
        for k in common:
            a, b = qa[k], qb[k]
            if a <= 0 or b <= 0:
                continue  # -1 = failed/capped entry; absence is its own alarm
            an, bn = qan[k], qbn[k]
            if bn > an * args.threshold and bn - an > args.floor:
                # streaming keys are s<digit>… (seg_staging is gated)
                if action_change and not re.match(r"s\d", k):
                    action_moved.append((k, an, bn, a, b))
                elif skewed and b <= a * args.raw_threshold:
                    suspects.append((k, an, bn, a, b))
                else:
                    flagged.append((k, an, bn, a, b))
        for k, an, bn, a, b in sorted(action_moved,
                                      key=lambda t: t[1] - t[2]):
            print(f"  action-change {k}: {an:.2f}s -> {bn:.2f}s "
                  f"(count() -> noop write; compare r{NOOP_ACTION_FROM}+ "
                  "records only)")
        for k, an, bn, a, b in sorted(flagged, key=lambda t: t[1] - t[2]):
            print(f"  REGRESSED {k}: {an:.2f}s -> {bn:.2f}s "
                  f"({bn / an:.2f}x normalized, {b / a:.2f}x raw){hist}")
            if gates:
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
        # streaming per-batch trend: compare min-of-passes normalized
        # per-batch max — the monitor-relevant cost the total hides
        # behind pass-scheduling noise. Already host-normalized per
        # pass, so no calibration-skew demotion applies.
        ba, bb = batch_mins(sa_), batch_mins(sb_)
        bflag = []
        for k in sorted(set(ba) & set(bb)):
            if bb[k] > ba[k] * args.threshold and bb[k] - ba[k] > args.floor:
                bflag.append((k, ba[k], bb[k]))
        for k, a, b in bflag:
            print(f"  REGRESSED (per-batch) {k}: {a:.2f}s -> {b:.2f}s "
                  f"({b / a:.2f}x normalized per-batch max){hist}")
            if gates:
                any_flag = True
        if ba and bb and not bflag:
            print(f"  streaming per-batch max: {len(set(ba) & set(bb))} "
                  f"keys, no regressions")

    # within-round variance audit for the LATEST round: a streaming
    # total that swings across passes while the per-batch max stays
    # flat is pass-scheduling / pacing noise the min-of-N hides —
    # report it so a masked regression can't hide behind "min looked
    # fine" (informational, never a gate)
    rlast, hflast, qlast, slast, _, flast = rounds[-1]
    div = []
    unstable = []
    for k, obs in sorted(slast.items()):
        # drop the first pass when we have spares: its per-batch cost
        # carries JVM/codegen warm-up (r12: EVERY key reads ~2x pass-1
        # vs pass-3), which is expected, not instability
        warm = obs[1:] if len(obs) >= 3 else obs
        tots = [t for t, _ in warm]
        mbs = [mb for _, mb in warm if mb is not None]
        if len(tots) < 2 or len(mbs) < 2 or min(mbs) <= 0:
            continue
        tot_spread = max(tots) / min(tots)
        mb_spread = max(mbs) / min(mbs)
        if tot_spread > 2.0 and mb_spread < 1.3:
            div.append((k, tot_spread, mb_spread))
        elif mb_spread > 2.0 and max(mbs) - min(mbs) > args.floor:
            unstable.append((k, tot_spread, mb_spread))
    print(f"\nr{rlast:02d} streaming variance "
          f"({len(slast)} keys, per-pass normalized):")
    for k, ts, ms in div:
        print(f"  SUM-VS-MAX DIVERGENCE {k}: total spread {ts:.2f}x but "
              f"per-batch max spread {ms:.2f}x — pass noise, min-of-N "
              f"masks it; trust the per-batch trend above")
    for k, ts, ms in unstable:
        print(f"  PER-BATCH UNSTABLE {k}: per-batch max spread {ms:.2f}x "
              f"across passes — the monitor cost itself is noisy")
    if not div and not unstable:
        print("  totals and per-batch maxima agree across passes")

    # noop-era anchor comparison (BASELINE.md "Noop-write-era bench
    # anchor"): the bench action changed count() -> noop write in round
    # 13, so the like-for-like baseline for the 2x gate is whatever
    # BASELINE_noop_anchor.json pins (r15 health-gated min-of-4 since
    # round 15; r13 clean min-of-3 before), NOT the pre-r13 count()-era
    # records. Compares the latest usable round against the anchor on
    # common keys, host-factor-normalized.
    anchor_path = os.path.join(args.root, "BASELINE_noop_anchor.json")
    if rlast < NOOP_ACTION_FROM:
        # fail LOUDLY, not open (round-15 ADVICE): when noop-era rounds
        # exist but every one was refused as degraded, the latest USABLE
        # round predates the action change — the old informational skip
        # here let exactly the scenario the trust rules target (r13-r15
        # all degraded) exit 0 with the 2x gate never evaluated
        if any(r[0] >= NOOP_ACTION_FROM for r in all_rounds):
            print("\nANCHOR GATE NOT EVALUATED: every noop-era round "
                  f"(r>={NOOP_ACTION_FROM}) was refused as degraded and "
                  f"the latest usable round r{rlast} predates the action "
                  "change — the 2x comparison did NOT run; record a "
                  "healthy (or salvage-rescued all_keys_clean) pass")
            any_flag = True
        else:
            print(f"\n[anchor comparison skipped: latest usable round "
                  f"r{rlast} predates the noop-write action — not "
                  "like-for-like]")
    else:
        # the anchor gate must fail LOUDLY when it cannot run, never
        # silently disable itself (round-14 review finding): a missing,
        # unreadable, degraded or key-disjoint anchor would otherwise
        # let a genuine regression exit 0 with no trace
        skip = None
        if not os.path.exists(anchor_path):
            skip = "BASELINE_noop_anchor.json missing"
        else:
            rec = load_record(anchor_path)
            if rec is None:
                skip = "anchor record unreadable/empty"
            else:
                ahf, aq, _, adeg, af = rec
                common = sorted(k for k in set(aq) & set(qlast)
                                if aq[k] > 0 and qlast[k] > 0)
                if adeg:
                    skip = "anchor record is degraded_start"
                elif not common:
                    skip = "no common keys with the anchor"
                else:
                    aqn = norm(aq, af, ahf)
                    qln = norm(qlast, flast, hflast)
                    na = sum(aqn[k] for k in common)
                    nl = sum(qln[k] for k in common)
                    ratio = nl / na
                    verdict = "within" if ratio <= 2.0 else "BREACHES"
                    print(f"\nvs noop-era anchor (BASELINE.md; r15 "
                          "health-gated min-of-4, "
                          f"host_factor {ahf}): {len(common)} common "
                          f"keys, normalized {na:.1f}s -> {nl:.1f}s = "
                          f"{ratio:.2f}x — {verdict} the 2x gate")
                    if ratio > 2.0:
                        any_flag = True
        if skip is not None:
            print(f"\nANCHOR GATE NOT EVALUATED: {skip} — the 2x "
                  "noop-era comparison did NOT run; fix the anchor")
            any_flag = True
    return 1 if any_flag else 0


if __name__ == "__main__":
    sys.exit(main())
