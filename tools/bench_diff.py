#!/usr/bin/env python3
"""Per-query diff of two Bench outputs (bench_out.json), with a noise
threshold AND control normalization so the builder catches real
regressions before the judge does — without hand-building the ambient-
drift adjudication tables every round.

Usage:
    python3 tools/bench_diff.py OLD NEW [--threshold 0.3] [--min-sec 0.25]

Either side may be `git:<rev>` (e.g. `git:ed91322`), which reads
`git show <rev>:bench_out.json` — the same-box per-query history lives
in each round-close commit's bench_out.json.

A query counts as a REGRESSION when its CONTROL-NORMALIZED ratio
exceeds (1 + threshold) AND the absolute delta exceeds --min-sec.
The control ratio is the median of new/old over the control queries
(the `controls` block Bench emits: q1_agg / q26_closure /
q97_lm_score — cheap rows from families untouched for 10+ rounds, so
they move only with the box). When the whole box runs 1.5x slower,
every raw ratio is ~1.5 but every normalized ratio is ~1.0 — no false
regressions; and a genuinely regressed query stands out against the
controls no matter how loaded the box is. Without a controls block on
both sides the ratio falls back to 1.0 (raw diff, the pre-r13
behavior).

Exit code 1 iff regressions exist, so the round-close recipe can gate
on it. Queries present on one side only, and queries recorded as
{"err": ...}, are listed but never gate — a new query is not a
regression and a crashed one is reported by Bench itself as n_failed.

This box swings ~2x under background load: always compare min-of-3
runs (SPARK_GRAFT_REPEAT=3) and never trust a single-shot diff.
"""
import argparse
import json
import statistics
import subprocess
import sys

CONTROL_NAMES = ("q1_agg", "q26_closure", "q97_lm_score",
                 "q288_io_control")


def load(path):
    if path.startswith("git:"):
        raw = subprocess.check_output(
            ["git", "show", path[4:] + ":bench_out.json"], text=True)
        d = json.loads(raw)
    else:
        with open(path) as f:
            d = json.load(f)
    timings, errs = {}, {}
    for q, v in d.get("queries", {}).items():
        if isinstance(v, dict):
            errs[q] = v.get("err", "error")
        else:
            timings[q] = float(v)
    spread = {q: (float(v[0]), float(v[1]))
              for q, v in d.get("spread", {}).items()}
    controls = {q: float(v) for q, v in d.get("controls", {}).items()}
    native_controls = bool(controls)
    # pre-r13 artifacts carry no controls block, but the control
    # queries' floors are still in the timings map
    if not controls:
        controls = {q: timings[q] for q in CONTROL_NAMES if q in timings}
    return timings, errs, spread, controls, native_controls


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old", help="bench_out.json path or git:<rev>")
    ap.add_argument("new", help="bench_out.json path or git:<rev>")
    ap.add_argument("--threshold", type=float, default=0.3,
                    help="control-normalized slowdown that counts as "
                         "regression (default 0.3)")
    ap.add_argument("--min-sec", type=float, default=0.25,
                    help="ignore deltas smaller than this many seconds (default 0.25)")
    ap.add_argument("--spread-ratio", type=float, default=1.0,
                    help="a query whose repeats spread wider than min*(1+ratio) "
                         "on either side is classified contended, not regressed "
                         "(default 1.0, i.e. max >= 2x min)")
    ap.add_argument("--no-controls", action="store_true",
                    help="disable control normalization (raw ratios)")
    args = ap.parse_args()

    old, old_err, old_spread, old_ctl, old_native = load(args.old)
    new, new_err, new_spread, new_ctl, new_native = load(args.new)
    if not old_native:
        print("WARNING: the OLD side has no native `controls` block — "
              "driver artifacts never carry one. Diff against the "
              "previous BUILDER close commit (the round's last "
              "bench_out.json written by Bench itself), not the "
              "driver's artifact commit: a driver baseline was "
              "measured on a different load profile and skews every "
              "normalized ratio (the r13 ed91322-vs-9f04854 lesson).",
              file=sys.stderr)
    shared = sorted(set(old) & set(new))

    ctl_shared = sorted(set(old_ctl) & set(new_ctl))
    if args.no_controls or not ctl_shared:
        ctl_ratio = 1.0
        ctl_desc = "none (raw ratios)"
    else:
        ratios = [new_ctl[q] / old_ctl[q] for q in ctl_shared
                  if old_ctl[q] > 0]
        ctl_ratio = statistics.median(ratios) if ratios else 1.0
        ctl_desc = ", ".join(
            f"{q} {old_ctl[q]:.3f}->{new_ctl[q]:.3f}" for q in ctl_shared)
        ctl_desc += f" => box ratio {ctl_ratio:.2f}x"

    def contended(q):
        # high min..max spread across the repeats on EITHER side means
        # the box, not the code, moved — the q63/q196 false-alarm shape
        for sp in (old_spread.get(q), new_spread.get(q)):
            if sp and sp[0] > 0 and sp[1] > sp[0] * (1 + args.spread_ratio):
                return True
        return False

    regressions, improvements, noisy = [], [], []
    for q in shared:
        if old[q] <= 0:
            continue
        norm = (new[q] / old[q]) / ctl_ratio
        delta = new[q] - old[q] * ctl_ratio  # delta beyond ambient drift
        if norm > 1 + args.threshold and delta > args.min_sec:
            (noisy if contended(q) else regressions).append(
                (q, old[q], new[q], norm))
        elif norm < 1 / (1 + args.threshold) and -delta > args.min_sec:
            improvements.append((q, old[q], new[q], norm))

    def show(rows, tag):
        for q, o, n, r in sorted(rows, key=lambda x: abs(x[2] - x[1]),
                                 reverse=True):
            print(f"{tag} {q}: {o:.3f}s -> {n:.3f}s "
                  f"(raw {(n - o) / o * 100:+.0f}%, normalized {r:.2f}x)")

    print(f"controls: {ctl_desc}")
    show(regressions, "REGRESSED")
    show(noisy, "CONTENDED")
    show(improvements, "improved ")
    for q in sorted(set(new) - set(old)):
        print(f"added     {q}: {new[q]:.3f}s")
    for q in sorted(set(old) - set(new)):
        print(f"removed   {q} (was {old[q]:.3f}s)")
    for q, e in sorted(new_err.items()):
        print(f"FAILED    {q}: {e}")

    t_old = sum(old[q] for q in shared)
    t_new = sum(new[q] for q in shared)
    print(f"shared total ({len(shared)} queries): {t_old:.1f}s -> {t_new:.1f}s "
          f"(control-normalized {t_new / ctl_ratio:.1f}s); "
          f"{len(regressions)} regressed, {len(noisy)} contended, "
          f"{len(improvements)} improved, "
          f"{len(new) - len(shared)} added, {len(old) - len(shared)} removed, "
          f"{len(new_err)} failed")
    # WHOLE-RUN contention refusal (r15 lesson: a sustained I/O-load
    # window depresses ALL repeats of many queries at once — tight
    # spreads, inflated minima — which the spread classifier and
    # CPU-shaped controls both miss, manufacturing dozens of false
    # regressions). When a large same-direction block of the shared
    # set "regresses" with (near-)zero improvements, the box moved,
    # not the code: refuse to adjudicate and demand a re-run. Exit 3
    # so round-close gating can tell "re-run needed" from "regressed".
    if shared and len(regressions) >= max(10, len(shared) // 10) \
            and len(improvements) <= len(regressions) // 10:
        print(f"VERDICT: NOT ADJUDICABLE — {len(regressions)} same-"
              f"direction regressions across {len(shared)} shared "
              "queries with no offsetting improvements is whole-run "
              "contention, not code. Re-run both sides on a quiet box "
              "(min-of-3, interleaved) before trusting this diff.")
        sys.exit(3)
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
