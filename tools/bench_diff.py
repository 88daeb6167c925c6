#!/usr/bin/env python3
"""Per-query diff of two Bench outputs (bench_out.json), with a noise
threshold so the builder catches real regressions before the judge does.

Usage:
    python3 tools/bench_diff.py OLD.json NEW.json [--threshold 0.3] [--min-sec 0.25]

A query counts as a REGRESSION when new > old * (1 + threshold) AND the
absolute delta exceeds --min-sec (sub-noise-floor queries can triple and
still mean nothing on a contended box). Exit code 1 iff regressions
exist, so the round-close recipe can gate on it. Queries present on one
side only, and queries recorded as {"err": ...}, are listed but never
gate — a new query is not a regression and a crashed one is reported by
Bench itself as n_failed.

This box swings ~2x under background load: always compare min-of-3 runs
(SPARK_GRAFT_REPEAT=3) and never trust a single-shot diff.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    timings, errs = {}, {}
    for q, v in d.get("queries", {}).items():
        if isinstance(v, dict):
            errs[q] = v.get("err", "error")
        else:
            timings[q] = float(v)
    return timings, errs


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.3,
                    help="relative slowdown that counts as regression (default 0.3)")
    ap.add_argument("--min-sec", type=float, default=0.25,
                    help="ignore deltas smaller than this many seconds (default 0.25)")
    args = ap.parse_args()

    old, old_err = load(args.old)
    new, new_err = load(args.new)
    shared = sorted(set(old) & set(new))

    regressions, improvements = [], []
    for q in shared:
        delta = new[q] - old[q]
        if new[q] > old[q] * (1 + args.threshold) and delta > args.min_sec:
            regressions.append((q, old[q], new[q]))
        elif old[q] > new[q] * (1 + args.threshold) and -delta > args.min_sec:
            improvements.append((q, old[q], new[q]))

    def show(rows, tag):
        for q, o, n in sorted(rows, key=lambda r: abs(r[2] - r[1]), reverse=True):
            print(f"{tag} {q}: {o:.3f}s -> {n:.3f}s ({(n - o) / o * 100:+.0f}%)")

    show(regressions, "REGRESSED")
    show(improvements, "improved ")
    for q in sorted(set(new) - set(old)):
        print(f"added     {q}: {new[q]:.3f}s")
    for q in sorted(set(old) - set(new)):
        print(f"removed   {q} (was {old[q]:.3f}s)")
    for q, e in sorted(new_err.items()):
        print(f"FAILED    {q}: {e}")

    t_old = sum(old[q] for q in shared)
    t_new = sum(new[q] for q in shared)
    print(f"shared total ({len(shared)} queries): {t_old:.1f}s -> {t_new:.1f}s; "
          f"{len(regressions)} regressed, {len(improvements)} improved, "
          f"{len(new) - len(shared)} added, {len(old) - len(shared)} removed, "
          f"{len(new_err)} failed")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
