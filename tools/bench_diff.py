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
    spread = {q: (float(v[0]), float(v[1]))
              for q, v in d.get("spread", {}).items()}
    return timings, errs, spread


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.3,
                    help="relative slowdown that counts as regression (default 0.3)")
    ap.add_argument("--min-sec", type=float, default=0.25,
                    help="ignore deltas smaller than this many seconds (default 0.25)")
    ap.add_argument("--spread-ratio", type=float, default=1.0,
                    help="a query whose repeats spread wider than min*(1+ratio) "
                         "on either side is classified contended, not regressed "
                         "(default 1.0, i.e. max >= 2x min)")
    args = ap.parse_args()

    old, old_err, old_spread = load(args.old)
    new, new_err, new_spread = load(args.new)
    shared = sorted(set(old) & set(new))

    def contended(q):
        # high min..max spread across the repeats on EITHER side means
        # the box, not the code, moved — the q63/q196 false-alarm shape
        for sp in (old_spread.get(q), new_spread.get(q)):
            if sp and sp[0] > 0 and sp[1] > sp[0] * (1 + args.spread_ratio):
                return True
        return False

    regressions, improvements, noisy = [], [], []
    for q in shared:
        delta = new[q] - old[q]
        if new[q] > old[q] * (1 + args.threshold) and delta > args.min_sec:
            (noisy if contended(q) else regressions).append((q, old[q], new[q]))
        elif old[q] > new[q] * (1 + args.threshold) and -delta > args.min_sec:
            improvements.append((q, old[q], new[q]))

    def show(rows, tag):
        for q, o, n in sorted(rows, key=lambda r: abs(r[2] - r[1]), reverse=True):
            print(f"{tag} {q}: {o:.3f}s -> {n:.3f}s ({(n - o) / o * 100:+.0f}%)")

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
    print(f"shared total ({len(shared)} queries): {t_old:.1f}s -> {t_new:.1f}s; "
          f"{len(regressions)} regressed, {len(noisy)} contended, "
          f"{len(improvements)} improved, "
          f"{len(new) - len(shared)} added, {len(old) - len(shared)} removed, "
          f"{len(new_err)} failed")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
