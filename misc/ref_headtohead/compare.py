#!/usr/bin/env python3
"""Compare reference-trainer and taiyaki_tpu training-loss trajectories.

Implements the SURVEY milestone-4 success criterion ("loss curve parity
with reference at equal seeds/data", reference workflow
/root/reference/bin/train_flipflop.py logs): both trainers run matched
config/data (see docs/training_parity.md for the exact commands); this
script parses each run directory's batch.log / validation.log, applies a
moving average to the per-iteration training loss, and reports

  * smoothed training loss per run at fixed iterations,
  * the between-framework gap of the group means over the tail,
  * the within-framework seed-to-seed spread it must be judged against
    (RNG streams differ across frameworks, so bit parity is impossible;
    statistical overlap is the criterion), and
  * final validation losses (the shared held-out read).

Usage:
  python compare.py --ref DIR [DIR ...] --tpu DIR [DIR ...] [--mav N]
"""

import argparse
import os

import numpy as np


def load_batch_loss(rundir):
    """[iter, loss] columns of a batch.log (both frameworks share the
    reference's format: tab-separated, header row)."""
    path = os.path.join(rundir, "batch.log")
    its, losses = [], []
    with open(path) as f:
        next(f)
        for line in f:
            parts = line.rstrip("\n").split("\t")
            its.append(int(parts[0]))
            losses.append(float(parts[1]))
    return np.asarray(its), np.asarray(losses)


def load_validation(rundir):
    path = os.path.join(rundir, "validation.log")
    out = {}
    if not os.path.exists(path):
        return out
    with open(path) as f:
        next(f)
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                out[int(parts[0])] = float(parts[1])
    return out


def smooth(losses, window):
    """Trailing moving average; shorter prefixes average what exists."""
    c = np.cumsum(np.concatenate([[0.0], losses]))
    n = len(losses)
    idx = np.arange(1, n + 1)
    lo = np.maximum(idx - window, 0)
    return (c[idx] - c[lo]) / (idx - lo)


def main():
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--ref", nargs="+", required=True,
                        help="reference-trainer run directories")
    parser.add_argument("--tpu", nargs="+", required=True,
                        help="taiyaki_tpu trainer run directories")
    parser.add_argument("--mav", type=int, default=50,
                        help="moving-average window (iterations)")
    parser.add_argument("--at", type=int, nargs="+",
                        default=[50, 100, 200, 300, 400],
                        help="iterations at which to report smoothed loss")
    parser.add_argument("--tail_from", type=int, default=100,
                        help="start of the tail region for the gap/spread "
                             "statistics")
    args = parser.parse_args()

    groups = {"reference": args.ref, "taiyaki_tpu": args.tpu}
    smoothed = {}   # (group, dir) -> (iters, smoothed loss)
    vals = {}
    for group, dirs in groups.items():
        for d in dirs:
            its, losses = load_batch_loss(d)
            smoothed[(group, d)] = (its, smooth(losses, args.mav))
            vals[(group, d)] = load_validation(d)

    # per-run smoothed loss at the report iterations
    print("run\t" + "\t".join("it%d" % i for i in args.at) + "\tfinal_val")
    for (group, d), (its, sm) in smoothed.items():
        row = [os.path.basename(d.rstrip("/")) + " (%s)" % group]
        for at in args.at:
            k = np.searchsorted(its, at)
            row.append("%.4f" % sm[min(k, len(sm) - 1)])
        v = vals[(group, d)]
        row.append("%.4f" % v[max(v)] if v else "NA")
        print("\t".join(row))

    # tail statistics: between-framework gap vs within-framework spread
    print()
    tail_mean = {}
    for (group, d), (its, sm) in smoothed.items():
        sel = its >= args.tail_from
        tail_mean.setdefault(group, []).append(float(sm[sel].mean()))
    for group, means in tail_mean.items():
        print("%s tail(it>=%d) smoothed-loss means: %s  spread=%.4f" % (
            group, args.tail_from,
            ", ".join("%.4f" % m for m in means),
            max(means) - min(means) if len(means) > 1 else 0.0))
    gap = abs(np.mean(tail_mean["reference"]) -
              np.mean(tail_mean["taiyaki_tpu"]))
    spread = max(max(m) - min(m) if len(m) > 1 else 0.0
                 for m in tail_mean.values())
    print("between-framework gap of means: %.4f" % gap)
    print("max within-framework seed spread: %.4f" % spread)
    print("PARITY: %s (gap %s within-seed spread)" % (
        "OK" if gap <= max(spread, 0.02) else "CHECK",
        "<=" if gap <= max(spread, 0.02) else ">"))


if __name__ == "__main__":
    main()
