"""LR-scheduler plotter (reference surface:
GAN-Based-SR/test_scripts/test_lr_scheduler.py — plots the
CosineAnnealingRestartLR curve to PNG).  Plots any schedule our
build_schedule supports.

Usage:
  python scripts/test_scripts/test_lr_scheduler.py \
      [--type CosineAnnealingRestartLR] [--total 1000000] [--out lr.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--type", default="CosineAnnealingRestartLR")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--total", type=int, default=500000)
    ap.add_argument("--periods", type=int, nargs="+",
                    default=[50000, 100000, 150000, 150000, 150000])
    ap.add_argument("--restart_weights", type=float, nargs="+",
                    default=[1, 1, 0.5, 1, 0.5])
    ap.add_argument("--milestones", type=int, nargs="+",
                    default=[50000, 100000, 200000, 300000])
    ap.add_argument("--gamma", type=float, default=0.5)
    ap.add_argument("--eta_min", type=float, default=1e-7)
    ap.add_argument("--out", default="lr_schedule.png")
    args = ap.parse_args()

    from ssl_tpu.models.lr_scheduler import build_schedule
    if args.type == "CosineAnnealingRestartLR":
        train_opt = {"scheduler": {"type": "CosineAnnealingRestartLR",
                                   "periods": args.periods,
                                   "restart_weights": args.restart_weights,
                                   "eta_min": args.eta_min},
                     "optim_g": {"lr": args.lr}}
    else:
        train_opt = {"scheduler": {"type": args.type,
                                   "milestones": args.milestones,
                                   "gamma": args.gamma},
                     "optim_g": {"lr": args.lr}}
    sched = build_schedule(train_opt, args.lr)
    xs = list(range(0, args.total, max(1, args.total // 2000)))
    ys = [float(sched(x)) for x in xs]

    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    from matplotlib import ticker as mtick
    fig, ax = plt.subplots()
    ax.plot(xs, ys, linewidth=1.5)
    ax.set_title(f"{args.type} (base lr {args.lr:g})", fontsize=12)
    ax.set_xlabel("iteration")
    ax.set_ylabel("learning rate")
    ax.xaxis.set_major_formatter(mtick.FuncFormatter(lambda v, _: f"{v/1000:.0f}k"))
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"wrote {args.out} ({len(xs)} points, lr[0]={ys[0]:g}, lr[-1]={ys[-1]:g})")


if __name__ == "__main__":
    main()
