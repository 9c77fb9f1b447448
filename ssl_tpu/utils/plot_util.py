"""Training-curve parsing/plotting (reference surface: utils/plot_util.py +
scripts/plot/)."""

from __future__ import annotations

import re


def read_data_from_log(log_path: str, keys) -> dict[str, list[tuple[int, float]]]:
    """Parse `iter:  12,300 ... l_pix: 1.23e-02` style train-log lines into
    {key: [(iter, value), ...]}."""
    if isinstance(keys, str):
        keys = [keys]
    out = {k: [] for k in keys}
    iter_pat = re.compile(r"iter:\s*([\d,]+)")
    for line in open(log_path):
        m = iter_pat.search(line)
        if not m:
            continue
        it = int(m.group(1).replace(",", ""))
        for k in keys:
            km = re.search(rf"\b{re.escape(k)}:\s*([-\d.e+]+)", line)
            if km:
                try:
                    out[k].append((it, float(km.group(1))))
                except ValueError:
                    pass
    return out


def plot_curves(log_path: str, keys, out_path: str, smooth: int = 1) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    data = read_data_from_log(log_path, keys)
    fig, ax = plt.subplots(figsize=(8, 5))
    for k, pts in data.items():
        if not pts:
            continue
        its, vals = zip(*pts)
        vals = np.asarray(vals)
        if smooth > 1:
            kern = np.ones(smooth) / smooth
            vals = np.convolve(vals, kern, mode="same")
        ax.plot(its, vals, label=k)
    ax.set_xlabel("iteration")
    ax.legend()
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
