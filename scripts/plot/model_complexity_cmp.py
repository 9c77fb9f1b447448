"""Model parameter/FLOP comparison (reference surface:
scripts/plot/model_complexity_cmp_bsrn.py — the reference counts
params/FLOPs of released archs; here XLA's own cost analysis supplies the
FLOP count for any registered arch at a given input size).

  python scripts/plot/model_complexity_cmp.py \
      --archs '{"type":"RRDBNet"}' '{"type":"MSRResNet"}' --hw 128
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main():
    import jax
    import jax.numpy as jnp
    from ssl_tpu.archs import build_network

    ap = argparse.ArgumentParser()
    ap.add_argument("--archs", nargs="+", required=True,
                    help="network_g dicts as JSON")
    ap.add_argument("--hw", type=int, default=128, help="input H=W")
    args = ap.parse_args()

    print(f"{'arch':<28} {'params':>12} {'GFLOPs':>10}  (input {args.hw}x{args.hw})")
    for cfg_s in args.archs:
        cfg = json.loads(cfg_s)
        net = build_network(dict(cfg))
        x = jnp.zeros((1, args.hw, args.hw, 3), jnp.float32)
        variables = jax.jit(net.init)(jax.random.PRNGKey(0), x)
        n_params = sum(int(p.size) for p in jax.tree_util.tree_leaves(variables["params"]))
        try:
            compiled = jax.jit(lambda v, xx: net.apply(v, xx)).lower(variables, x).compile()
            flops = compiled.cost_analysis()["flops"]
            gflops = f"{flops / 1e9:10.2f}"
        except Exception:
            gflops = "       n/a"
        print(f"{cfg.get('type', '?'):<28} {n_params:>12,} {gflops}")


if __name__ == "__main__":
    main()
