"""Profile the ESRGAN-SSL generator bucket (RRDB-23 fwd+bwd) in isolation.

VERDICT r4 #1: the G fwd+bwd bucket (~42 ms, 48% of the 87.3 ms step) was
the biggest cost center with no design story.  This script measures it the
way SSG was mined:

- G forward alone and G fwd+bwd (value+grad of a scalar L1 head) at the
  bench shapes, with XLA cost-model FLOPs -> in-bucket MFU;
- trunk-depth sweep (num_block 0/8/16/23) -> per-block marginal ms and the
  fixed head/tail cost;
- knob A/Bs at runtime: scan vs inlined trunk, remat policy, scan_unroll,
  compute dtype.

Usage:  python scripts/bench_g_bucket.py [--quick]
Env:    BENCH_BATCH (16), BENCH_GT_SIZE (128), BENCH_STEPS (20)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer variants")
    ap.add_argument("--variants", default="", help="comma list to run (default all)")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ssl_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    jax.config.update("jax_default_matmul_precision",
                      os.environ.get("BENCH_MATMUL_PRECISION", "bfloat16"))

    from ssl_tpu.archs import build_network

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    gt = int(os.environ.get("BENCH_GT_SIZE", "128"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    lq = gt // 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, lq, lq, 3), jnp.float32)
    tgt = jnp.asarray(rng.rand(batch, gt, gt, 3), jnp.float32)

    peak_tflops = float(os.environ.get("PEAK_TFLOPS", "197"))

    def build(**kw):
        cfg = {"type": "RRDBNet", "num_feat": 64, "num_block": 23,
               "num_grow_ch": 32, "remat_policy": "none",
               "compute_dtype": "bfloat16", **kw}
        net = build_network(cfg)
        params = jax.jit(net.init)(jax.random.PRNGKey(0), x)
        return net, params

    def timeit(fn, *a):
        fn(*a)  # compile
        jax.block_until_ready(fn(*a))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(steps):
                out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / steps * 1e3)
        return best

    def cost(fn, *a):
        try:
            an = jax.jit(fn).lower(*a).compile().cost_analysis()
            if isinstance(an, list):
                an = an[0]
            return an.get("flops", 0) / 1e9, an.get("bytes accessed", 0) / 2**30
        except Exception:
            return 0.0, 0.0

    results = {}

    def run(name, **kw):
        net, params = build(**kw)
        fwd = jax.jit(lambda p, v: net.apply(p, v))

        def loss(p, v):
            return jnp.mean(jnp.abs(net.apply(p, v) - tgt))

        fb = jax.jit(jax.value_and_grad(loss))
        t_f = timeit(fwd, params, x)
        t_fb = timeit(fb, params, x)
        gf_f, gb_f = cost(lambda p, v: net.apply(p, v), params, x)
        gf_fb, gb_fb = cost(jax.value_and_grad(loss), params, x)
        mfu = gf_fb / (t_fb / 1e3) / 1e3 / peak_tflops * 100
        results[name] = {"fwd_ms": round(t_f, 2), "fwdbwd_ms": round(t_fb, 2),
                         "fwd_gflop": round(gf_f, 1),
                         "fwdbwd_gflop": round(gf_fb, 1),
                         "fwdbwd_gib": round(gb_fb, 2),
                         "mfu_pct": round(mfu, 1)}
        print(name, json.dumps(results[name]), flush=True)

    wanted = set(args.variants.split(",")) if args.variants else None

    def want(n):
        return wanted is None or n in wanted

    if want("base"):
        run("base")                                    # shipped bench config
    for nb in ([0, 8, 16] if not args.quick else [0]):
        if want(f"nb{nb}"):
            run(f"nb{nb}", num_block=nb)
    if not args.quick:
        if want("inline"):
            run("inline", scan_blocks=False)           # 23 inlined blocks
        if want("remat_dots"):
            run("remat_dots", remat_policy="dots")
        if want("unroll23"):
            run("unroll23", scan_unroll=23)            # fully unrolled scan
        if want("fp32"):
            run("fp32", compute_dtype=None)
        if want("nosplit"):
            # naive concat formulation (split_convs off is not a knob on
            # RRDBNet; skip unless wired)
            pass

    print(json.dumps(results))


if __name__ == "__main__":
    main()
