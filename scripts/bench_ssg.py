"""SSG kernel latency benchmark (BASELINE.md target: 'SSG kernel latency,
reported per edge-pixel count').

Times the fused dense SSL loss fwd+bwd per batch at several edge-mask
densities.  Note the TPU-native dense formulation's cost is INDEPENDENT of the
edge-pixel count (it computes masked dense fields) — unlike the reference CUDA
kernel whose work scales with mc*625; the table demonstrates exactly that.

Chained-step timing (each iteration consumes the previous output) because
plain block_until_ready is unreliable on this backend."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ssl_tpu.losses.ssl_loss import SSLSetting, ssl_loss
    from ssl_tpu.ops.ssg import SSGConfig
    from ssl_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    b = int(os.environ.get("SSG_BENCH_BATCH", "16"))
    h = int(os.environ.get("SSG_BENCH_SIZE", "128"))
    iters = int(os.environ.get("SSG_BENCH_ITERS", "8"))
    s = SSLSetting(ssg=SSGConfig(), impl="dense", l1_weight=1e3, kl_weight=1e3)
    rng = np.random.RandomState(0)
    gt = jnp.asarray(rng.rand(b, h, h, 3), jnp.float32)

    def loss(x, mask):
        a, k = ssl_loss(x, gt, mask, s)
        return a + k

    g = jax.jit(jax.grad(loss))
    print(f"fused dense SSL loss fwd+bwd, batch {b} @ {h}^2 (search 25, window 9)")
    print(f"{'mask density':>14} {'edge px/img':>12} {'ms/batch':>10} {'ms/img':>8}")
    for frac in (0.05, 0.15, 0.25, 0.5, 1.0):
        mask = jnp.asarray(rng.rand(b, h, h, 1) < frac, jnp.float32)
        x = gt + 0.01
        out = g(x, mask)
        jax.block_until_ready(out)  # compile
        t0 = time.perf_counter()
        for _ in range(iters):
            out = g(x, mask)
            x = gt + 0.01 + 0.0 * out  # chain dependency
        jax.block_until_ready(x)
        dt = (time.perf_counter() - t0) / iters
        n_edge = int(frac * h * h)
        print(f"{frac:>14.2f} {n_edge:>12d} {dt*1000:>10.1f} {dt*1000/b:>8.2f}")

    if os.environ.get("SSG_BENCH_CROSSOVER", "0") != "1":
        return

    # dense-vs-gather crossover (VERDICT r4 #5): the reference CUDA kernel's
    # work scales with edge count (mc*625, similarity.cu:66-69); our gather
    # ('scan') impl shares that property via a fixed capacity, while the
    # dense impl is O(h^2) regardless.  Sweep sparse densities (the
    # mask_stride-3 regime of the KAIR/diffusion recipes) and find where —
    # if anywhere — capacity-bounded gather beats dense on this hardware.
    print(f"\ncrossover: dense vs gather at sparse densities (b {b} @ {h}^2)")
    print(f"{'density':>8} {'cap/img':>8} {'dense ms':>9} {'gather ms':>10}")
    for frac in (0.01, 0.02, 0.05, 0.10, 0.20):
        cap = max(128, int(np.ceil(frac * h * h / 128.0)) * 128)
        mask = jnp.asarray(rng.rand(b, h, h, 1) < frac, jnp.float32)
        times = {}
        for impl in ("dense", "scan"):
            s_i = SSLSetting(ssg=SSGConfig(), impl=impl, capacity=cap,
                             l1_weight=1e3, kl_weight=1e3)

            def loss_i(x, m):
                a, k = ssl_loss(x, gt, m, s_i)
                return a + k

            g_i = jax.jit(jax.grad(loss_i))
            x = gt + 0.01
            jax.block_until_ready(g_i(x, mask))  # compile
            t0 = time.perf_counter()
            for _ in range(iters):
                out = g_i(x, mask)
                x = gt + 0.01 + 0.0 * out
            jax.block_until_ready(x)
            times[impl] = (time.perf_counter() - t0) / iters * 1000
        print(f"{frac:>8.2f} {cap:>8d} {times['dense']:>9.1f} "
              f"{times['scan']:>10.1f}")


if __name__ == "__main__":
    main()
