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


if __name__ == "__main__":
    main()
