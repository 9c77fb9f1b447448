"""Offline checkpoint conversion CLI: torch .pth <-> ssl_tpu .pkl trees.

Import: any layout load_params_auto detects (RRDBNet / SwinIR / SRVGG /
MSRResNet / UNetDiscriminatorSN / VGGStyleDiscriminator / torchvision VGG19).
Export: RRDBNet / SwinIR / MSRResNet / SRVGGNetCompact back to
reference-consumable .pth
(reference users load these with basicsr's load_network, base_model.py:289).

  python scripts/convert_checkpoint.py import net_g.pth out.pkl [--key params_ema]
  python scripts/convert_checkpoint.py export-rrdb ours.pkl net_g.pth
  python scripts/convert_checkpoint.py export-swinir ours.pkl net_g.pth

Generic export (any family with an import converter whose weight transforms
are conv/matrix/identity — ELAN, SPSR, BSRGAN/BebyGAN RRDB, RankSRGAN, ...):
inverts the import converter mechanically against a reference-layout template
(a reference checkpoint, or a state_dict saved from the reference module —
fixed buffers like ELAN's shift kernels are copied from it):

  python scripts/convert_checkpoint.py export-auto ours.pkl net_g.pth \
      --template reference_net_g.pth --converter elan
"""

import argparse
import os
import pickle
import sys

# offline host-side conversion never needs an accelerator — force CPU (the
# image's site hook pins JAX_PLATFORMS=axon, so both the env var and the
# post-import config update are needed) so the tool works, and the test stays
# hermetic, even when the TPU tunnel is unreachable
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["import", "import-sd-unet", "import-sd-structcond",
                                 "export-rrdb", "export-swinir",
                                 "export-msrresnet", "export-srvgg", "export-unet-sn",
                                 "export-auto"])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--key", default="params", help="param key inside the .pth/.pkl")
    ap.add_argument("--template", help="export-auto: reference-layout .pth "
                                       "providing key names/shapes/constants")
    ap.add_argument("--converter", help="export-auto: import-converter name "
                                        "(weight_port.convert_<name>)")
    args = ap.parse_args()

    if args.mode.startswith("import"):
        import numpy as np
        import jax
        if args.mode == "import":
            from ssl_tpu.utils.weight_port import load_params_auto
            tree = load_params_auto(args.src, param_key=args.key)
            if tree is None:
                raise SystemExit(f"no converter matched the layout of {args.src}")
        else:
            # StableSR/SD checkpoints ('state_dict' with model.diffusion_model.*
            # / structcond_stage_model.*) -> diffusion UNet / struct encoder
            from ssl_tpu.utils.weight_port import (convert_sd_structcond,
                                                   convert_sd_unet,
                                                   load_torch_state_dict)
            sd = load_torch_state_dict(args.src, "state_dict")
            tree = (convert_sd_unet if args.mode == "import-sd-unet"
                    else convert_sd_structcond)(sd)
            if not tree:
                raise SystemExit(f"no UNet keys found in {args.src}")
        tree = jax.tree_util.tree_map(np.asarray, tree)
        with open(args.dst, "wb") as f:
            pickle.dump({args.key: tree}, f)
        n = sum(x.size for x in jax.tree_util.tree_leaves(tree))
        print(f"wrote {args.dst} ({n/1e6:.2f}M params)")
        return

    with open(args.src, "rb") as f:
        payload = pickle.load(f)
    tree = payload.get(args.key, payload) if isinstance(payload, dict) else payload
    from ssl_tpu.utils import weight_port as wp
    if args.mode == "export-auto":
        if not (args.template and args.converter):
            raise SystemExit("export-auto requires --template and --converter")
        convert_fn = getattr(wp, f"convert_{args.converter}", None)
        if convert_fn is None:
            raise SystemExit(f"unknown converter: convert_{args.converter}")
        template = wp.load_torch_state_dict(args.template, args.key)
        wp.export_to_torch_via(convert_fn, tree, template, args.dst,
                               param_key=args.key)
        print(f"wrote {args.dst}")
        return
    exporter = {"export-rrdb": wp.export_rrdbnet_to_torch,
                "export-swinir": wp.export_swinir_to_torch,
                "export-msrresnet": wp.export_msrresnet_to_torch,
                "export-srvgg": wp.export_srvgg_to_torch,
                "export-unet-sn": wp.export_unet_disc_sn_to_torch}[args.mode]
    exporter(tree, args.dst, param_key=args.key)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
