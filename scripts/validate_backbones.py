"""Turn-key weights-arrival harness (VERDICT r3 #5).

The zero-egress image cannot carry the pretrained backbones the reference
downloads (torchvision VGG19/VGG16/AlexNet, lpips alex heads, DISTS weights,
FID InceptionV3, CLIP RN50 — GAN-Based-SR/README.md §4.2,
scripts/metrics/calculate_lpips.py:24-29, basicsr/archs/vgg_arch.py:55).
The day real checkpoints exist, ONE command runs every weights-gated numeric
check and emits a pass/fail table:

  python scripts/validate_backbones.py --weights_dir /path/to/ckpts \
      [--net_g net_g.pth --arch '{"type": "RRDBNet", ...}' --gt GTdir]

Checks per backbone (when its file is found):
  * converter/loader fills the full expected tree (no silent random leaves),
  * ORACLE value parity: a torch-side replica (or the reference's own module
    executed in place via tests/ref_loader) is loaded from the SAME state
    dict and must produce the same features/scores,
  * metric invariants (identity score 0, degradation monotonicity, range).

``--selftest`` synthesizes seeded random checkpoints for every slot into a
tmp dir and runs the whole table against them — so the harness itself is
verified offline (tests/test_validate_backbones.py).

File discovery in --weights_dir (case-insensitive substring):
  vgg19*.pth -> VGG19 | alexnet*.pth -> AlexNet backbone |
  *lpips*/alex.pth -> LPIPS heads | *dists*.pt -> DISTS | vgg16*.pth ->
  DISTS backbone | *inception*.pth -> FID | *rn50*/*clip*.pt -> CLIP RN50
Explicit flags override discovery.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import traceback

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np


def _fixed_imgs(size=64, seed=0):
    rng = np.random.RandomState(seed)
    a = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    import cv2
    blur = cv2.GaussianBlur(a, (7, 7), 2.0)
    return a, blur


# --------------------------------------------------------------------- checks
def check_vgg19(path):
    """Loader completeness + reference-module oracle (basicsr/archs/
    vgg_arch.py executed in place with VGG_PRETRAIN_PATH=<real file>) +
    PerceptualLoss(x,x)==0."""
    import jax.numpy as jnp
    import torch

    from ref_loader import install_reference_stubs, ref_module
    from ssl_tpu.archs.vgg_arch import init_vgg_variables, load_vgg_weights_from_torch

    loaded = load_vgg_weights_from_torch(path)["params"]
    expect = [f"conv{b}_{i}" for b, n in enumerate((2, 2, 4, 4, 4), 1)
              for i in range(1, n + 1)]
    missing = [k for k in expect if k not in loaded]
    if missing:
        return "FAIL", f"vgg19 load missing convs: {missing}"

    install_reference_stubs()
    ref_vgg_mod = ref_module("basicsr.archs.vgg_arch")
    old = ref_vgg_mod.VGG_PRETRAIN_PATH
    try:
        ref_vgg_mod.VGG_PRETRAIN_PATH = path
        ref_net = ref_vgg_mod.VGGFeatureExtractor(
            layer_name_list=["conv5_4"], vgg_type="vgg19",
            use_input_norm=True, range_norm=False)
        ref_net.eval()
        rng = np.random.RandomState(0)
        x = rng.rand(1, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            ref_feat = ref_net(torch.from_numpy(
                x.transpose(0, 3, 1, 2)))["conv5_4"].numpy().transpose(0, 2, 3, 1)
    finally:
        ref_vgg_mod.VGG_PRETRAIN_PATH = old
    model, variables = init_vgg_variables(["conv5_4"], vgg_path=path)
    mine = np.asarray(model.apply(variables, jnp.asarray(x))["conv5_4"])
    err = float(np.max(np.abs(mine - ref_feat)) / max(1e-6, float(np.max(np.abs(ref_feat)))))
    if err > 1e-4:
        return "FAIL", f"conv5_4 rel err {err:.2e} vs reference module"

    from ssl_tpu.losses import build_loss
    cri = build_loss({"type": "PerceptualLoss", "layer_weights": {"conv5_4": 1.0},
                      "perceptual_weight": 1.0, "style_weight": 0,
                      "criterion": "l1", "vgg_path": path})
    same = jnp.asarray(x)
    l_p, _ = cri(same, same)
    if abs(float(l_p)) > 1e-7:
        return "FAIL", f"PerceptualLoss(x,x) = {float(l_p)}"
    return "PASS", f"conv5_4 rel err {err:.2e}; identity loss 0"


def _torch_lpips_from_sd(heads_sd, backbone_sd):
    """lpips-package replica loaded from the real state dicts."""
    import torch

    from test_backbone_oracles import _TorchLPIPSAlex, _torch_alexnet_features
    feats = _torch_alexnet_features()
    conv_idx = [0, 3, 6, 8, 10]
    slice_of = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}
    src = dict(backbone_sd or {})
    src.update(heads_sd)
    with torch.no_grad():
        for idx in conv_idx:
            for cand in (f"features.{idx}.weight", f"net.slice{slice_of[idx]}.{idx}.weight"):
                if cand in src:
                    feats[idx].weight.copy_(src[cand])
                    feats[idx].bias.copy_(src[cand[:-len("weight")] + "bias"])
                    break
            else:
                raise KeyError(f"alexnet conv {idx} not found in checkpoints")
    lins = [heads_sd[f"lin{i}.model.1.weight"] if f"lin{i}.model.1.weight" in heads_sd
            else heads_sd[f"lin{i}.weight"] for i in range(5)]
    return _TorchLPIPSAlex(feats, [l.float() for l in lins])


def check_lpips(path, alexnet_path):
    import torch

    from ssl_tpu.metrics.lpips_metric import _CACHED, calculate_lpips
    from ssl_tpu.utils.weight_port import load_torch_state_dict
    _CACHED.clear()
    os.environ["LPIPS_ALEX_PTH"] = path
    if alexnet_path:
        os.environ["ALEXNET_PTH"] = alexnet_path
    a, blur = _fixed_imgs()
    ident = calculate_lpips(a, a, weights_path=path)
    deg = calculate_lpips(a, blur, weights_path=path)
    if abs(ident) > 1e-6:
        return "FAIL", f"LPIPS(x,x) = {ident}"
    if not deg > 1e-4:
        return "FAIL", f"LPIPS(x, blur(x)) = {deg} not > 0"
    heads_sd = load_torch_state_dict(path, "params")
    backbone_sd = load_torch_state_dict(alexnet_path, "params") if alexnet_path else {}
    ref = _torch_lpips_from_sd(heads_sd, backbone_sd)
    ref.eval()
    to_t = lambda im: torch.from_numpy(
        (im.astype(np.float32) / 255.0 * 2 - 1).transpose(2, 0, 1))[None]
    with torch.no_grad():
        ref_val = float(ref(to_t(a), to_t(blur)))
    if abs(deg - ref_val) > 1e-4 * max(1.0, abs(ref_val)):
        return "FAIL", f"ours {deg} vs torch replica {ref_val}"
    return "PASS", f"identity 0, blur {deg:.4f} == replica {ref_val:.4f}"


def _torch_dists_from_sd(sd, vgg16_sd):
    import torch

    from test_backbone_oracles import _TorchDISTS
    cfg = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
           (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
           (512, 512), (512, 512)]
    convs = [torch.nn.Conv2d(ci, co, 3, padding=1) for ci, co in cfg]
    # vgg16 torchvision features indices of the 13 convs
    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    src = dict(vgg16_sd or {})
    src.update(sd)
    with torch.no_grad():
        for i, conv in enumerate(convs):
            for cand in (f"convs.{i}.weight", f"features.{tv_idx[i]}.weight",
                         f"net.features.{tv_idx[i]}.weight"):
                if cand in src:
                    conv.weight.copy_(src[cand])
                    conv.bias.copy_(src[cand[:-len("weight")] + "bias"])
                    break
            else:
                raise KeyError(f"vgg16 conv {i} not found in checkpoints")
    return _TorchDISTS(convs, sd["alpha"].float(), sd["beta"].float())


def check_dists(path, vgg16_path):
    import torch

    from ssl_tpu.metrics.dists_metric import _CACHE, calculate_dists
    from ssl_tpu.utils.weight_port import load_torch_state_dict
    _CACHE.clear()
    os.environ["DISTS_PTH"] = path
    if vgg16_path:
        os.environ["VGG16_PTH"] = vgg16_path
    a, blur = _fixed_imgs()
    ident = calculate_dists(a, a, weights_path=path)
    deg = calculate_dists(a, blur, weights_path=path)
    if abs(ident) > 1e-5:
        return "FAIL", f"DISTS(x,x) = {ident}"
    if not deg > 1e-4:
        return "FAIL", f"DISTS(x, blur(x)) = {deg} not > 0"
    sd = load_torch_state_dict(path, "params")
    vgg16_sd = load_torch_state_dict(vgg16_path, "params") if vgg16_path else {}
    ref = _torch_dists_from_sd(sd, vgg16_sd)
    ref.eval()
    to_t = lambda im: torch.from_numpy(
        (im.astype(np.float32) / 255.0).transpose(2, 0, 1))[None]
    with torch.no_grad():
        ref_val = float(ref(to_t(blur), to_t(a)))  # reference arg order
    if abs(deg - ref_val) > 1e-4 * max(1.0, abs(ref_val)):
        return "FAIL", f"ours {deg} vs torch replica {ref_val}"
    return "PASS", f"identity 0, blur {deg:.4f} == replica {ref_val:.4f}"


def check_fid_inception(path):
    """pool3 parity vs the reference's own archs/inception.py loaded from the
    same file + FID(stack, stack) == 0."""
    import jax.numpy as jnp
    import torch

    from ref_loader import install_reference_stubs, ref_module
    from ssl_tpu.metrics.fid import (calculate_fid_from_stats, load_inception,
                                     stats_from_features)
    install_reference_stubs()
    inc_mod = ref_module("basicsr.archs.inception")
    old = inc_mod.LOCAL_FID_WEIGHTS
    try:
        inc_mod.LOCAL_FID_WEIGHTS = path
        ref_wrap = inc_mod.InceptionV3(output_blocks=[3], resize_input=True,
                                       normalize_input=True)
        ref_wrap.eval()
        rng = np.random.RandomState(0)
        x = rng.rand(2, 64, 64, 3).astype(np.float32)
        with torch.no_grad():
            ref_feat = ref_wrap(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0]
            ref_feat = ref_feat.squeeze(-1).squeeze(-1).numpy()
    finally:
        inc_mod.LOCAL_FID_WEIGHTS = old
    model, variables = load_inception(weights_path=path)
    mine = np.asarray(model.apply(variables, jnp.asarray(x)))
    err = float(np.max(np.abs(mine - ref_feat)) / max(1e-6, float(np.max(np.abs(ref_feat)))))
    if err > 1e-3:
        return "FAIL", f"pool3 rel err {err:.2e} vs reference inception"
    mu, sigma = stats_from_features(np.concatenate([mine, mine], 0))
    fid0 = calculate_fid_from_stats(mu, sigma, mu, sigma)
    if abs(fid0) > 1e-4:
        return "FAIL", f"FID(stats, same stats) = {fid0}"
    return "PASS", f"pool3 rel err {err:.2e}; self-FID 0"


def _ref_clipiqa_score(path, img_u8):
    """Reference's VENDORED clipiqa_pyiqa executed in place with the same
    checkpoint (clip_model.build_model infers the tower sizes from the sd)."""
    import torch

    from ref_loader import install_reference_stubs, ref_module
    install_reference_stubs()
    arch_mod = ref_module("clipiqa_pyiqa.clipiqa_arch")
    cm = ref_module("clipiqa_pyiqa.clip_model")
    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload) if isinstance(payload, dict) else payload
    model = cm.build_model(sd).float()
    old = arch_mod.load
    arch_mod.load = lambda *a, **k: model
    try:
        ref_iqa = arch_mod.CLIPIQA(backbone="RN50")
        x = torch.from_numpy((img_u8.astype(np.float32) / 255.0
                              ).transpose(2, 0, 1))[None]
        with torch.no_grad():
            return float(ref_iqa(x, device="cpu"))
    finally:
        arch_mod.load = old


def check_clipiqa(path):
    """End-to-end CLIPIQA score vs the reference's VENDORED clipiqa_pyiqa
    executed with the same RN50 checkpoint; score range sanity."""
    from ssl_tpu.metrics.clipiqa import calculate_clipiqa
    os.environ["CLIP_RN50_PTH"] = path
    if not os.environ.get("CLIP_BPE_PATH"):
        vend = os.path.join("/root/reference/GAN-Based-SR/clip",
                            "bpe_simple_vocab_16e6.txt.gz")
        if os.path.exists(vend):
            os.environ["CLIP_BPE_PATH"] = vend
    a, blur = _fixed_imgs(size=96)
    score_a = calculate_clipiqa(a, weights_path=path)
    score_b = calculate_clipiqa(blur, weights_path=path)
    for s in (score_a, score_b):
        if not (0.0 <= s <= 1.0):
            return "FAIL", f"clipiqa score {s} outside [0,1]"
    ref_a = _ref_clipiqa_score(path, a)
    if abs(ref_a - score_a) > 1e-3 * max(1.0, abs(ref_a)):
        return "FAIL", f"ours {score_a} vs vendored clipiqa {ref_a}"
    return "PASS", f"score {score_a:.4f} == vendored {ref_a:.4f}"


def check_eval_parity(net_g, arch_spec, gt_dir):
    """Full quality-parity protocol via scripts/eval_parity.py."""
    import subprocess
    cmd = [sys.executable, os.path.join(_ROOT, "scripts", "eval_parity.py"),
           "--ckpt", net_g, "--arch", arch_spec]
    cmd += ["--gt", gt_dir] if gt_dir else ["--synthetic", "2", "--gt-size", "96"]
    env = dict(os.environ, JAX_PLATFORMS=os.environ.get("JAX_PLATFORMS", "cpu"))
    r = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=1800)
    if r.returncode != 0:
        return "FAIL", f"eval_parity rc={r.returncode}: {r.stderr[-300:]}"
    tail = [ln for ln in r.stdout.strip().splitlines() if ln.strip()][-3:]
    return "PASS", " | ".join(tail)


# ------------------------------------------------------------------ selftest
def synthesize_fixtures(dst):
    """Seeded random checkpoints for every slot (layout-faithful)."""
    import torch
    torch.manual_seed(0)
    from ref_loader import install_reference_stubs
    install_reference_stubs()
    from torchvision.models import vgg
    torch.save(vgg.vgg19().state_dict(), os.path.join(dst, "vgg19.pth"))
    torch.save(vgg.vgg16().state_dict(), os.path.join(dst, "vgg16.pth"))

    from test_backbone_oracles import _torch_alexnet_features
    feats = _torch_alexnet_features()
    torch.save({f"features.{i}.{nm}": getattr(feats[i], nm).detach()
                for i in (0, 3, 6, 8, 10) for nm in ("weight", "bias")},
               os.path.join(dst, "alexnet.pth"))
    g = torch.Generator().manual_seed(3)
    torch.save({f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1, generator=g) * 0.2
                for i, c in enumerate((64, 192, 384, 256, 256))},
               os.path.join(dst, "lpips_alex.pth"))

    cfg = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
           (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
           (512, 512), (512, 512)]
    total_c = 3 + 64 + 128 + 256 + 512 + 512
    sd = {"alpha": torch.rand(1, total_c, 1, 1, generator=g),
          "beta": torch.rand(1, total_c, 1, 1, generator=g)}
    for i, (ci, co) in enumerate(cfg):
        conv = torch.nn.Conv2d(ci, co, 3, padding=1)
        sd[f"convs.{i}.weight"] = conv.weight.detach()
        sd[f"convs.{i}.bias"] = conv.bias.detach()
    torch.save(sd, os.path.join(dst, "dists.pt"))

    from test_backbone_oracles import _tiny_clip
    torch.save({"state_dict": _tiny_clip(seed=2).state_dict()},
               os.path.join(dst, "clip_rn50_tiny.pt"))

    import _tv_inception_stub as tv_inc
    donor = tv_inc.inception_v3(num_classes=1008, aux_logits=False)
    sd_inc = donor.state_dict()
    for k in sd_inc:  # randomize BN stats so stat-loading bugs can't hide
        if k.endswith("running_mean"):
            sd_inc[k] = torch.randn(sd_inc[k].shape, generator=g) * 0.1
        elif k.endswith("running_var"):
            sd_inc[k] = torch.rand(sd_inc[k].shape, generator=g) + 0.5
    torch.save(sd_inc, os.path.join(dst, "pt_inception.pth"))


def discover(weights_dir):
    found = {}
    if not weights_dir:
        return found
    for f in sorted(os.listdir(weights_dir)):
        lf = f.lower()
        p = os.path.join(weights_dir, f)
        if "vgg19" in lf:
            found.setdefault("vgg19", p)
        elif "vgg16" in lf:
            found.setdefault("vgg16", p)
        elif "alexnet" in lf:
            found.setdefault("alexnet", p)
        elif "lpips" in lf or lf == "alex.pth":
            found.setdefault("lpips", p)
        elif "dists" in lf:
            found.setdefault("dists", p)
        elif "inception" in lf:
            found.setdefault("fid_inception", p)
        elif "rn50" in lf or "clip" in lf:
            found.setdefault("clip_rn50", p)
    return found


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--weights_dir")
    for flag in ("vgg19", "vgg16", "alexnet", "lpips", "dists",
                 "fid_inception", "clip_rn50"):
        ap.add_argument(f"--{flag}")
    ap.add_argument("--net_g", help="generator .pth for the eval_parity leg")
    ap.add_argument("--arch", default='{"type": "RRDBNet", "num_feat": 64, "num_block": 23}')
    ap.add_argument("--gt", help="GT dir for eval_parity (synthetic if absent)")
    ap.add_argument("--selftest", action="store_true",
                    help="synthesize random-weight fixtures and validate them")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    if args.selftest:
        tmp = tempfile.mkdtemp(prefix="validate_backbones_selftest_")
        synthesize_fixtures(tmp)
        args.weights_dir = tmp

    found = discover(args.weights_dir)
    for k in list(found):
        if getattr(args, k, None):
            found[k] = getattr(args, k)
    for k in ("vgg19", "vgg16", "alexnet", "lpips", "dists",
              "fid_inception", "clip_rn50"):
        if getattr(args, k, None):
            found[k] = getattr(args, k)

    plan = [
        ("vgg19", lambda: check_vgg19(found["vgg19"]), "vgg19" in found),
        ("lpips(+alexnet)", lambda: check_lpips(found["lpips"], found.get("alexnet")),
         "lpips" in found),
        ("dists(+vgg16)", lambda: check_dists(found["dists"], found.get("vgg16")),
         "dists" in found),
        ("fid_inception", lambda: check_fid_inception(found["fid_inception"]),
         "fid_inception" in found),
        ("clipiqa(rn50)", lambda: check_clipiqa(found["clip_rn50"]),
         "clip_rn50" in found),
        ("eval_parity", lambda: check_eval_parity(args.net_g, args.arch, args.gt),
         bool(args.net_g)),
    ]
    rows = []
    for name, fn, have in plan:
        if not have:
            rows.append((name, "SKIP", "weights not found"))
            continue
        try:
            status, detail = fn()
        except Exception:  # noqa: BLE001
            status, detail = "FAIL", traceback.format_exc(limit=2).replace("\n", " ")[-300:]
        rows.append((name, status, detail))

    width = max(len(n) for n, _, _ in rows)
    for name, status, detail in rows:
        print(f"{name:{width}s}  {status:4s}  {detail}")
    n_fail = sum(1 for _, s, _ in rows if s == "FAIL")
    n_pass = sum(1 for _, s, _ in rows if s == "PASS")
    if args.json:
        print(json.dumps({"pass": n_pass, "fail": n_fail,
                          "rows": [list(r) for r in rows]}))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
