"""Torch-checkpoint porting: reference .pth layouts -> our flax param trees.

Handles the reference's save format {param_key: state_dict} with 'params' /
'params_ema' keys and optional 'module.' DDP prefixes (reference
base_model.py:289-315).  Conversions are per-arch key maps; conv weights go
OIHW -> HWIO.  CPU torch is available in-image for deserialization only."""

from __future__ import annotations

import pickle
import re

import numpy as np


def _to_np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv_w(t):
    return _to_np(t).transpose(2, 3, 1, 0)  # OIHW -> HWIO


def load_torch_state_dict(path: str, param_key: str = "params") -> dict:
    import torch
    try:
        # safe path first: no arbitrary pickle execution
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        import logging
        logging.getLogger("ssl_tpu").warning(
            "load_torch_state_dict(%s): weights_only load failed; falling back "
            "to full unpickling — only do this for checkpoints you trust.", path)
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and param_key in sd:
        sd = sd[param_key]
    elif isinstance(sd, dict) and "params_ema" in sd and param_key == "params":
        sd = sd.get("params", sd["params_ema"])
    if isinstance(sd, dict) and all(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()}
    return sd


def convert_rrdbnet(sd: dict, scan_blocks: bool = True) -> dict:
    """Reference RRDBNet keys -> ssl_tpu RRDBNet flax tree.

    torch: conv_first / body.{i}.rdb{j}.conv{k} / conv_body / conv_up1/2 /
    conv_hr / conv_last.  With scan_blocks (our default arch config) the
    per-block leaves are STACKED along a leading (num_block,) axis under
    body/RRDB_0/...; otherwise they land in body_{i}/..."""
    params: dict = {}

    def put(dotted: list[str], leaf_name: str, value):
        node = params
        for p in dotted:
            node = node.setdefault(p, {})
        node[leaf_name] = value

    done = set()
    for name in ("conv_first", "conv_body", "conv_up1", "conv_up2", "conv_hr", "conv_last"):
        wk, bk = f"{name}.weight", f"{name}.bias"
        if wk in sd:
            put([name], "kernel", _conv_w(sd[wk]))
            put([name], "bias", _to_np(sd[bk]))
            done.update([wk, bk])
    pat = re.compile(r"body\.(\d+)\.rdb(\d)\.conv(\d)\.(weight|bias)")
    per_block: dict = {}
    n_blocks = 0
    for key, val in sd.items():
        m = pat.match(key)
        if not m:
            continue
        i, j, k, kind = int(m.group(1)), int(m.group(2)), int(m.group(3)), m.group(4)
        n_blocks = max(n_blocks, i + 1)
        leaf_name = "kernel" if kind == "weight" else "bias"
        value = _conv_w(val) if kind == "weight" else _to_np(val)
        per_block.setdefault((j, k, leaf_name), {})[i] = value
        done.add(key)
    for (j, k, leaf_name), blocks in per_block.items():
        if scan_blocks:
            stacked = np.stack([blocks[i] for i in range(n_blocks)])
            put(["body", "RRDB_0", f"ResidualDenseBlock_{j-1}", f"Conv3x3_{k-1}", "Conv_0"],
                leaf_name, stacked)
        else:
            for i, value in blocks.items():
                put([f"body_{i}", f"ResidualDenseBlock_{j-1}", f"Conv3x3_{k-1}", "Conv_0"],
                    leaf_name, value)
    leftovers = set(sd) - done
    if leftovers:
        import logging
        logging.getLogger("ssl_tpu").warning("convert_rrdbnet: unmapped keys %s", sorted(leftovers)[:8])
    return params


def _ln(sd: dict, key: str) -> dict:
    return {"scale": _to_np(sd[f"{key}.weight"]), "bias": _to_np(sd[f"{key}.bias"])}


def _dense(sd: dict, key: str) -> dict:
    # torch Linear (out, in) -> flax Dense kernel (in, out)
    return {"kernel": _to_np(sd[f"{key}.weight"]).T, "bias": _to_np(sd[f"{key}.bias"])}


def _convp(sd: dict, key: str) -> dict:
    node = {"kernel": _conv_w(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        node["bias"] = _to_np(sd[f"{key}.bias"])
    return node


def _swin_block_tree(sd: dict, pfx: str) -> dict:
    """One reference Swin block (swinir_arch.py:241-254) -> our SwinBlock tree.

    Our _rel_pos_index / qkv reshape order / bias permute replicate the
    standard Swin math, so relative_position_bias_table copies verbatim and
    qkv/proj only need the Linear transpose."""
    return {
        "LayerNorm_0": _ln(sd, f"{pfx}.norm1"),
        "WindowAttention_0": {
            "qkv": _dense(sd, f"{pfx}.attn.qkv"),
            "proj": _dense(sd, f"{pfx}.attn.proj"),
            "rel_pos_bias": _to_np(sd[f"{pfx}.attn.relative_position_bias_table"]),
        },
        "LayerNorm_1": _ln(sd, f"{pfx}.norm2"),
        "Dense_0": _dense(sd, f"{pfx}.mlp.fc1"),
        "Dense_1": _dense(sd, f"{pfx}.mlp.fc2"),
    }


def convert_swinir(sd: dict, scan_blocks: bool = True) -> dict:
    """Reference SwinIR keys (swinir_arch.py:694-979) -> ssl_tpu SwinIR tree.

    torch: conv_first / layers.{i}.residual_group.blocks.{j}.* /
    layers.{i}.conv / patch_embed.norm / norm / conv_after_body / upsampler
    convs.  With scan_blocks (our default) even-depth layers stack the
    (no-shift, shift) block pairs under layer_{i}/pairs with a leading
    (depth//2,) axis; otherwise blocks land at layer_{i}/block_{j}.
    Buffers (relative_position_index, attn_mask) are recomputed, not loaded.
    Only resi_connection='1conv' layouts are supported."""
    params: dict = {}
    for name in ("conv_first", "conv_after_body", "conv_up1", "conv_up2",
                 "conv_hr", "conv_last"):
        if f"{name}.weight" in sd:
            params[name] = _convp(sd, name)
    if "conv_before_upsample.0.weight" in sd:  # Sequential(conv, lrelu)
        params["conv_before_upsample"] = _convp(sd, "conv_before_upsample.0")
    if "norm.weight" in sd:
        params["norm"] = _ln(sd, "norm")
    if "patch_embed.norm.weight" in sd:
        params["patch_embed_norm"] = _ln(sd, "patch_embed.norm")
    # upsample Sequential: conv at even indices (PixelShuffle between)
    ups = sorted({int(m.group(1)) for k in sd
                  if (m := re.match(r"upsample\.(\d+)\.weight", k))})
    for n, idx in enumerate(ups):
        params[f"Conv_{n}"] = _convp(sd, f"upsample.{idx}")

    pat = re.compile(r"layers\.(\d+)\.residual_group\.blocks\.(\d+)\.")
    depths: dict = {}
    for k in sd:
        m = pat.match(k)
        if m:
            i, j = int(m.group(1)), int(m.group(2))
            depths[i] = max(depths.get(i, 0), j + 1)
    for i in sorted(depths):
        depth = depths[i]
        layer: dict = {"conv": _convp(sd, f"layers.{i}.conv")}
        base = f"layers.{i}.residual_group.blocks"
        if scan_blocks and depth % 2 == 0 and depth > 2:
            evens = [_swin_block_tree(sd, f"{base}.{2*p}") for p in range(depth // 2)]
            odds = [_swin_block_tree(sd, f"{base}.{2*p+1}") for p in range(depth // 2)]
            import jax
            stack = lambda trees: jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)
            layer["pairs"] = {"SwinBlock_0": stack(evens), "SwinBlock_1": stack(odds)}
        else:
            for j in range(depth):
                layer[f"block_{j}"] = _swin_block_tree(sd, f"{base}.{j}")
        params[f"layer_{i}"] = layer
    return params


def export_swinir_to_torch(params: dict, path: str, param_key: str = "params",
                           also_ema: dict | None = None) -> None:
    """Inverse port: our SwinIR flax tree -> reference .pth key layout."""
    import torch

    def _t(a):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(a)))

    def put_conv(sd, key, node):
        sd[f"{key}.weight"] = _t(np.asarray(node["kernel"]).transpose(3, 2, 0, 1))
        sd[f"{key}.bias"] = _t(node["bias"])

    def put_ln(sd, key, node):
        sd[f"{key}.weight"] = _t(node["scale"])
        sd[f"{key}.bias"] = _t(node["bias"])

    def put_dense(sd, key, node):
        sd[f"{key}.weight"] = _t(np.asarray(node["kernel"]).T)
        sd[f"{key}.bias"] = _t(node["bias"])

    def put_block(sd, pfx, blk):
        put_ln(sd, f"{pfx}.norm1", blk["LayerNorm_0"])
        attn = blk["WindowAttention_0"]
        put_dense(sd, f"{pfx}.attn.qkv", attn["qkv"])
        put_dense(sd, f"{pfx}.attn.proj", attn["proj"])
        sd[f"{pfx}.attn.relative_position_bias_table"] = _t(attn["rel_pos_bias"])
        put_ln(sd, f"{pfx}.norm2", blk["LayerNorm_1"])
        put_dense(sd, f"{pfx}.mlp.fc1", blk["Dense_0"])
        put_dense(sd, f"{pfx}.mlp.fc2", blk["Dense_1"])

    def tree_to_sd(tree):
        sd: dict = {}
        for name in ("conv_first", "conv_after_body", "conv_up1", "conv_up2",
                     "conv_hr", "conv_last"):
            if name in tree:
                put_conv(sd, name, tree[name])
        if "conv_before_upsample" in tree:
            put_conv(sd, "conv_before_upsample.0", tree["conv_before_upsample"])
        if "norm" in tree:
            put_ln(sd, "norm", tree["norm"])
        if "patch_embed_norm" in tree:
            put_ln(sd, "patch_embed.norm", tree["patch_embed_norm"])
        n = 0
        while f"Conv_{n}" in tree:
            put_conv(sd, f"upsample.{2*n}", tree[f"Conv_{n}"])
            n += 1
        i = 0
        while f"layer_{i}" in tree:
            layer = tree[f"layer_{i}"]
            put_conv(sd, f"layers.{i}.conv", layer["conv"])
            base = f"layers.{i}.residual_group.blocks"
            if "pairs" in layer:
                npairs = np.asarray(jax_leaves_first(layer["pairs"])).shape[0]
                for p in range(npairs):
                    take = lambda t: {k: take(v) for k, v in t.items()} \
                        if isinstance(t, dict) else np.asarray(t)[p]
                    put_block(sd, f"{base}.{2*p}", take(layer["pairs"]["SwinBlock_0"]))
                    put_block(sd, f"{base}.{2*p+1}", take(layer["pairs"]["SwinBlock_1"]))
            else:
                j = 0
                while f"block_{j}" in layer:
                    put_block(sd, f"{base}.{j}", layer[f"block_{j}"])
                    j += 1
            i += 1
        return sd

    payload = {param_key: tree_to_sd(params)}
    if also_ema is not None:
        payload["params_ema"] = tree_to_sd(also_ema)
    torch.save(payload, path)


def convert_srvgg(sd: dict) -> dict:
    """Reference SRVGGNetCompact keys (srvgg_arch.py:7-70: body.{k} alternating
    conv / per-channel PReLU, final conv) -> our named flax tree."""
    idxs = sorted({int(m.group(1)) for k in sd
                   if (m := re.match(r"body\.(\d+)\.weight", k))})
    last = max(idxs)
    params: dict = {"conv_first": _convp(sd, "body.0")}
    if "body.1.weight" in sd and sd["body.1.weight"].dim() == 1:
        params["act_first"] = {"alpha": _to_np(sd["body.1.weight"])}
    n_conv = (last - 2) // 2
    for i in range(n_conv):
        params[f"conv_{i}"] = _convp(sd, f"body.{2*i+2}")
        act_k = f"body.{2*i+3}.weight"
        if act_k in sd:
            params[f"act_{i}"] = {"alpha": _to_np(sd[act_k])}
    params["conv_last"] = _convp(sd, f"body.{last}")
    return params


def convert_msrresnet(sd: dict) -> dict:
    """Reference MSRResNet keys (srresnet_arch.py: conv_first / body.{i}.conv1-2 /
    upconv1-2 / conv_hr / conv_last) -> our body_{i}/Conv3x3_{j}/Conv_0 tree."""
    params: dict = {}
    for name in ("conv_first", "upconv1", "upconv2", "conv_hr", "conv_last"):
        if f"{name}.weight" in sd:
            params[name] = _convp(sd, name)
    pat = re.compile(r"body\.(\d+)\.conv(\d)\.weight")
    for k in sd:
        m = pat.match(k)
        if not m:
            continue
        i, j = int(m.group(1)), int(m.group(2))
        params.setdefault(f"body_{i}", {})[f"Conv3x3_{j-1}"] = {
            "Conv_0": _convp(sd, f"body.{i}.conv{j}")}
    return params


def _upsample_tree(sd: dict, pfx: str = "upsample") -> dict:
    """torch arch_util.Upsample Sequential (Conv, PixelShuffle, [Conv,
    PixelShuffle]) -> our Upsample module's Conv_{j} children."""
    node: dict = {}
    j = 0
    for i in range(0, 8, 2):
        if f"{pfx}.{i}.weight" in sd:
            node[f"Conv_{j}"] = _convp(sd, f"{pfx}.{i}")
            j += 1
    return node


def convert_edsr(sd: dict) -> dict:
    """Reference EDSR keys (edsr_arch.py:30-48: conv_first / body.{i}.conv1-2 /
    conv_after_body / upsample.{0,2} / conv_last) -> our flax tree."""
    params: dict = {}
    for name in ("conv_first", "conv_after_body", "conv_last"):
        params[name] = _convp(sd, name)
    pat = re.compile(r"body\.(\d+)\.conv(\d)\.weight")
    for k in sd:
        if (m := pat.match(k)):
            i, j = int(m.group(1)), int(m.group(2))
            params.setdefault(f"body_{i}", {})[f"Conv3x3_{j-1}"] = {
                "Conv_0": _convp(sd, f"body.{i}.conv{j}")}
    params["upsample"] = _upsample_tree(sd)
    return params


def convert_rcan(sd: dict) -> dict:
    """Reference RCAN keys (rcan_arch.py:96-122: body.{g}.residual_group.{b}.
    rcab.{0,2}(convs)/.3.attention.{1,3}(CA) + body.{g}.conv) -> our
    group_{g}/rcab_{b}/{conv1,conv2,ca} tree."""
    params: dict = {}
    for name in ("conv_first", "conv_after_body", "conv_last"):
        params[name] = _convp(sd, name)
    pat = re.compile(r"body\.(\d+)\.residual_group\.(\d+)\.rcab\.(\d+)(?:\.attention\.(\d+))?\.weight")
    for k in sd:
        if (m := pat.match(k)):
            g, b, idx, att = (int(m.group(1)), int(m.group(2)), int(m.group(3)),
                              m.group(4) and int(m.group(4)))
            rcab = params.setdefault(f"group_{g}", {}).setdefault(f"rcab_{b}", {})
            base = k[:-len(".weight")]
            if idx == 0:
                rcab["conv1"] = _convp(sd, base)
            elif idx == 2:
                rcab["conv2"] = _convp(sd, base)
            elif idx == 3:
                rcab.setdefault("ca", {})["down" if att == 1 else "up"] = _convp(sd, base)
    gpat = re.compile(r"body\.(\d+)\.conv\.weight")
    for k in sd:
        if (m := gpat.match(k)):
            params.setdefault(f"group_{int(m.group(1))}", {})["conv"] = \
                _convp(sd, k[:-len(".weight")])
    params["upsample"] = _upsample_tree(sd)
    return params


def convert_ecbsr(sd: dict) -> dict:
    """Reference ECBSR keys (ecbsr_arch.py: backbone.{i}.conv3x3 +
    .conv1x1_3x3.{k0,b0,k1,b1} + .conv1x1_{sbx,sby,lpl}.{k0,b0,scale,bias} +
    .act) -> our backbone_{i} tree.  The fixed masks are constants on both
    sides (torch stores them as requires_grad=False params; skipped)."""
    params: dict = {}
    n = 1 + max(int(m.group(1)) for k in sd
                if (m := re.match(r"backbone\.(\d+)\.", k)))
    for i in range(n):
        p = f"backbone.{i}"
        blk: dict = {"conv3x3": _convp(sd, f"{p}.conv3x3")}
        blk["conv1x1_3x3"] = {
            "conv0_w": {"kernel": _conv_w(sd[f"{p}.conv1x1_3x3.k0"])},
            "b0_pad": _to_np(sd[f"{p}.conv1x1_3x3.b0"]),
            "conv1": {"kernel": _conv_w(sd[f"{p}.conv1x1_3x3.k1"]),
                      "bias": _to_np(sd[f"{p}.conv1x1_3x3.b1"])},
        }
        for br in ("conv1x1_sbx", "conv1x1_sby", "conv1x1_lpl"):
            blk[br] = {
                "conv0_w": {"kernel": _conv_w(sd[f"{p}.{br}.k0"])},
                "b0_pad": _to_np(sd[f"{p}.{br}.b0"]),
                "scale": _to_np(sd[f"{p}.{br}.scale"]).reshape(-1),
                "bias": _to_np(sd[f"{p}.{br}.bias"]),
            }
        if f"{p}.act.weight" in sd:
            blk["act"] = {"alpha": _to_np(sd[f"{p}.act.weight"])}
        params[f"backbone_{i}"] = blk
    return params


def convert_ridnet(sd: dict) -> dict:
    """Reference RIDNet keys (ridnet_arch.py:154-172: sub_mean/add_mean 1x1
    convs, head, body.{i}.{merge,block1,block2,ca}, tail) -> our
    eam_{i}/{d1_*,d2_*,agg,b1_*,b2_*,ca_*} tree."""
    params: dict = {
        "sub_mean": {"conv": _convp(sd, "sub_mean")},
        "add_mean": {"conv": _convp(sd, "add_mean")},
        "head": _convp(sd, "head"),
        "tail": _convp(sd, "tail"),
    }
    n = 1 + max(int(m.group(1)) for k in sd
                if (m := re.match(r"body\.(\d+)\.", k)))
    for i in range(n):
        p = f"body.{i}"
        params[f"eam_{i}"] = {
            "d1_0": _convp(sd, f"{p}.merge.dilation1.0"),
            "d1_1": _convp(sd, f"{p}.merge.dilation1.2"),
            "d2_0": _convp(sd, f"{p}.merge.dilation2.0"),
            "d2_1": _convp(sd, f"{p}.merge.dilation2.2"),
            "agg": _convp(sd, f"{p}.merge.aggregation.0"),
            "b1_0": _convp(sd, f"{p}.block1.conv1"),
            "b1_1": _convp(sd, f"{p}.block1.conv2"),
            "b2_0": _convp(sd, f"{p}.block2.body.0"),
            "b2_1": _convp(sd, f"{p}.block2.body.2"),
            "b2_2": _convp(sd, f"{p}.block2.body.4"),
            "ca_down": _convp(sd, f"{p}.ca.attention.1"),
            "ca_up": _convp(sd, f"{p}.ca.attention.3"),
        }
    return params


def _conv3d_w(t):
    return _to_np(t).transpose(2, 3, 4, 1, 0)  # OIkTkHkW -> kTkHkW,I,O


def _conv3dp(sd: dict, base: str) -> dict:
    node = {"kernel": _conv3d_w(sd[f"{base}.weight"])}
    if f"{base}.bias" in sd:
        node["bias"] = _to_np(sd[f"{base}.bias"])
    return node


def _spynet_tree(sd: dict, pfx: str = "") -> dict:
    """Reference SpyNet keys ({pfx}basic_module.{i}.basic_module.{2j}) ->
    basic_module_{i}/conv_{j}.  mean/std buffers are constants (skipped)."""
    params: dict = {}
    pat = re.compile(re.escape(pfx) + r"basic_module\.(\d+)\.basic_module\.(\d+)\.weight")
    for k in sd:
        if (m := pat.match(k)):
            i, j = int(m.group(1)), int(m.group(2))
            params.setdefault(f"basic_module_{i}", {})[f"conv_{j // 2}"] = \
                _convp(sd, k[:-len(".weight")])
    return params


def convert_spynet(sd: dict) -> dict:
    return _spynet_tree(sd)


def _conv_res_blocks_tree(sd: dict, pfx: str) -> dict:
    """Reference ConvResidualBlocks ({pfx}.main.0 conv + .main.2.{i}.conv1/2)
    -> our conv + block_{i}/Conv3x3_{j}/Conv_0 tree."""
    node: dict = {"conv": _convp(sd, f"{pfx}.main.0")}
    pat = re.compile(re.escape(pfx) + r"\.main\.2\.(\d+)\.conv(\d)\.weight")
    for k in sd:
        if (m := pat.match(k)):
            i, j = int(m.group(1)), int(m.group(2))
            node.setdefault(f"block_{i}", {})[f"Conv3x3_{j - 1}"] = {
                "Conv_0": _convp(sd, f"{pfx}.main.2.{i}.conv{j}")}
    return node


def convert_basicvsr(sd: dict) -> dict:
    """Reference BasicVSR keys (basicvsr_arch.py:21-42) -> our flax tree."""
    params: dict = {"spynet": _spynet_tree(sd, "spynet.")}
    for trunk in ("backward_trunk", "forward_trunk"):
        params[trunk] = _conv_res_blocks_tree(sd, trunk)
    for name in ("fusion", "upconv1", "upconv2", "conv_hr", "conv_last"):
        params[name] = _convp(sd, name)
    return params


def convert_toflow(sd: dict) -> dict:
    """Reference TOFlow keys (tof_arch.py): spynet.basic_module.{i}.
    basic_module.{0,3,6,9,12} convs (+BN at 1,4,7,10) and conv_1..conv_4."""
    params: dict = {"spynet": {}}
    for i in range(4):
        p = f"spynet.basic_module.{i}.basic_module"
        mod: dict = {}
        for j, idx in enumerate((0, 3, 6, 9)):
            mod[f"conv_{j}"] = {"kernel": _conv_w(sd[f"{p}.{idx}.weight"])}
            bn = f"{p}.{idx + 1}"
            mod[f"bn_{j}"] = {"scale": _to_np(sd[f"{bn}.weight"]),
                              "bias": _to_np(sd[f"{bn}.bias"])}
        mod["conv_4"] = _convp(sd, f"{p}.12")
        params["spynet"][f"basic_module_{i}"] = mod
    for k in ("conv_1", "conv_2", "conv_3", "conv_4"):
        params[k] = _convp(sd, k)
    return params


def toflow_batch_stats(sd: dict, ref_batch_stats: dict) -> dict:
    """BN running stats for TOFlow's SPyNetTOF."""
    stats = {"spynet": {}}
    for i in range(4):
        p = f"spynet.basic_module.{i}.basic_module"
        mod = {}
        for j, idx in enumerate((1, 4, 7, 10)):
            mod[f"bn_{j}"] = {"mean": _to_np(sd[f"{p}.{idx}.running_mean"]),
                              "var": _to_np(sd[f"{p}.{idx}.running_var"])}
        stats["spynet"][f"basic_module_{i}"] = mod
    del ref_batch_stats
    return stats


def _duf_unit(sd: dict, pfx: str) -> tuple[dict, dict]:
    """One DUF BN-ReLU-Conv1-BN-ReLU-Conv3 Sequential (indices 0,2,3,5)."""
    params = {
        "bn0": {"scale": _to_np(sd[f"{pfx}.0.weight"]), "bias": _to_np(sd[f"{pfx}.0.bias"])},
        "conv0": _conv3dp(sd, f"{pfx}.2"),
        "bn1": {"scale": _to_np(sd[f"{pfx}.3.weight"]), "bias": _to_np(sd[f"{pfx}.3.bias"])},
        "conv1": _conv3dp(sd, f"{pfx}.5"),
    }
    stats = {
        "bn0": {"mean": _to_np(sd[f"{pfx}.0.running_mean"]),
                "var": _to_np(sd[f"{pfx}.0.running_var"])},
        "bn1": {"mean": _to_np(sd[f"{pfx}.3.running_mean"]),
                "var": _to_np(sd[f"{pfx}.3.running_var"])},
    }
    return params, stats


def convert_duf(sd: dict) -> dict:
    """Reference DUF keys (duf_arch.py:204-243) -> our flax tree."""
    params: dict = {"conv3d1": _conv3dp(sd, "conv3d1"),
                    "conv3d2": _conv3dp(sd, "conv3d2"),
                    "bn3d2": {"scale": _to_np(sd["bn3d2.weight"]),
                              "bias": _to_np(sd["bn3d2.bias"])}}
    for name in ("conv3d_r1", "conv3d_r2", "conv3d_f1", "conv3d_f2"):
        params[name] = _conv3dp(sd, name)
    n = 1 + max(int(m.group(1)) for k in sd
                if (m := re.match(r"dense_block1\.dense_blocks\.(\d+)\.", k)))
    for i in range(n):
        params[f"dense1_{i}"], _ = _duf_unit(sd, f"dense_block1.dense_blocks.{i}")
    for i in range(3):
        params[f"reduce_{i}"], _ = _duf_unit(sd, f"dense_block2.temporal_reduce{i + 1}")
    return params


def duf_batch_stats(sd: dict, ref_batch_stats: dict) -> dict:
    stats: dict = {"bn3d2": {"mean": _to_np(sd["bn3d2.running_mean"]),
                             "var": _to_np(sd["bn3d2.running_var"])}}
    n = 1 + max(int(m.group(1)) for k in sd
                if (m := re.match(r"dense_block1\.dense_blocks\.(\d+)\.", k)))
    for i in range(n):
        _, stats[f"dense1_{i}"] = _duf_unit(sd, f"dense_block1.dense_blocks.{i}")
    for i in range(3):
        _, stats[f"reduce_{i}"] = _duf_unit(sd, f"dense_block2.temporal_reduce{i + 1}")
    del ref_batch_stats
    return stats


def _dcn_offset_perm(dg: int, k: int = 3) -> np.ndarray:
    """Channel permutation for DCNv2Pack conv_offset: ours[i] = torch[perm[i]].

    torch/mmcv layout (after the Pack's chunk+cat, as read by the CUDA
    kernel): per deformable group, (y,x) interleaved per kernel position,
    mask in the last third.  Ours: [all y (g,p) | all x | mask]."""
    n = dg * k * k
    perm = np.empty(3 * n, dtype=np.int64)
    for g in range(dg):
        for p in range(k * k):
            perm[g * k * k + p] = g * 2 * k * k + 2 * p
            perm[n + g * k * k + p] = g * 2 * k * k + 2 * p + 1
            perm[2 * n + g * k * k + p] = 2 * n + g * k * k + p
    return perm


def _dcn_tree(sd: dict, pfx: str) -> dict:
    """DCNv2Pack params -> our DCNv2PackM tree (incl. offset-channel perm)."""
    ow = _to_np(sd[f"{pfx}.conv_offset.weight"])
    ob = _to_np(sd[f"{pfx}.conv_offset.bias"])
    k = ow.shape[-1]
    dg = ow.shape[0] // (3 * k * k)
    perm = _dcn_offset_perm(dg, k)
    return {
        "weight": _conv_w(sd[f"{pfx}.weight"]),
        "bias": _to_np(sd[f"{pfx}.bias"]),
        "conv_offset": {"kernel": _conv_w(ow[perm]), "bias": ob[perm]},
    }


def _resblock_seq_tree(sd: dict, pfx: str, out_name: str) -> dict:
    """make_layer(ResidualBlockNoBN) Sequential ({pfx}.{i}.conv1/2) ->
    {out_name}_{i}/Conv3x3_{j}/Conv_0 entries."""
    node: dict = {}
    pat = re.compile(re.escape(pfx) + r"\.(\d+)\.conv(\d)\.weight")
    for key in sd:
        if (m := pat.match(key)):
            i, j = int(m.group(1)), int(m.group(2))
            node.setdefault(f"{out_name}_{i}", {})[f"Conv3x3_{j - 1}"] = {
                "Conv_0": _convp(sd, f"{pfx}.{i}.conv{j}")}
    return node


def _pcd_tree(sd: dict, pfx: str) -> dict:
    node: dict = {}
    for lv in ("l1", "l2", "l3"):
        for cname in ("offset_conv1", "offset_conv2", "offset_conv3", "feat_conv"):
            key = f"{pfx}.{cname}.{lv}.weight"
            if key in sd:
                node[f"{cname}_{lv}"] = _convp(sd, f"{pfx}.{cname}.{lv}")
        if f"{pfx}.dcn_pack.{lv}.weight" in sd:
            node[f"dcn_pack_{lv}"] = _dcn_tree(sd, f"{pfx}.dcn_pack.{lv}")
    node["cas_offset_conv1"] = _convp(sd, f"{pfx}.cas_offset_conv1")
    node["cas_offset_conv2"] = _convp(sd, f"{pfx}.cas_offset_conv2")
    node["cas_dcnpack"] = _dcn_tree(sd, f"{pfx}.cas_dcnpack")
    return node


def _tsa_tree(sd: dict, pfx: str) -> dict:
    names = ("temporal_attn1", "temporal_attn2", "feat_fusion", "spatial_attn1",
             "spatial_attn2", "spatial_attn3", "spatial_attn4", "spatial_attn5",
             "spatial_attn_l1", "spatial_attn_l2", "spatial_attn_l3",
             "spatial_attn_add1", "spatial_attn_add2")
    return {n: _convp(sd, f"{pfx}.{n}") for n in names}


def _edvr_pyramid_tree(sd: dict, extract_pfx: str, base_pfx: str = "") -> dict:
    node = _resblock_seq_tree(sd, extract_pfx, "extract")
    for n in ("conv_l2_1", "conv_l2_2", "conv_l3_1", "conv_l3_2"):
        node[n] = _convp(sd, f"{base_pfx}{n}")
    return node


def convert_edvr(sd: dict) -> dict:
    """Reference EDVR keys (edvr_arch.py:271-320) -> our flax tree."""
    params: dict = {}
    if "conv_first.weight" in sd:
        params["conv_first"] = _convp(sd, "conv_first")
    if "conv_1x1.weight" in sd:
        params["conv_1x1"] = _convp(sd, "conv_1x1")
        pd: dict = {"conv_first": _convp(sd, "predeblur.conv_first")}
        for n in ("stride_conv_hr1", "stride_conv_hr2", "stride_conv_l2",
                  "stride_conv_l3"):
            if f"predeblur.{n}.weight" in sd:
                pd[n] = _convp(sd, f"predeblur.{n}")
        for n in ("resblock_l3", "resblock_l2_1", "resblock_l2_2"):
            pd[n] = {f"Conv3x3_{j - 1}": {"Conv_0": _convp(sd, f"predeblur.{n}.conv{j}")}
                     for j in (1, 2)}
        pd.update(_resblock_seq_tree(sd, "predeblur.resblock_l1", "resblock_l1"))
        params["predeblur"] = pd
    params["pyramid"] = _edvr_pyramid_tree(sd, "feature_extraction")
    params["pcd_align"] = _pcd_tree(sd, "pcd_align")
    if "fusion.temporal_attn1.weight" in sd:
        params["fusion"] = _tsa_tree(sd, "fusion")
    else:
        params["fusion"] = _convp(sd, "fusion")
    params.update(_resblock_seq_tree(sd, "reconstruction", "recon"))
    for n in ("upconv1", "upconv2", "conv_hr", "conv_last"):
        params[n] = _convp(sd, n)
    return params


def _edvr_feat_extractor_tree(sd: dict, pfx: str) -> dict:
    """EDVRFeatureExtractor (basicvsr_arch.py:271-336) -> our tree."""
    return {
        "conv_first": _convp(sd, f"{pfx}.conv_first"),
        "pyramid": _edvr_pyramid_tree(sd, f"{pfx}.feature_extraction", f"{pfx}."),
        "pcd_align": _pcd_tree(sd, f"{pfx}.pcd_align"),
        "fusion": _tsa_tree(sd, f"{pfx}.fusion"),
    }


def convert_basicvsrpp(sd: dict) -> dict:
    """Reference BasicVSRPlusPlus keys (basicvsrpp_arch.py:43-96) -> ours.
    The SecondOrderDeformableAlignment conv_offset output layout is consumed
    raw on our side (no channel permutation needed)."""
    params: dict = {"spynet": _spynet_tree(sd, "spynet.")}
    if "feat_extract.main.0.weight" in sd:
        params["feat_extract"] = _conv_res_blocks_tree(sd, "feat_extract")
    else:  # is_low_res_input=False variant: two strided convs first
        params["feat_down1"] = _convp(sd, "feat_extract.0")
        params["feat_down2"] = _convp(sd, "feat_extract.2")
        params["feat_extract"] = _conv_res_blocks_tree(sd, "feat_extract.4")
    for module in ("backward_1", "forward_1", "backward_2", "forward_2"):
        da = f"deform_align.{module}"
        node = {"weight": _conv_w(sd[f"{da}.weight"]),
                "bias": _to_np(sd[f"{da}.bias"])}
        for j, idx in enumerate((0, 2, 4, 6)):
            node[f"offset_conv{j}"] = _convp(sd, f"{da}.conv_offset.{idx}")
        params[f"deform_align_{module}"] = node
        params[f"backbone_{module}"] = _conv_res_blocks_tree(sd, f"backbone.{module}")
    params["reconstruction"] = _conv_res_blocks_tree(sd, "reconstruction")
    for name in ("upconv1", "upconv2", "conv_hr", "conv_last"):
        params[name] = _convp(sd, name)
    return params


def convert_iconvsr(sd: dict) -> dict:
    """Reference IconVSR keys (basicvsr_arch.py:133-167) -> our flax tree."""
    params: dict = {"spynet": _spynet_tree(sd, "spynet."),
                    "edvr": _edvr_feat_extractor_tree(sd, "edvr")}
    for trunk in ("backward_trunk", "forward_trunk"):
        params[trunk] = _conv_res_blocks_tree(sd, trunk)
    for name in ("backward_fusion", "forward_fusion", "upconv1", "upconv2",
                 "conv_hr", "conv_last"):
        params[name] = _convp(sd, name)
    return params


def _eql(sd: dict, base: str) -> dict:
    """EqualLinear: torch weight (out,in) -> kernel (in,out)."""
    node = {"kernel": _to_np(sd[f"{base}.weight"]).T}
    if f"{base}.bias" in sd:
        node["bias"] = _to_np(sd[f"{base}.bias"])
    return node


def _modconv_tree(sd: dict, base: str) -> dict:
    """ModulatedConv2d: weight (1,out,in,k,k) -> (k,k,in,out) + modulation."""
    return {"weight": _conv_w(_to_np(sd[f"{base}.weight"])[0]),
            "modulation": _eql(sd, f"{base}.modulation")}


def _styleconv_tree(sd: dict, base: str) -> dict:
    return {"modulated_conv": _modconv_tree(sd, f"{base}.modulated_conv"),
            "noise_weight": _to_np(sd[f"{base}.weight"]).reshape(1),
            "activate_bias": _to_np(sd[f"{base}.activate.bias"])}


def _torgb_tree(sd: dict, base: str) -> dict:
    return {"modulated_conv": _modconv_tree(sd, f"{base}.modulated_conv"),
            "bias": _to_np(sd[f"{base}.bias"]).reshape(3)}


def convert_stylegan2(sd: dict) -> dict:
    """Reference StyleGAN2Generator keys (stylegan2_arch.py:394-491) -> ours."""
    params: dict = {
        "constant_input": _to_np(sd["constant_input.weight"]).transpose(0, 2, 3, 1),
        "style_conv1": _styleconv_tree(sd, "style_conv1"),
        "to_rgb1": _torgb_tree(sd, "to_rgb1"),
    }
    n_mlp = 1 + max(int(m.group(1)) for k in sd
                    if (m := re.match(r"style_mlp\.(\d+)\.weight", k)))
    for i in range(1, n_mlp):
        params[f"style_mlp_{i - 1}"] = _eql(sd, f"style_mlp.{i}")
    for k in sd:
        if (m := re.match(r"noises\.noise(\d+)$", k)):
            params[f"noise{m.group(1)}"] = _to_np(sd[k]).transpose(0, 2, 3, 1)
    for k in sd:
        if (m := re.match(r"style_convs\.(\d+)\.weight", k)):
            j = int(m.group(1))
            params[f"style_convs_{j}"] = _styleconv_tree(sd, f"style_convs.{j}")
        elif (m := re.match(r"to_rgbs\.(\d+)\.bias", k)):
            j = int(m.group(1))
            params[f"to_rgbs_{j}"] = _torgb_tree(sd, f"to_rgbs.{j}")
    return params


def _convlayer_tree(sd: dict, base: str, downsample: bool) -> dict:
    """StyleGAN2 discriminator ConvLayer Sequential: [smooth,] EqualConv2d
    [, FusedLeakyReLU]."""
    ci = 1 if downsample else 0
    node: dict = {"conv": {"weight": _conv_w(sd[f"{base}.{ci}.weight"])}}
    if f"{base}.{ci}.bias" in sd:
        node["conv"]["bias"] = _to_np(sd[f"{base}.{ci}.bias"])
    if f"{base}.{ci + 1}.bias" in sd:
        node["activate_bias"] = _to_np(sd[f"{base}.{ci + 1}.bias"])
    return node


def convert_stylegan2_disc(sd: dict) -> dict:
    """Reference StyleGAN2Discriminator keys (stylegan2_arch.py:733-781)."""
    params: dict = {"conv_body_0": _convlayer_tree(sd, "conv_body.0", False)}
    n_body = 1 + max(int(m.group(1)) for k in sd
                     if (m := re.match(r"conv_body\.(\d+)\.", k)))
    for i in range(1, n_body):
        params[f"conv_body_{i}"] = {
            "conv1": _convlayer_tree(sd, f"conv_body.{i}.conv1", False),
            "conv2": _convlayer_tree(sd, f"conv_body.{i}.conv2", True),
            "skip": _convlayer_tree(sd, f"conv_body.{i}.skip", True),
        }
    params["final_conv"] = _convlayer_tree(sd, "final_conv", False)
    params["final_linear_0"] = _eql(sd, "final_linear.0")
    params["final_linear_1"] = _eql(sd, "final_linear.1")
    return params


def convert_bsrgan_rrdbnet(sd: dict) -> dict:
    """Reference BSRGANRRDBNet / RRDBBebyGANNet keys (bsrgan_arch.py:74-103,
    rrdbbebygan_arch.py:55-80: conv_first / RRDB_trunk.{i}.RDB{j}.conv{k} /
    trunk_conv / upconv1-2 / HRconv / conv_last) -> our net/body_{i} tree."""
    net: dict = {}
    for name in ("conv_first", "trunk_conv", "upconv1", "upconv2", "HRconv",
                 "conv_last"):
        if f"{name}.weight" in sd:
            net[name] = _convp(sd, name)
    pat = re.compile(r"RRDB_trunk\.(\d+)\.RDB(\d)\.conv(\d)\.weight")
    for k in sd:
        if (m := pat.match(k)):
            i, j, kk = int(m.group(1)), int(m.group(2)), int(m.group(3))
            net.setdefault(f"body_{i}", {}) \
               .setdefault(f"ResidualDenseBlock_{j - 1}", {})[f"Conv3x3_{kk - 1}"] = {
                "Conv_0": _convp(sd, f"RRDB_trunk.{i}.RDB{j}.conv{kk}")}
    return {"net": net}


def convert_ranksrgan_g(sd: dict) -> dict:
    """Reference RankSRGANSRResNet keys (ranksrgan_arch.py:55-107:
    conv_first / recon_trunk.{i}.conv1-2 / LRconv / upconv1-2 / HRconv /
    conv_last) -> our trunk_{i}/Conv3x3_{j}/Conv_0 tree."""
    params: dict = {}
    for name in ("conv_first", "LRconv", "upconv1", "upconv2", "HRconv",
                 "conv_last"):
        if f"{name}.weight" in sd:
            params[name] = _convp(sd, name)
    pat = re.compile(r"recon_trunk\.(\d+)\.conv(\d)\.weight")
    for k in sd:
        if (m := pat.match(k)):
            i, j = int(m.group(1)), int(m.group(2))
            params.setdefault(f"trunk_{i}", {})[f"Conv3x3_{j - 1}"] = {
                "Conv_0": _convp(sd, f"recon_trunk.{i}.conv{j}")}
    return params


def convert_rrdbps(sd: dict) -> dict:
    """Reference RRDBPSNet keys (rrdbnet_arch.py:144-195): like RRDBNet but
    with a pixel-shuffle Upsample tail (upsample.{0,2})."""
    params: dict = {}
    for name in ("conv_first", "conv_body", "conv_hr", "conv_last"):
        params[name] = _convp(sd, name)
    pat = re.compile(r"body\.(\d+)\.rdb(\d)\.conv(\d)\.weight")
    for k in sd:
        if (m := pat.match(k)):
            i, j, kk = int(m.group(1)), int(m.group(2)), int(m.group(3))
            params.setdefault(f"body_{i}", {}) \
                  .setdefault(f"ResidualDenseBlock_{j - 1}", {})[f"Conv3x3_{kk - 1}"] = {
                "Conv_0": _convp(sd, f"body.{i}.rdb{j}.conv{kk}")}
    params["upsample"] = _upsample_tree(sd)
    return params


_MOD_FE = [(0, "fe_conv0", None), (2, "fe_conv1", 3), (5, "fe_conv2", 6),
           (8, "fe_conv3", 9), (11, "fe_conv4", 12), (14, "fe_conv5", 15),
           (17, "fe_conv6", 18)]


def convert_mod(sd: dict) -> dict:
    """Reference MOD keys (discriminator_arch.py:39-110: FE Sequential,
    w_gating1, shared classifier, orthonet CodeReduction) -> ours.  The
    duplicated classifiers.{i}.* entries alias the shared module (skipped)."""
    params: dict = {}
    for ci, name, bi in _MOD_FE:
        params[name] = _convp(sd, f"FE.{ci}")
        if bi is not None:
            params[f"fe_bn{_MOD_FE.index((ci, name, bi))}"] = {
                "scale": _to_np(sd[f"FE.{bi}.weight"]),
                "bias": _to_np(sd[f"FE.{bi}.bias"])}
    params["w_gating1"] = _to_np(sd["w_gating1"])
    params["cls_fc1"] = _dense(sd, "classifier.0")
    params["cls_fc2"] = _dense(sd, "classifier.2")
    params["cr_body"] = _dense(sd, "orthonet.body.0")
    params["cr_weight"] = _to_np(sd["orthonet.trans.weight"])
    return params


def mod_batch_stats(sd: dict, ref_batch_stats: dict) -> dict:
    stats: dict = {}
    for ci, name, bi in _MOD_FE:
        if bi is not None:
            stats[f"fe_bn{_MOD_FE.index((ci, name, bi))}"] = {
                "mean": _to_np(sd[f"FE.{bi}.running_mean"]),
                "var": _to_np(sd[f"FE.{bi}.running_var"])}
    del ref_batch_stats
    return stats


def convert_deresnet(sd: dict) -> dict:
    """Reference DEResNet keys (degradat_arch.py:37-78) -> our flax tree."""
    params: dict = {}
    nd = 1 + max(int(m.group(1)) for k in sd
                 if (m := re.match(r"conv_first\.(\d+)\.weight", k)))
    for d in range(nd):
        params[f"conv_first_{d}"] = _convp(sd, f"conv_first.{d}")
        j = 0
        while True:
            base = f"body.{d}.{j}"
            if f"{base}.conv1.weight" in sd:
                params[f"body_{d}_{j}"] = {
                    f"Conv3x3_{kk - 1}": {"Conv_0": _convp(sd, f"{base}.conv{kk}")}
                    for kk in (1, 2)}
            elif f"{base}.weight" in sd:
                params[f"body_{d}_{j}"] = _convp(sd, base)
            else:
                break
            j += 1
        params[f"fc_{d}_0"] = _dense(sd, f"fc_degree.{d}.0")
        params[f"fc_{d}_1"] = _dense(sd, f"fc_degree.{d}.2")
    return params


def _spade_tree(sd: dict, pfx: str) -> dict:
    return {"mlp_shared": _convp(sd, f"{pfx}.mlp_shared.0"),
            "mlp_gamma": {"kernel": _conv_w(sd[f"{pfx}.mlp_gamma.weight"])},
            "mlp_beta": {"kernel": _conv_w(sd[f"{pfx}.mlp_beta.weight"])}}


def _spade_block_tree(sd: dict, pfx: str) -> dict:
    node: dict = {
        "norm_0": _spade_tree(sd, f"{pfx}.norm_0"),
        "norm_1": _spade_tree(sd, f"{pfx}.norm_1"),
        "conv_0": {"Conv_0": {"kernel": _conv_w(sd[f"{pfx}.conv_0.weight_orig"]),
                              "bias": _to_np(sd[f"{pfx}.conv_0.bias"])}},
        "conv_1": {"Conv_0": {"kernel": _conv_w(sd[f"{pfx}.conv_1.weight_orig"]),
                              "bias": _to_np(sd[f"{pfx}.conv_1.bias"])}},
    }
    if f"{pfx}.conv_s.weight_orig" in sd:
        node["conv_s"] = {"Conv_0": {"kernel": _conv_w(sd[f"{pfx}.conv_s.weight_orig"])}}
        node["norm_s"] = _spade_tree(sd, f"{pfx}.norm_s")
    return node


def _lip_tree(sd: dict, pfx: str, n_2xdown: int = 5) -> dict:
    node: dict = {"conv_in": {"kernel": _conv_w(sd[f"{pfx}.model.0.weight"])}}
    ti = 3
    for i in range(n_2xdown):
        node[f"block{i}_lip_conv"] = {
            "kernel": _conv_w(sd[f"{pfx}.model.{ti}.logit.0.weight"])}
        node[f"block{i}_lip_norm"] = {
            "scale": _to_np(sd[f"{pfx}.model.{ti}.logit.1.weight"]),
            "bias": _to_np(sd[f"{pfx}.model.{ti}.logit.1.bias"])}
        node[f"block{i}_conv"] = _convp(sd, f"{pfx}.model.{ti + 1}")
        ti += 4 if i < n_2xdown - 1 else 3
    return node


def _spade_body_tree(sd: dict) -> dict:
    body: dict = {"head_0": _spade_block_tree(sd, "head_0"),
                  "g_middle_0": _spade_block_tree(sd, "g_middle_0"),
                  "g_middle_1": _spade_block_tree(sd, "g_middle_1")}
    for i in range(4):
        if f"ups.{i}.conv_0.weight_orig" in sd:
            body[f"ups_{i}"] = _spade_block_tree(sd, f"ups.{i}")
        if f"to_rgbs.{i}.weight" in sd:
            body[f"to_rgbs_{i}"] = _convp(sd, f"to_rgbs.{i}")
    return body


def convert_hifacegan(sd: dict) -> dict:
    """Reference HiFaceGAN keys (hifacegan_arch.py:144-164) -> ours
    (the unused inherited `fc` conv is dropped)."""
    return {"lip_encoder": _lip_tree(sd, "lip_encoder"),
            "body": _spade_body_tree(sd)}


def convert_spade_generator(sd: dict) -> dict:
    return {"fc": _convp(sd, "fc"), "body": _spade_body_tree(sd)}


def convert_hifacegan_disc(sd: dict) -> dict:
    """Reference HiFaceGANDiscriminator keys (hifacegan_arch.py:188-249)."""
    params: dict = {}
    nd = 1 + max(int(m.group(1)) for k in sd
                 if (m := re.match(r"discriminator_(\d+)\.", k)))
    for i in range(nd):
        p = f"discriminator_{i}"
        sub: dict = {"model0_conv": _convp(sd, f"{p}.model0.0")}
        n = 1
        while f"{p}.model{n}.0.0.weight_orig" in sd:
            sub[f"model{n}_conv"] = {"Conv_0": {
                "kernel": _conv_w(sd[f"{p}.model{n}.0.0.weight_orig"])}}
            n += 1
        sub[f"model{n}_conv"] = _convp(sd, f"{p}.model{n}.0")
        params[p] = sub
    return params


def top_singular_pair(a: np.ndarray):
    """Exact top singular triplet (u, sigma, v) of a (rows, cols) matrix via
    the smaller Gram eigendecomposition.  Power iteration is NOT enough here:
    random conv kernels have near-degenerate leading singular values, so
    iterative estimates disagree across implementations in the 3rd decimal."""
    a = np.asarray(a, np.float64)
    if a.shape[0] <= a.shape[1]:
        w_, vecs = np.linalg.eigh(a @ a.T)
        u = vecs[:, -1]
        sigma = float(np.sqrt(max(w_[-1], 0.0)))
        v = a.T @ u / (sigma + 1e-12)
    else:
        w_, vecs = np.linalg.eigh(a.T @ a)
        v = vecs[:, -1]
        sigma = float(np.sqrt(max(w_[-1], 0.0)))
        u = a @ v / (sigma + 1e-12)
    return u.astype(np.float32), sigma, v.astype(np.float32)


def sn_stats_tree(sd: dict, ref_stats, to_torch_key):
    """Recursive version of sn_batch_stats_from_torch for nested SN convs:
    walks the reference batch_stats tree, and at each SpectralNorm_0 node
    sets (u, sigma) to the EXACT top singular pair of the torch
    `<to_torch_key(path)>.weight_orig` tensor (flax matrix convention:
    HWIO kernel reshaped (-1, out), u (1, out) = the right singular vector
    — an exact fixed point of flax's power-iteration step)."""
    def walk(node, path):
        if isinstance(node, dict) and "SpectralNorm_0" in node:
            tk = to_torch_key(path)
            w = sd.get(f"{tk}.weight_orig") if tk else None
            if w is None:
                return node
            # conv OIHW -> flax (HWI, O); torch Linear (out,in) -> flax (in,out)
            a = (_to_np(w).T if w.ndim == 2
                 else _conv_w(w).reshape(-1, w.shape[0]))
            _, sigma, v_right = top_singular_pair(a)
            inner = dict(node["SpectralNorm_0"])
            for k in inner:
                inner[k] = (np.float32(sigma) if k.endswith("sigma")
                            else v_right.reshape(1, -1))
            return {"SpectralNorm_0": inner}
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node
    return walk(ref_stats, ())


def hifacegan_sn_stats(sd: dict, ref_stats) -> dict:
    """SN stats for HiFaceGAN/SPADEGenerator: flax path body/<blk>/<conv>
    -> torch '<blk>.<conv>' (ups_{i} -> ups.{i})."""
    def to_key(path):
        parts = [p for p in path if p != "body"]
        parts = [re.sub(r"^(ups|to_rgbs)_(\d+)$", r"\1.\2", p) for p in parts]
        return ".".join(parts)
    return sn_stats_tree(sd, ref_stats, to_key)


def hifacegan_disc_sn_stats(sd: dict, ref_stats) -> dict:
    """flax discriminator_{i}/model{n}_conv -> torch
    discriminator_{i}.model{n}.0.0."""
    def to_key(path):
        parts = list(path)
        parts[-1] = re.sub(r"^model(\d+)_conv$", r"model\1.0.0", parts[-1])
        return ".".join(parts)
    return sn_stats_tree(sd, ref_stats, to_key)


def _sn_convp(sd: dict, base: str) -> dict:
    node: dict = {"kernel": _conv_w(sd[f"{base}.weight_orig"])}
    if f"{base}.bias" in sd:
        node["bias"] = _to_np(sd[f"{base}.bias"])
    return {"Conv_0": node}


def convert_dfdnet(sd: dict) -> dict:
    """Reference DFDNet keys (dfdnet_arch.py:67-103) -> our flax tree."""
    params: dict = {}
    vgg: dict = {}
    pat = re.compile(r"vgg_extractor\.vgg_net\.(conv\d_\d)\.weight")
    for k in sd:
        if (m := pat.match(k)):
            vgg[m.group(1)] = _convp(sd, k[:-len(".weight")])
    params["vgg_extractor"] = vgg
    for k in sd:
        if (m := re.match(r"attn_blocks\.(\w+)_(\d+)\.0\.weight_orig", k)):
            part, fs = m.group(1), m.group(2)
            params[f"attn_{part}_{fs}"] = {
                "conv0": _sn_convp(sd, f"attn_blocks.{part}_{fs}.0"),
                "conv1": _sn_convp(sd, f"attn_blocks.{part}_{fs}.2")}
    msd: dict = {"fusion": _sn_convp(sd, "multi_scale_dilation.conv_fusion")}
    for i in range(4):
        msd[f"block{i}_conv0"] = _sn_convp(sd, f"multi_scale_dilation.conv_blocks.{i}.0")
        msd[f"block{i}_conv1"] = _sn_convp(sd, f"multi_scale_dilation.conv_blocks.{i}.2")
    params["msd"] = msd
    for k in range(4):
        p = f"upsample{k}"
        params[p] = {
            "conv1": _sn_convp(sd, f"{p}.conv1.1"),
            "convup": _sn_convp(sd, f"{p}.convup.1"),
            "scale0": _sn_convp(sd, f"{p}.scale_block.0"),
            "scale1": _sn_convp(sd, f"{p}.scale_block.2"),
            "shift0": _sn_convp(sd, f"{p}.shift_block.0"),
            "shift1": _sn_convp(sd, f"{p}.shift_block.2"),
        }
    params["up4_conv0"] = _sn_convp(sd, "upsample4.0")
    for r in (0, 1):
        params[f"up4_res{r}_conv0"] = _convp(sd, f"upsample4.{r + 2}.body.0")
        params[f"up4_res{r}_conv1"] = _convp(sd, f"upsample4.{r + 2}.body.2")
    params["up4_last"] = _convp(sd, "upsample4.4")
    return params


def dfdnet_sn_stats(sd: dict, ref_stats) -> dict:
    def to_key(path):
        parts = list(path)
        if parts[0].startswith("attn_"):
            m = re.match(r"attn_(\w+)_(\d+)$", parts[0])
            idx = {"conv0": 0, "conv1": 2}[parts[1]]
            return f"attn_blocks.{m.group(1)}_{m.group(2)}.{idx}"
        if parts[0] == "msd":
            if parts[1] == "fusion":
                return "multi_scale_dilation.conv_fusion"
            m = re.match(r"block(\d)_conv(\d)$", parts[1])
            return f"multi_scale_dilation.conv_blocks.{m.group(1)}.{int(m.group(2)) * 2}"
        if parts[0].startswith("upsample"):
            name = parts[1]
            if name in ("conv1", "convup"):
                return f"{parts[0]}.{name}.1"
            m = re.match(r"(scale|shift)(\d)$", name)
            return f"{parts[0]}.{m.group(1)}_block.{int(m.group(2)) * 2}"
        if parts[0] == "up4_conv0":
            return "upsample4.0"
        return None
    return sn_stats_tree(sd, ref_stats, to_key)


def _spsr_conv(sd: dict, base: str) -> dict:
    """conv_block keys: '<base>.0.weight' when an activation kept it a
    Sequential, bare '<base>.weight' when flattened to the Conv itself."""
    key = f"{base}.0.weight" if f"{base}.0.weight" in sd else f"{base}.weight"
    node = {"kernel": _conv_w(sd[key])}
    bkey = key[:-len("weight")] + "bias"
    if bkey in sd:
        node["bias"] = _to_np(sd[bkey])
    return node


def _spsr_rrdb(sd: dict, pfx: str) -> dict:
    """Old-style RRDB keys (spsr_arch.py:172-259: RDB{1-3}.conv{1-5}) ->
    our RRDB tree (ResidualDenseBlock_{j}/Conv3x3_{k}/Conv_0)."""
    out: dict = {}
    for j in (1, 2, 3):
        blk = {}
        for k in (1, 2, 3, 4, 5):
            blk[f"Conv3x3_{k-1}"] = {"Conv_0": _spsr_conv(sd, f"{pfx}.RDB{j}.conv{k}")}
        out[f"ResidualDenseBlock_{j-1}"] = blk
    return out


def convert_spsr(sd: dict) -> dict:
    """Reference SPSRNet keys (spsr_arch.py:290-438) -> our flax tree.

    torch layout (flattened `sequential`): model.0 = fea_conv,
    model.1.sub.{0..nb-1} = RRDB trunk, model.1.sub.{nb} = LR_conv,
    model.{>=2} convs = upsampler convs then HR_conv0 (HR_conv0_new.0 is a
    duplicate alias of the last one), HR_conv1_new = HR_conv1; gradient branch
    b_* / b_module.{idx}; fusion f_*.  Fixed Sobel buffers
    (get_g_nopadding.weight_h/v) are recomputed, not loaded."""
    params: dict = {"fea_conv": _spsr_conv(sd, "model.0")}
    idxs = sorted({int(m.group(1)) for k in sd
                   if (m := re.match(r"model\.1\.sub\.(\d+)\.RDB", k))})
    for i in idxs:
        params[f"rb_{i}"] = _spsr_rrdb(sd, f"model.1.sub.{i}")
    params["LR_conv"] = _spsr_conv(sd, f"model.1.sub.{max(idxs) + 1}")
    ups = sorted({int(m.group(1)) for k in sd
                  if (m := re.match(r"model\.(\d+)\.weight", k)) and int(m.group(1)) >= 2})
    for u, n in enumerate(ups[:-1]):
        params[f"up_{u}"] = {"Conv_0": _spsr_conv(sd, f"model.{n}")}
    params["HR_conv0"] = _spsr_conv(sd, f"model.{ups[-1]}")
    params["HR_conv1"] = _spsr_conv(sd, "HR_conv1_new")
    params["b_fea_conv"] = _spsr_conv(sd, "b_fea_conv")
    for k in (1, 2, 3, 4):
        params[f"b_block_{k}"] = _spsr_rrdb(sd, f"b_block_{k}")
        params[f"b_concat_{k}"] = _spsr_conv(sd, f"b_concat_{k}")
    params["b_LR_conv"] = _spsr_conv(sd, "b_LR_conv")
    bups = sorted({int(m.group(1)) for k in sd
                   if (m := re.match(r"b_module\.(\d+)\.weight", k))})
    for u, n in enumerate(bups[:-2]):
        params[f"b_up_{u}"] = {"Conv_0": _spsr_conv(sd, f"b_module.{n}")}
    params["b_HR_conv0"] = _spsr_conv(sd, f"b_module.{bups[-2]}")
    params["b_HR_conv1"] = _spsr_conv(sd, f"b_module.{bups[-1]}")
    for name in ("conv_w", "f_concat", "f_HR_conv0", "f_HR_conv1"):
        params[name] = _spsr_conv(sd, name)
    params["f_block"] = _spsr_rrdb(sd, "f_block")
    return params


def convert_elan(sd: dict) -> dict:
    """Reference ELAN keys (elan_arch.py:237-320) -> our flax tree.

    torch: head.0 / tail.0 convs; body.{i}.modules_lfe.lfe_{j}.conv{0,1}
    .shift_conv.conv1x1 (ShiftConv2d1 'fast-training-speed': a FIXED grouped
    shift kernel — skipped, ours shifts via jnp.roll — then a learned 1x1);
    body.{i}.modules_gmsa.gmsa_{j}.project_inp.0 (1x1) + .1.norm (LayerNorm)
    + project_out."""
    params: dict = {"head": _convp(sd, "head.0"), "tail": _convp(sd, "tail.0")}
    for k in sd:
        m = re.match(r"body\.(\d+)\.modules_lfe\.lfe_(\d+)\.conv(\d)"
                     r"\.shift_conv\.conv1x1\.weight", k)
        if m:
            i, j, c = m.group(1), m.group(2), int(m.group(3))
            base = k[:-len(".weight")]
            params.setdefault(f"body_{i}", {}).setdefault(f"lfe_{j}", {})[
                f"ShiftConv_{c}"] = {"Conv_0": _convp(sd, base)}
        m = re.match(r"body\.(\d+)\.modules_gmsa\.(gmsa_\d+)\.project_out\.weight", k)
        if m:
            i, g = m.group(1), m.group(2)
            pfx = f"body.{i}.modules_gmsa.{g}"
            params.setdefault(f"body_{i}", {})[g] = {
                "Conv_0": _convp(sd, f"{pfx}.project_inp.0"),
                "LayerNorm_0": _ln(sd, f"{pfx}.project_inp.1.norm"),
                "Conv_1": _convp(sd, f"{pfx}.project_out"),
            }
    return params


def convert_ldm_vae(sd: dict) -> dict:
    """Stable-Diffusion / ldm AutoencoderKL keys -> our diffusion/vae.py tree.

    Accepts either a bare VAE state dict or a full SD checkpoint (keys under
    'first_stage_model.').  torch layout: encoder|decoder .conv_in/.conv_out/
    .norm_out, .down|.up .{i}.block.{j}.(norm1|conv1|norm2|conv2|nin_shortcut),
    .{i}.(downsample|upsample).conv, .mid.block_1/attn_1/block_2, plus
    quant_conv/post_quant_conv (reference ldm/models/autoencoder.py:291).
    ldm's decoder ModuleList is insert(0)-built so up.{i}=0 is the finest
    level, matching our up_{i} naming.  The CFW Decoder_Mix fusion layers
    (decoder.fusion_layer_{i}.encode_enc_{1,3} VAE ResBlocks with a conv_out
    skip + encode_enc_2.{k} RRDB trunk, model.py:822) map to our
    fusion_layer_{i} modules; absent from plain-SD checkpoints, they stay
    at init when merged with merge_into_tree."""
    if any(k.startswith("first_stage_model.") for k in sd):
        sd = {k[len("first_stage_model."):]: v for k, v in sd.items()
              if k.startswith("first_stage_model.")}

    def resblk(pfx):
        node = {"GroupNorm_0": _ln(sd, f"{pfx}.norm1"),
                "Conv_0": _convp(sd, f"{pfx}.conv1"),
                "GroupNorm_1": _ln(sd, f"{pfx}.norm2"),
                "Conv_1": _convp(sd, f"{pfx}.conv2")}
        if f"{pfx}.nin_shortcut.weight" in sd:
            node["Conv_2"] = _convp(sd, f"{pfx}.nin_shortcut")
        return node

    def attn(pfx):
        return {"GroupNorm_0": _ln(sd, f"{pfx}.norm"),
                **{n: _convp(sd, f"{pfx}.{n}") for n in ("q", "k", "v", "proj_out")}}

    def coder(name, direction):
        out = {"conv_in": _convp(sd, f"{name}.conv_in"),
               "conv_out": _convp(sd, f"{name}.conv_out"),
               "norm_out": _ln(sd, f"{name}.norm_out"),
               "mid_block_1": resblk(f"{name}.mid.block_1"),
               "mid_attn": attn(f"{name}.mid.attn_1"),
               "mid_block_2": resblk(f"{name}.mid.block_2")}
        pat = re.compile(rf"{name}\.{direction}\.(\d+)\.block\.(\d+)\.conv1\.weight")
        for k in sd:
            m = pat.match(k)
            if m:
                i, j = m.group(1), m.group(2)
                out[f"{direction}_{i}_block_{j}"] = resblk(f"{name}.{direction}.{i}.block.{j}")
            m = re.match(rf"{name}\.{direction}\.(\d+)\.(downsample|upsample)\.conv\.weight", k)
            if m:
                out[f"{direction}_{m.group(1)}_{m.group(2)}"] = _convp(
                    sd, f"{name}.{direction}.{m.group(1)}.{m.group(2)}.conv")
        # CFW Decoder_Mix fusion layers (model.py ResBlock skip is 'conv_out')
        def fuse_resblk(pfx):
            node = {"GroupNorm_0": _ln(sd, f"{pfx}.norm1"),
                    "Conv_0": _convp(sd, f"{pfx}.conv1"),
                    "GroupNorm_1": _ln(sd, f"{pfx}.norm2"),
                    "Conv_1": _convp(sd, f"{pfx}.conv2")}
            if f"{pfx}.conv_out.weight" in sd:
                node["Conv_2"] = _convp(sd, f"{pfx}.conv_out")
            return node

        fpat = re.compile(
            rf"{name}\.fusion_layer_(\d+)\.encode_enc_2\.(\d+)\.rdb(\d)\.conv(\d)\.weight")
        for k in sorted(sd):
            m = fpat.match(k)
            if not m:
                continue
            i, blk, r, c = m.groups()
            node = out.setdefault(f"fusion_layer_{i}", {
                "encode_enc_1": fuse_resblk(f"{name}.fusion_layer_{i}.encode_enc_1"),
                "encode_enc_3": fuse_resblk(f"{name}.fusion_layer_{i}.encode_enc_3"),
            })
            node.setdefault(f"encode_enc_2_{blk}", {}) \
                .setdefault(f"ResidualDenseBlock_{int(r) - 1}", {}) \
                [f"Conv3x3_{int(c) - 1}"] = {"Conv_0": _convp(
                    sd, f"{name}.fusion_layer_{i}.encode_enc_2.{blk}.rdb{r}.conv{c}")}
        return out

    return {"encoder": coder("encoder", "down"),
            "decoder": coder("decoder", "up"),
            "quant_conv": _convp(sd, "quant_conv"),
            "post_quant_conv": _convp(sd, "post_quant_conv")}


def merge_into_tree(ref_tree, converted: dict):
    """Overlay converted leaves onto an initialized reference tree, keeping
    reference leaves with no counterpart (e.g. CFW fuse convs absent from SD
    checkpoints).  Shape mismatches raise."""
    if not isinstance(ref_tree, dict):
        if np.shape(ref_tree) != np.shape(converted):
            raise ValueError(f"shape mismatch {np.shape(ref_tree)} vs {np.shape(converted)}")
        return converted
    out = dict(ref_tree)
    for k, v in converted.items():
        if k in out:
            out[k] = merge_into_tree(out[k], v)
        else:
            out[k] = v
    return out


def _sd_openai_unet_tree(sd: dict, prefix: str = "") -> dict:
    """Generic openaimodel torch-key -> flax-tree translator.

    Our diffusion UNets (diffusion/unet.py) name every flax submodule after
    its torch path, so translation is mechanical: the top module groups the
    first 2-3 path segments (``input_blocks.3.0`` / ``middle_block.1`` /
    ``time_embed.0`` / ``out.0`` / ``fea_tran.2``), everything below joins
    with underscores, and leaves map by tensor rank (4D conv -> HWIO kernel,
    3D conv1d -> dense kernel, 2D linear -> transposed kernel, 1D norm weight
    -> scale).  Reference layout: openaimodel.py:958-1340 (UNetModelDualcondV2)
    and :1341-1541 (EncoderUNetModelWT)."""
    params: dict = {}
    for key, v in sd.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        parts = key.split(".")
        pname = parts[-1]
        if pname not in ("weight", "bias"):
            continue  # buffers (attn masks etc.) are recomputed
        if parts[0] in ("input_blocks", "output_blocks"):
            top, rest = "_".join(parts[:3]), parts[3:-1]
        elif parts[0] in ("middle_block", "time_embed", "out", "fea_tran"):
            top, rest = "_".join(parts[:2]), parts[2:-1]
        else:
            continue
        inner = "_".join(rest)
        arr = _to_np(v)
        if pname == "weight":
            if arr.ndim == 4:
                leaf_name, leaf = "kernel", _conv_w(v)
            elif arr.ndim == 3:          # conv1d (qkv/proj_out) -> dense
                leaf_name, leaf = "kernel", arr[..., 0].T
            elif arr.ndim == 2:          # linear -> dense
                leaf_name, leaf = "kernel", arr.T
            else:                        # GroupNorm/LayerNorm weight
                leaf_name, leaf = "scale", arr
        else:
            leaf_name, leaf = "bias", arr
        node = params.setdefault(top, {})
        tgt = node.setdefault(inner, {}) if inner else node
        tgt[leaf_name] = leaf
    return params


def convert_sd_unet(sd: dict) -> dict:
    """StableSR/SD UNetModelDualcondV2 checkpoint -> our UNet flax tree.

    Accepts either a full ckpt 'state_dict' (keys under
    ``model.diffusion_model.``) or a bare UNet state dict."""
    prefix = "model.diffusion_model." if any(
        k.startswith("model.diffusion_model.") for k in sd) else ""
    return _sd_openai_unet_tree(sd, prefix)


def convert_sd_structcond(sd: dict) -> dict:
    """StableSR EncoderUNetModelWT (struct-cond encoder) -> flax tree.
    Full checkpoints carry it under ``structcond_stage_model.``."""
    prefix = "structcond_stage_model." if any(
        k.startswith("structcond_stage_model.") for k in sd) else ""
    return _sd_openai_unet_tree(sd, prefix)


def convert_old_rrdbnet(sd: dict) -> dict:
    """KAIR / old-ESRGAN 'model.*' flattened-sequential RRDBNet layout
    (reference train_BSGRAN models, bsrgan_arch-style: model.0 fea conv,
    model.1.sub.{i} RRDBs, model.1.sub.{nb} trunk conv, then upsample convs,
    HRconv, conv_last) -> our BSRGANRRDBNet/RRDBBebyGANNet tree (everything
    nested under the shared 'net' trunk module)."""
    inner: dict = {"conv_first": _spsr_conv(sd, "model.0")}
    idxs = sorted({int(m.group(1)) for k in sd
                   if (m := re.match(r"model\.1\.sub\.(\d+)\.RDB", k))})
    for i in idxs:
        inner[f"body_{i}"] = _spsr_rrdb(sd, f"model.1.sub.{i}")
    inner["trunk_conv"] = _spsr_conv(sd, f"model.1.sub.{max(idxs) + 1}")
    ups = sorted({int(m.group(1)) for k in sd
                  if (m := re.match(r"model\.(\d+)\.weight", k)) and int(m.group(1)) >= 2})
    names = ["upconv1", "upconv2"][: len(ups) - 2] + ["HRconv", "conv_last"]
    for name, n in zip(names, ups):
        inner[name] = _spsr_conv(sd, f"model.{n}")
    return {"net": inner}


def convert_unet_disc_sn(sd: dict) -> dict:
    """Reference UNetDiscriminatorSN keys (discriminator_arch.py:342-354) ->
    our flax tree.  torch spectral_norm stores the UNNORMALIZED weight as
    `convN.weight_orig` (+ power-iteration buffers weight_u/weight_v); flax
    nn.SpectralNorm likewise keeps the raw kernel in params and normalizes at
    apply time, so weight_orig maps directly to the kernel.  The u/sigma
    batch_stats re-warm in a few forward passes (singular values are invariant
    to the OIHW->HWIO flattening permutation/transpose)."""
    params: dict = {}
    n = 0
    while f"conv{n}.weight" in sd or f"conv{n}.weight_orig" in sd:
        if f"conv{n}.weight_orig" in sd:  # spectral-normalized conv
            node: dict = {"kernel": _conv_w(sd[f"conv{n}.weight_orig"])}
            if f"conv{n}.bias" in sd:
                node["bias"] = _to_np(sd[f"conv{n}.bias"])
            params[f"conv{n}"] = {"Conv_0": node}
        else:
            params[f"conv{n}"] = _convp(sd, f"conv{n}")
        n += 1
    return params


def convert_vgg_style_disc(sd: dict) -> dict:
    """Reference VGGStyleDiscriminator keys (discriminator_arch.py:113-191) ->
    our flax params tree (auto-named Conv_N/BatchNorm_N/Dense_N modules).

    linear1 needs a flatten-order fixup: torch flattens NCHW (c-major), we
    flatten NHWC (spatial-major), so its weight is permuted per-block before
    the Linear transpose.  BN running stats go via vgg_disc_batch_stats."""
    params: dict = {"Conv_0": _convp(sd, "conv0_0")}
    conv_n, bn_n = 1, 0
    names = ["conv0_1"]
    for k in range(1, 6):
        if f"conv{k}_0.weight" in sd:
            names += [f"conv{k}_0", f"conv{k}_1"]
    for name in names:
        params[f"Conv_{conv_n}"] = {"kernel": _conv_w(sd[f"{name}.weight"])}
        bn = name.replace("conv", "bn")
        params[f"BatchNorm_{bn_n}"] = {"scale": _to_np(sd[f"{bn}.weight"]),
                                       "bias": _to_np(sd[f"{bn}.bias"])}
        conv_n += 1
        bn_n += 1
    w1 = _to_np(sd["linear1.weight"])  # (100, c*s*s) in torch [c][h][w] order
    c = sd[names[-1] + ".weight"].shape[0]
    s = int(round((w1.shape[1] // c) ** 0.5))
    w1 = w1.reshape(w1.shape[0], c, s, s).transpose(0, 2, 3, 1).reshape(w1.shape[0], -1)
    params["Dense_0"] = {"kernel": w1.T, "bias": _to_np(sd["linear1.bias"])}
    params["Dense_1"] = _dense(sd, "linear2")
    return params


def convert_sn_vgg192_disc(sd: dict) -> dict:
    """Reference DiscriminatorSN_VGG_192 keys (discriminator_arch.py:258-323:
    conv0_0 plain + 11 spectral-norm convs + linear1/2) -> our flax tree
    (Conv_0 + _SNConv_{i}/Conv_0 + Dense_{0,1}), with the same NCHW->NHWC
    linear1 flatten fixup as convert_vgg_style_disc."""
    params: dict = {"Conv_0": _convp(sd, "conv0_0")}
    names = ["conv0_1"]
    for k in range(1, 6):
        names += [f"conv{k}_0", f"conv{k}_1"]
    for i, name in enumerate(names):
        params[f"_SNConv_{i}"] = {"Conv_0": {"kernel": _conv_w(sd[f"{name}.weight_orig"])}}
    w1 = _to_np(sd["linear1.weight"])
    c = sd[names[-1] + ".weight_orig"].shape[0]
    s = int(round((w1.shape[1] // c) ** 0.5))
    w1 = w1.reshape(w1.shape[0], c, s, s).transpose(0, 2, 3, 1).reshape(w1.shape[0], -1)
    params["Dense_0"] = {"kernel": w1.T, "bias": _to_np(sd["linear1.bias"])}
    params["Dense_1"] = _dense(sd, "linear2")
    return params


def sn_vgg192_stats(sd: dict, ref_stats) -> dict:
    """SN stats for DiscriminatorSN_VGG_192: flax _SNConv_{i} -> torch
    conv{k}_{j} in construction order."""
    names = ["conv0_1"]
    for k in range(1, 6):
        names += [f"conv{k}_0", f"conv{k}_1"]

    def to_key(path):
        m = re.match(r"_SNConv_(\d+)$", path[-1])
        return names[int(m.group(1))] if m else None
    return sn_stats_tree(sd, ref_stats, to_key)


def convert_ranker(sd: dict) -> dict:
    """Reference Ranker_VGG12_296 keys (ranksrgan_arch.py:168-227) -> our
    name-mirrored flax tree.  classifier.0/.2 -> linear1/linear2; the global
    average pool means no flatten-order fixup is needed."""
    params: dict = {}
    for k in sd:
        m = re.match(r"(conv\d_\d)\.weight", k)
        if m:
            params[m.group(1)] = _convp(sd, m.group(1))
        m = re.match(r"(bn\d_\d)\.weight", k)
        if m:
            params[m.group(1)] = {"scale": _to_np(sd[f"{m.group(1)}.weight"]),
                                  "bias": _to_np(sd[f"{m.group(1)}.bias"])}
    params["linear1"] = _dense(sd, "classifier.0")
    params["linear2"] = _dense(sd, "classifier.2")
    return params


def ranker_batch_stats(sd: dict, ref_batch_stats: dict) -> dict:
    """BN running stats for the Ranker (same key names both sides)."""
    out = dict(ref_batch_stats)
    for name in list(out):
        if f"{name}.running_mean" in sd:
            out[name] = {"mean": _to_np(sd[f"{name}.running_mean"]),
                         "var": _to_np(sd[f"{name}.running_var"])}
    return out


def convert_vgg296_disc(sd: dict) -> dict:
    """Reference Discriminator_VGG_296 keys (ranksrgan_arch.py:108-165) ->
    our tree (_VGGDownStack_0 with auto-named Conv_N/BatchNorm_N + Dense head,
    same NCHW/NHWC flatten fixup as VGGStyleDiscriminator)."""
    inner: dict = {"Conv_0": _convp(sd, "conv0_0")}
    conv_n, bn_n = 1, 0
    names = ["conv0_1"]
    for k in range(1, 6):
        if f"conv{k}_0.weight" in sd:
            names += [f"conv{k}_0", f"conv{k}_1"]
    for name in names:
        inner[f"Conv_{conv_n}"] = {"kernel": _conv_w(sd[f"{name}.weight"])}
        bn = name.replace("conv", "bn")
        inner[f"BatchNorm_{bn_n}"] = {"scale": _to_np(sd[f"{bn}.weight"]),
                                      "bias": _to_np(sd[f"{bn}.bias"])}
        conv_n += 1
        bn_n += 1
    w1 = _to_np(sd["linear1.weight"])
    c = sd[names[-1] + ".weight"].shape[0]
    s = int(round((w1.shape[1] // c) ** 0.5))
    w1 = w1.reshape(w1.shape[0], c, s, s).transpose(0, 2, 3, 1).reshape(w1.shape[0], -1)
    return {"_VGGDownStack_0": inner,
            "Dense_0": {"kernel": w1.T, "bias": _to_np(sd["linear1.bias"])},
            "Dense_1": _dense(sd, "linear2")}


def vgg296_disc_batch_stats(sd: dict, ref_batch_stats: dict) -> dict:
    names = ["bn0_1"]
    for k in range(1, 6):
        if f"bn{k}_0.weight" in sd:
            names += [f"bn{k}_0", f"bn{k}_1"]
    inner = dict(ref_batch_stats.get("_VGGDownStack_0", {}))
    for n, name in enumerate(names):
        inner[f"BatchNorm_{n}"] = {"mean": _to_np(sd[f"{name}.running_mean"]),
                                   "var": _to_np(sd[f"{name}.running_var"])}
    out = dict(ref_batch_stats)
    out["_VGGDownStack_0"] = inner
    return out


def vgg_disc_batch_stats(sd: dict, ref_batch_stats: dict) -> dict:
    """BN running stats for VGGStyleDiscriminator: torch running_mean/var ->
    flax BatchNorm_N mean/var, in the same ordering as convert_vgg_style_disc."""
    names = ["bn0_1"]
    for k in range(1, 6):
        if f"bn{k}_0.weight" in sd:
            names += [f"bn{k}_0", f"bn{k}_1"]
    out = dict(ref_batch_stats)
    for n, name in enumerate(names):
        out[f"BatchNorm_{n}"] = {"mean": _to_np(sd[f"{name}.running_mean"]),
                                 "var": _to_np(sd[f"{name}.running_var"])}
    return out


def sn_batch_stats_from_torch(sd: dict, ref_batch_stats: dict) -> dict:
    """Recompute flax SpectralNorm (u, sigma) batch_stats from a torch
    state dict's weight_orig tensors via numpy power iteration, shaped to
    flax's convention (matrix = HWIO kernel reshaped (-1, out), u: (1, out))."""
    out: dict = {}
    for name, node in ref_batch_stats.items():
        w = sd.get(f"{name}.weight_orig")
        if w is None or not isinstance(node, dict):
            out[name] = node
            continue
        a = _conv_w(w).reshape(-1, w.shape[0])  # (h*w*in, out)
        _, sigma, v_right = top_singular_pair(a)
        inner = dict(node["SpectralNorm_0"])
        for k in inner:
            inner[k] = (np.float32(sigma) if k.endswith("sigma")
                        else v_right.reshape(1, -1))
        out[name] = {"SpectralNorm_0": inner}
    return out


def export_msrresnet_to_torch(params: dict, path: str, param_key: str = "params",
                              also_ema: dict | None = None) -> None:
    """Inverse port: our MSRResNet tree -> reference srresnet_arch.py layout."""
    import torch

    def _t(a):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(a)))

    def tree_to_sd(tree):
        sd = {}
        for name in ("conv_first", "upconv1", "upconv2", "conv_hr", "conv_last"):
            if name in tree:
                sd[f"{name}.weight"] = _t(np.asarray(tree[name]["kernel"]).transpose(3, 2, 0, 1))
                sd[f"{name}.bias"] = _t(tree[name]["bias"])
        i = 0
        while f"body_{i}" in tree:
            for j in (1, 2):
                node = tree[f"body_{i}"][f"Conv3x3_{j-1}"]["Conv_0"]
                sd[f"body.{i}.conv{j}.weight"] = _t(np.asarray(node["kernel"]).transpose(3, 2, 0, 1))
                sd[f"body.{i}.conv{j}.bias"] = _t(node["bias"])
            i += 1
        return sd

    payload = {param_key: tree_to_sd(params)}
    if also_ema is not None:
        payload["params_ema"] = tree_to_sd(also_ema)
    torch.save(payload, path)


def export_srvgg_to_torch(params: dict, path: str, param_key: str = "params",
                          also_ema: dict | None = None) -> None:
    """Inverse port: our SRVGGNetCompact tree -> reference srvgg_arch.py
    body.{k} layout (alternating conv / per-channel PReLU)."""
    import torch

    def _t(a):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(a)))

    def tree_to_sd(tree):
        sd = {"body.0.weight": _t(np.asarray(tree["conv_first"]["kernel"]).transpose(3, 2, 0, 1)),
              "body.0.bias": _t(tree["conv_first"]["bias"])}
        if "act_first" in tree:
            sd["body.1.weight"] = _t(tree["act_first"]["alpha"])
        i = 0
        while f"conv_{i}" in tree:
            sd[f"body.{2*i+2}.weight"] = _t(np.asarray(tree[f"conv_{i}"]["kernel"]).transpose(3, 2, 0, 1))
            sd[f"body.{2*i+2}.bias"] = _t(tree[f"conv_{i}"]["bias"])
            if f"act_{i}" in tree:
                sd[f"body.{2*i+3}.weight"] = _t(tree[f"act_{i}"]["alpha"])
            i += 1
        last = 2 * i + 2
        sd[f"body.{last}.weight"] = _t(np.asarray(tree["conv_last"]["kernel"]).transpose(3, 2, 0, 1))
        sd[f"body.{last}.bias"] = _t(tree["conv_last"]["bias"])
        return sd

    payload = {param_key: tree_to_sd(params)}
    if also_ema is not None:
        payload["params_ema"] = tree_to_sd(also_ema)
    torch.save(payload, path)


def convert_clip_rn50(sd: dict):
    """OpenAI-CLIP layout (visual ModifiedResNet + text transformer) -> our
    archs/clip_arch.py trees.  Returns (visual_params, visual_batch_stats,
    text_params).  Reference: the GAN tree's vendored clip/model.py consumed
    by clipiqa (scripts/metrics/clipiqa_pyiqa/)."""
    vis: dict = {}
    vstats: dict = {}

    def put_bn(dst_p, dst_s, name, base):
        dst_p[name] = {"scale": _to_np(sd[f"{base}.weight"]),
                       "bias": _to_np(sd[f"{base}.bias"])}
        dst_s[name] = {"mean": _to_np(sd[f"{base}.running_mean"]),
                       "var": _to_np(sd[f"{base}.running_var"])}

    for n in (1, 2, 3):
        vis[f"conv{n}"] = {"kernel": _conv_w(sd[f"visual.conv{n}.weight"])}
        put_bn(vis, vstats, f"bn{n}", f"visual.bn{n}")
    pat = re.compile(r"visual\.layer(\d)\.(\d+)\.conv1\.weight")
    for k in sd:
        m = pat.match(k)
        if not m:
            continue
        li, j = m.group(1), m.group(2)
        base = f"visual.layer{li}.{j}"
        name = f"layer{li}_{j}"
        node: dict = {}
        nstat: dict = {}
        for c in (1, 2, 3):
            node[f"conv{c}"] = {"kernel": _conv_w(sd[f"{base}.conv{c}.weight"])}
            put_bn(node, nstat, f"bn{c}", f"{base}.bn{c}")
        if f"{base}.downsample.0.weight" in sd:
            node["downsample_conv"] = {"kernel": _conv_w(sd[f"{base}.downsample.0.weight"])}
            put_bn(node, nstat, "downsample_bn", f"{base}.downsample.1")
        vis[name] = node
        vstats[name] = nstat
    ap = "visual.attnpool"
    vis["attnpool"] = {
        "positional_embedding": _to_np(sd[f"{ap}.positional_embedding"]),
        **{n: _dense(sd, f"{ap}.{n}") for n in ("q_proj", "k_proj", "v_proj", "c_proj")},
    }

    text = _clip_text_tree(sd)
    return vis, vstats, text


def _clip_text_tree(sd: dict, p: str = "") -> dict:
    """Text-transformer subtree shared by OpenAI CLIP and OpenCLIP layouts
    (token_embedding / positional_embedding / transformer.resblocks.N /
    ln_final / text_projection under prefix ``p``)."""
    text: dict = {"token_embedding": {"embedding": _to_np(sd[f"{p}token_embedding.weight"])},
                  "positional_embedding": _to_np(sd[f"{p}positional_embedding"]),
                  "ln_final": _ln(sd, f"{p}ln_final"),
                  "text_projection": _to_np(sd[f"{p}text_projection"])}
    i = 0
    while f"{p}transformer.resblocks.{i}.ln_1.weight" in sd:
        base = f"{p}transformer.resblocks.{i}"
        text[f"resblock_{i}"] = {
            "ln_1": _ln(sd, f"{base}.ln_1"),
            "in_proj": {"kernel": _to_np(sd[f"{base}.attn.in_proj_weight"]).T,
                        "bias": _to_np(sd[f"{base}.attn.in_proj_bias"])},
            "out_proj": _dense(sd, f"{base}.attn.out_proj"),
            "ln_2": _ln(sd, f"{base}.ln_2"),
            "c_fc": _dense(sd, f"{base}.mlp.c_fc"),
            "c_proj": _dense(sd, f"{base}.mlp.c_proj"),
        }
        i += 1
    return text


def convert_openclip_text(sd: dict):
    """OpenCLIP text tower (the reference's actual embedder:
    FrozenOpenCLIPEmbedder ViT-H-14, Diffusion-Based-SR/ldm/modules/encoders/
    modules.py:140-162) -> our CLIPTextEncoder tree.

    Accepts three layouts: a bare ``open_clip_pytorch_model.bin``
    (text keys at top level, ``visual.*`` alongside), the text tower under
    ``model.`` (some open_clip text-only exports), or a full SD 2.x /
    StableSR checkpoint (``cond_stage_model.model.*``).  Returns
    (text_params, meta) with meta = {width, layers, heads, vocab_size,
    context_length, embed_dim} for constructing the flax module.  OpenCLIP
    transformer heads are width//64 (ViT-H text: 1024/16)."""
    for p in ("cond_stage_model.model.", "model.", ""):
        if f"{p}token_embedding.weight" in sd:
            break
    else:
        raise ValueError("no CLIP text tower found in checkpoint "
                         "(token_embedding.weight under any known prefix)")
    text = _clip_text_tree(sd, p)
    width = int(_to_np(sd[f"{p}positional_embedding"]).shape[1])
    # activation flavor: OpenAI-CLIP files (the vendored clipiqa RN50 —
    # recognizable by the ModifiedResNet visual keys) use QuickGELU;
    # open_clip towers (SD2.x cond_stage prefix, or bare text/ViT bins)
    # use exact GELU
    is_openai = any(k.startswith("visual.layer1.") for k in sd)
    meta = {
        "width": width,
        "layers": len([k for k in text if k.startswith("resblock_")]),
        "heads": max(1, width // 64),
        "vocab_size": int(_to_np(sd[f"{p}token_embedding.weight"]).shape[0]),
        "context_length": int(_to_np(sd[f"{p}positional_embedding"]).shape[0]),
        "embed_dim": int(_to_np(sd[f"{p}text_projection"]).shape[1]),
        "act": "quick_gelu" if is_openai else "gelu",
    }
    return text, meta


def convert_clip_vit(sd: dict):
    """OpenAI-CLIP ViT VISUAL tower -> our archs/clip_arch.py
    CLIPVisionTransformer tree (the backbone of the reference's ClipLoss,
    Diffusion-Based-SR/basicsr/losses/basic_loss.py:706-830, which consumes
    the vendored clip/model.py VisionTransformer modified to return every
    resblock state).  Accepts keys with or without the ``visual.`` prefix.
    Returns (params, meta) with meta for constructing the flax module."""
    p = "visual." if "visual.conv1.weight" in sd else ""
    if f"{p}conv1.weight" not in sd or f"{p}class_embedding" not in sd:
        raise ValueError("no CLIP ViT visual tower found in checkpoint")
    tree: dict = {
        "conv1": {"kernel": _conv_w(sd[f"{p}conv1.weight"])},
        "class_embedding": _to_np(sd[f"{p}class_embedding"]),
        "positional_embedding": _to_np(sd[f"{p}positional_embedding"]),
        "ln_pre": _ln(sd, f"{p}ln_pre"),
        "ln_post": _ln(sd, f"{p}ln_post"),
        "proj": _to_np(sd[f"{p}proj"]),
    }
    i = 0
    while f"{p}transformer.resblocks.{i}.ln_1.weight" in sd:
        base = f"{p}transformer.resblocks.{i}"
        tree[f"resblock_{i}"] = {
            "ln_1": _ln(sd, f"{base}.ln_1"),
            "in_proj": {"kernel": _to_np(sd[f"{base}.attn.in_proj_weight"]).T,
                        "bias": _to_np(sd[f"{base}.attn.in_proj_bias"])},
            "out_proj": _dense(sd, f"{base}.attn.out_proj"),
            "ln_2": _ln(sd, f"{base}.ln_2"),
            "c_fc": _dense(sd, f"{base}.mlp.c_fc"),
            "c_proj": _dense(sd, f"{base}.mlp.c_proj"),
        }
        i += 1
    w = _to_np(sd[f"{p}conv1.weight"])
    width, patch = int(w.shape[0]), int(w.shape[-1])
    grid = int(round((tree["positional_embedding"].shape[0] - 1) ** 0.5))
    meta = {"width": width, "patch_size": patch, "layers": i,
            "heads": width // 64, "input_resolution": grid * patch,
            "output_dim": int(tree["proj"].shape[1])}
    return tree, meta


# torchvision inception_v3 branch orders, matched to metrics/fid.py's
# @nn.compact call order (flax auto-names _BasicConv_{i} inside each block)
_FID_STEM = ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
             "Conv2d_3b_1x1", "Conv2d_4a_3x3"]
_FID_BLOCKS = [
    ("Mixed_5b", "_InceptionA_0", ["branch1x1", "branch5x5_1", "branch5x5_2",
                                   "branch3x3dbl_1", "branch3x3dbl_2",
                                   "branch3x3dbl_3", "branch_pool"]),
    ("Mixed_5c", "_InceptionA_1", None),
    ("Mixed_5d", "_InceptionA_2", None),
    ("Mixed_6a", "_InceptionB_0", ["branch3x3", "branch3x3dbl_1",
                                   "branch3x3dbl_2", "branch3x3dbl_3"]),
    ("Mixed_6b", "_InceptionC_0", ["branch1x1", "branch7x7_1", "branch7x7_2",
                                   "branch7x7_3", "branch7x7dbl_1",
                                   "branch7x7dbl_2", "branch7x7dbl_3",
                                   "branch7x7dbl_4", "branch7x7dbl_5",
                                   "branch_pool"]),
    ("Mixed_6c", "_InceptionC_1", None),
    ("Mixed_6d", "_InceptionC_2", None),
    ("Mixed_6e", "_InceptionC_3", None),
    ("Mixed_7a", "_InceptionD_0", ["branch3x3_1", "branch3x3_2",
                                   "branch7x7x3_1", "branch7x7x3_2",
                                   "branch7x7x3_3", "branch7x7x3_4"]),
    ("Mixed_7b", "_InceptionE_0", ["branch1x1", "branch3x3_1", "branch3x3_2a",
                                   "branch3x3_2b", "branch3x3dbl_1",
                                   "branch3x3dbl_2", "branch3x3dbl_3a",
                                   "branch3x3dbl_3b", "branch_pool"]),
    ("Mixed_7c", "_InceptionE_1", None),
]


def convert_fid_inception(sd: dict):
    """FID InceptionV3 .pth (pytorch-fid / reference archs/inception.py
    layout: torchvision inception keys `Mixed_5b.branch1x1.conv.weight`,
    BasicConv2d = conv(bias-free)+BN(eps 1e-3)) -> metrics/fid.py
    InceptionV3FID (params, batch_stats).  The classifier `fc.*` is unused
    by the pool3 feature extractor and skipped."""
    params: dict = {}
    stats: dict = {}

    def put_basic(flax_name: str, torch_name: str):
        params[flax_name] = {
            "Conv_0": {"kernel": _conv_w(sd[f"{torch_name}.conv.weight"])},
            "BatchNorm_0": {"scale": _to_np(sd[f"{torch_name}.bn.weight"]),
                            "bias": _to_np(sd[f"{torch_name}.bn.bias"])},
        }
        stats[flax_name] = {
            "BatchNorm_0": {"mean": _to_np(sd[f"{torch_name}.bn.running_mean"]),
                            "var": _to_np(sd[f"{torch_name}.bn.running_var"])},
        }

    for i, name in enumerate(_FID_STEM):
        put_basic(f"_BasicConv_{i}", name)
    branch_cache: dict = {}
    for torch_block, flax_block, branches in _FID_BLOCKS:
        kind = flax_block.rsplit("_", 1)[0]
        if branches is not None:
            branch_cache[kind] = branches
        node_p: dict = {}
        node_s: dict = {}
        for bi, branch in enumerate(branch_cache[kind]):
            base = f"{torch_block}.{branch}"
            node_p[f"_BasicConv_{bi}"] = {
                "Conv_0": {"kernel": _conv_w(sd[f"{base}.conv.weight"])},
                "BatchNorm_0": {"scale": _to_np(sd[f"{base}.bn.weight"]),
                                "bias": _to_np(sd[f"{base}.bn.bias"])},
            }
            node_s[f"_BasicConv_{bi}"] = {
                "BatchNorm_0": {"mean": _to_np(sd[f"{base}.bn.running_mean"]),
                                "var": _to_np(sd[f"{base}.bn.running_var"])},
            }
        params[flax_block] = node_p
        stats[flax_block] = node_s
    return params, stats


def export_unet_disc_sn_to_torch(params: dict, path: str, param_key: str = "params") -> None:
    """Inverse port: our UNetDiscriminatorSN tree -> reference torch
    spectral_norm layout (conv{N}.weight_orig + power-iterated weight_u/v
    buffers so sigma is immediately correct on the torch side)."""
    import torch

    def _t(a):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(a)))

    sd: dict = {}
    n = 0
    while f"conv{n}" in params:
        node = params[f"conv{n}"]
        if "Conv_0" in node:  # spectral-normalized conv
            kernel = np.asarray(node["Conv_0"]["kernel"])  # HWIO
            w = kernel.transpose(3, 2, 0, 1)  # OIHW
            sd[f"conv{n}.weight_orig"] = _t(w)
            a = w.reshape(w.shape[0], -1)  # torch SN matrix (out, in*k*k)
            rng = np.random.RandomState(0)
            u = rng.randn(a.shape[0]).astype(np.float32)
            u /= np.linalg.norm(u) + 1e-12
            for _ in range(300):
                v = a.T @ u
                v /= np.linalg.norm(v) + 1e-12
                u = a @ v
                u /= np.linalg.norm(u) + 1e-12
            sd[f"conv{n}.weight_u"] = _t(u)
            sd[f"conv{n}.weight_v"] = _t(v)
            if "bias" in node["Conv_0"]:
                sd[f"conv{n}.bias"] = _t(node["Conv_0"]["bias"])
        else:
            sd[f"conv{n}.weight"] = _t(np.asarray(node["kernel"]).transpose(3, 2, 0, 1))
            sd[f"conv{n}.bias"] = _t(node["bias"])
        n += 1
    torch.save({param_key: sd}, path)


def jax_leaves_first(tree):
    import jax
    return jax.tree_util.tree_leaves(tree)[0]


CONVERTERS = {
    "rrdbnet": (lambda sd: any(".rdb1.conv1." in k for k in sd), convert_rrdbnet),
    "swinir": (lambda sd: any(".residual_group.blocks." in k for k in sd), convert_swinir),
    "unet_disc_sn": (lambda sd: "conv9.weight" in sd and "conv1.weight_orig" in sd,
                     lambda sd: convert_unet_disc_sn(sd)),
    "unet_disc_snv1": (lambda sd: "conv4.weight" in sd and "conv1.weight_orig" in sd
                       and "conv9.weight" not in sd, convert_unet_disc_sn),
    "vgg_style_disc": (lambda sd: "conv0_0.weight" in sd and "linear1.weight" in sd,
                       convert_vgg_style_disc),
    "vgg296_disc": (lambda sd: "conv0_0.weight" in sd and "linear1.weight" in sd,
                    convert_vgg296_disc),
    "srvgg": (lambda sd: "body.0.weight" in sd and not any(".conv" in k for k in sd),
              convert_srvgg),
    "msrresnet": (lambda sd: "conv_first.weight" in sd and "body.0.conv1.weight" in sd
                  and "conv_after_body.weight" not in sd, convert_msrresnet),
    "edsr": (lambda sd: "conv_after_body.weight" in sd and "body.0.conv1.weight" in sd
             and "upsample.0.weight" in sd, convert_edsr),
    "rcan": (lambda sd: any(".residual_group.0.rcab." in k for k in sd), convert_rcan),
    "ecbsr": (lambda sd: any(k.endswith("conv1x1_sbx.scale") for k in sd), convert_ecbsr),
    "ridnet": (lambda sd: "sub_mean.weight" in sd
               and any(".merge.dilation1." in k for k in sd), convert_ridnet),
    "spynet": (lambda sd: "basic_module.0.basic_module.0.weight" in sd,
               convert_spynet),
    "basicvsr": (lambda sd: "backward_trunk.main.0.weight" in sd
                 and "fusion.weight" in sd, convert_basicvsr),
    "toflow": (lambda sd: "spynet.basic_module.0.basic_module.12.weight" in sd
               and "conv_1.weight" in sd, convert_toflow),
    "duf": (lambda sd: "conv3d1.weight" in sd and "conv3d_f2.weight" in sd,
            convert_duf),
    "edvr": (lambda sd: "pcd_align.cas_dcnpack.conv_offset.weight" in sd,
             convert_edvr),
    "iconvsr": (lambda sd: "edvr.pcd_align.cas_dcnpack.conv_offset.weight" in sd
                and "backward_fusion.weight" in sd, convert_iconvsr),
    "basicvsrpp": (lambda sd: "deform_align.backward_1.conv_offset.0.weight" in sd,
                   convert_basicvsrpp),
    "stylegan2": (lambda sd: "style_conv1.modulated_conv.weight" in sd,
                  convert_stylegan2),
    "stylegan2_disc": (lambda sd: "conv_body.0.0.weight" in sd
                       and "final_linear.0.weight" in sd, convert_stylegan2_disc),
    "deresnet": (lambda sd: "conv_first.0.weight" in sd
                 and "fc_degree.0.0.weight" in sd, convert_deresnet),
    "hifacegan": (lambda sd: "lip_encoder.model.0.weight" in sd,
                  convert_hifacegan),
    "spade_generator": (lambda sd: "head_0.conv_0.weight_orig" in sd
                        and "lip_encoder.model.0.weight" not in sd,
                        convert_spade_generator),
    "hifacegan_disc": (lambda sd: "discriminator_0.model0.0.weight" in sd,
                       convert_hifacegan_disc),
    "dfdnet": (lambda sd: "multi_scale_dilation.conv_fusion.weight_orig" in sd,
               convert_dfdnet),
    "bsrgan_rrdbnet": (lambda sd: any(k.startswith("RRDB_trunk.") for k in sd),
                       convert_bsrgan_rrdbnet),
    "ranksrgan_g": (lambda sd: "recon_trunk.0.conv1.weight" in sd
                    and "LRconv.weight" in sd, convert_ranksrgan_g),
    "rrdbps": (lambda sd: "body.0.rdb1.conv1.weight" in sd
               and "upsample.0.weight" in sd, convert_rrdbps),
    "mod": (lambda sd: "w_gating1" in sd and "orthonet.trans.weight" in sd,
            convert_mod),
    "sn_vgg192_disc": (lambda sd: "conv0_1.weight_orig" in sd
                       and "linear1.weight" in sd, convert_sn_vgg192_disc),
    "ranker": (lambda sd: "conv0_0.weight" in sd and "classifier.0.weight" in sd,
               convert_ranker),
    "spsr": (lambda sd: any(k.startswith("model.1.sub.") for k in sd)
             and ("b_fea_conv.weight" in sd or "b_fea_conv.0.weight" in sd),
             convert_spsr),
    "old_rrdbnet": (lambda sd: any(k.startswith("model.1.sub.") for k in sd)
                    and "b_fea_conv.weight" not in sd
                    and "b_fea_conv.0.weight" not in sd, convert_old_rrdbnet),
    "elan": (lambda sd: any(".modules_gmsa." in k for k in sd), convert_elan),
    "ldm_vae": (lambda sd: any(k.endswith("decoder.mid.attn_1.q.weight") for k in sd),
                convert_ldm_vae),
}


def _prune_to_ref(tree, ref):
    """Keep only the converted subtree that exists in the reference tree."""
    if isinstance(tree, dict) and isinstance(ref, dict):
        return {k: _prune_to_ref(v, ref[k]) for k, v in tree.items() if k in ref}
    return tree


def _tree_shapes_match(tree, ref) -> bool:
    import jax
    try:
        la = jax.tree_util.tree_leaves(tree)
        lb = jax.tree_util.tree_leaves(ref)
        return len(la) == len(lb) and all(np.shape(a) == np.shape(b) for a, b in zip(la, lb))
    except Exception:
        return False


def export_rrdbnet_to_torch(params: dict, path: str, param_key: str = "params",
                            also_ema: dict | None = None) -> None:
    """Inverse port: our (scanned) RRDBNet flax tree -> reference .pth layout
    ({param_key: state_dict} with body.{i}.rdb{j}.conv{k} keys, OIHW), so
    reference/BasicSR users can consume checkpoints trained here."""
    import torch

    def to_torch_conv(kernel, bias):
        w = np.asarray(kernel).transpose(3, 2, 0, 1)  # HWIO -> OIHW
        return torch.from_numpy(np.ascontiguousarray(w)), torch.from_numpy(np.asarray(bias))

    def tree_to_sd(tree):
        sd = {}
        for name in ("conv_first", "conv_body", "conv_up1", "conv_up2", "conv_hr", "conv_last"):
            if name in tree:
                w, b = to_torch_conv(tree[name]["kernel"], tree[name]["bias"])
                sd[f"{name}.weight"], sd[f"{name}.bias"] = w, b
        body = tree.get("body")
        if body is not None and "RRDB_0" in body:  # scanned: stacked leading axis
            cell = body["RRDB_0"]
            any_leaf = None
            for j in range(3):
                for kk in range(5):
                    leaf = cell[f"ResidualDenseBlock_{j}"][f"Conv3x3_{kk}"]["Conv_0"]
                    if any_leaf is None:
                        any_leaf = leaf["kernel"]
                    n_blocks = np.asarray(leaf["kernel"]).shape[0]
                    for i in range(n_blocks):
                        w, b = to_torch_conv(np.asarray(leaf["kernel"])[i],
                                             np.asarray(leaf["bias"])[i])
                        sd[f"body.{i}.rdb{j+1}.conv{kk+1}.weight"] = w
                        sd[f"body.{i}.rdb{j+1}.conv{kk+1}.bias"] = b
        else:  # unscanned body_{i} layout
            i = 0
            while f"body_{i}" in (tree or {}):
                blk = tree[f"body_{i}"]
                for j in range(3):
                    for kk in range(5):
                        leaf = blk[f"ResidualDenseBlock_{j}"][f"Conv3x3_{kk}"]["Conv_0"]
                        w, b = to_torch_conv(leaf["kernel"], leaf["bias"])
                        sd[f"body.{i}.rdb{j+1}.conv{kk+1}.weight"] = w
                        sd[f"body.{i}.rdb{j+1}.conv{kk+1}.bias"] = b
                i += 1
        return sd

    payload = {param_key: tree_to_sd(params)}
    if also_ema is not None:
        payload["params_ema"] = tree_to_sd(also_ema)
    import torch
    torch.save(payload, path)


def load_params_auto(path: str, param_key: str = "params", reference_tree=None):
    """Load our pickle format or a torch .pth via arch converters.
    Returns a params tree or None if unconvertible."""
    import jax.numpy as jnp
    if path.endswith((".pkl", ".pickle")):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        tree = payload.get(param_key, payload) if isinstance(payload, dict) else payload
        return _as_jnp(tree)
    if path.endswith((".pth", ".pt")):
        sd = load_torch_state_dict(path, param_key)
        fallback = None
        for name, (detect, convert) in CONVERTERS.items():
            if not detect(sd):
                continue
            try:
                tree = _as_jnp(convert(sd))
            except Exception:
                continue
            if reference_tree is not None:
                # drop converted entries with no counterpart in the target
                # tree (e.g. reference modules our arch doesn't instantiate,
                # like HiFaceGAN's unused to_rgbs heads)
                tree = _prune_to_ref(tree, reference_tree)
            if reference_tree is None or _tree_shapes_match(tree, reference_tree):
                return tree
            fallback = fallback if fallback is not None else name
        import logging
        if fallback is not None:
            logging.getLogger("ssl_tpu").warning(
                "load_params_auto(%s): converter '%s' matched but shapes mismatch; ignoring",
                path, fallback)
        else:
            logging.getLogger("ssl_tpu").warning(
                "load_params_auto(%s): no converter matched this checkpoint's "
                "key layout (keys like %s)", path, sorted(sd)[:5])
        return None
    return None


def _as_jnp(tree):
    import jax
    import jax.numpy as jnp
    return jax.tree_util.tree_map(jnp.asarray, tree)


# ---------------------------------------------------------------------------
# KAIR net_type surface (train_BSGRAN/models/network_discriminator.py +
# network_msrresnet.py MSRResNet0) — see archs/kair_extra_arch.py
# ---------------------------------------------------------------------------

def convert_kair_vgg_d(sd: dict) -> dict:
    """KAIR Discriminator_VGG_96/128/192 (flat B.sequential 'features.N' +
    'classifier.{0,2}') -> _KAIRVGGD params.  BN scale/bias land in params;
    running stats via kair_vgg_d_batch_stats."""
    conv_idx = sorted({int(k.split(".")[1]) for k in sd
                       if k.startswith("features.") and k.endswith(".weight")
                       and f"{k[:-7]}.running_mean" not in sd})
    feats: dict = {}
    for j, ti in enumerate(conv_idx):
        feats[f"Conv_{j}"] = _convp(sd, f"features.{ti}")
        if j > 0:
            bn = f"features.{ti + 1}"
            feats[f"BatchNorm_{j - 1}"] = {"scale": _to_np(sd[f"{bn}.weight"]),
                                           "bias": _to_np(sd[f"{bn}.bias"])}
    return {"_KAIRVGGFeatures_0": feats,
            "Dense_0": {"kernel": _to_np(sd["classifier.0.weight"]).T,
                        "bias": _to_np(sd["classifier.0.bias"])},
            "Dense_1": {"kernel": _to_np(sd["classifier.2.weight"]).T,
                        "bias": _to_np(sd["classifier.2.bias"])}}


def kair_vgg_d_batch_stats(sd: dict) -> dict:
    conv_idx = sorted({int(k.split(".")[1]) for k in sd
                       if k.startswith("features.") and k.endswith(".weight")
                       and f"{k[:-7]}.running_mean" not in sd})
    stats: dict = {}
    for j, ti in enumerate(conv_idx[1:]):
        bn = f"features.{ti + 1}"
        stats[f"BatchNorm_{j}"] = {"mean": _to_np(sd[f"{bn}.running_mean"]),
                                   "var": _to_np(sd[f"{bn}.running_var"])}
    return {"_KAIRVGGFeatures_0": stats}


def convert_kair_vgg128_sn(sd: dict) -> dict:
    """KAIR Discriminator_VGG_128_SN: SN convs conv0..conv9 + SN linears."""
    params: dict = {}
    for i in range(10):
        params[f"conv{i}"] = _sn_convp(sd, f"conv{i}")
    for i in range(2):
        params[f"linear{i}"] = {"Dense_0": {
            "kernel": _to_np(sd[f"linear{i}.weight_orig"]).T,
            "bias": _to_np(sd[f"linear{i}.bias"])}}
    return params


def kair_vgg128_sn_stats(sd: dict, ref_stats) -> dict:
    return sn_stats_tree(sd, ref_stats, lambda path: path[0])


def convert_kair_patchgan(sd: dict, norm_type: str = "spectral") -> dict:
    """KAIR Discriminator_PatchGAN ('model.childN.0' convs; SN when
    'spectral' in norm_type, BN params at 'model.childN.1' when 'batch')."""
    n = len({k.split(".")[1] for k in sd if k.startswith("model.child")})
    params: dict = {}
    bn_j = 0
    for i in range(n):
        base = f"model.child{i}.0"
        if "spectral" in norm_type:
            params[f"child{i}"] = _sn_convp(sd, base)
        else:
            params[f"child{i}"] = _convp(sd, base)
        if "batch" in norm_type and 0 < i < n - 1:
            bn = f"model.child{i}.1"
            params[f"BatchNorm_{bn_j}"] = {"scale": _to_np(sd[f"{bn}.weight"]),
                                           "bias": _to_np(sd[f"{bn}.bias"])}
            bn_j += 1
    return params


def kair_patchgan_batch_stats(sd: dict, ref_stats, norm_type: str = "spectral"):
    """SN power-iterate stats (+ BN running stats for 'batchspectral')."""
    stats = sn_stats_tree(sd, ref_stats,
                          lambda path: f"model.{path[0]}.0")
    if "batch" in norm_type:
        n = len({k.split(".")[1] for k in sd if k.startswith("model.child")})
        bn_j = 0
        for i in range(1, n - 1):
            bn = f"model.child{i}.1"
            if f"{bn}.running_mean" in sd:
                stats[f"BatchNorm_{bn_j}"] = {
                    "mean": _to_np(sd[f"{bn}.running_mean"]),
                    "var": _to_np(sd[f"{bn}.running_var"])}
                bn_j += 1
    return stats


def convert_kair_msrresnet0(sd: dict) -> dict:
    """KAIR MSRResNet0 (network_msrresnet.py:38-77, flat 'model.*' layout,
    act R): head model.0, ResBlocks model.1.sub.{i}.res.{0,2}, body-out
    conv model.1.sub.{nb}, upsample convs, HR tail."""
    params: dict = {"head": _convp(sd, "model.0")}
    blocks = sorted({int(k.split(".")[3]) for k in sd
                     if k.startswith("model.1.sub.") and ".res." in k})
    for i in blocks:
        params[f"b{i}_conv0"] = _convp(sd, f"model.1.sub.{i}.res.0")
        params[f"b{i}_conv1"] = _convp(sd, f"model.1.sub.{i}.res.2")
    params["body_out"] = _convp(sd, f"model.1.sub.{max(blocks) + 1}")
    # remaining flat conv indices after the shortcut block, in order:
    # x4: up convs at 3, 6; HR at 8; tail at 10.  x2/x3: up 3; HR 5; tail 7.
    rest = sorted({int(k.split(".")[1]) for k in sd
                   if k.split(".")[1].isdigit() and int(k.split(".")[1]) > 1})
    ups, hr, tail = rest[:-2], rest[-2], rest[-1]
    for j, ti in enumerate(ups):
        params[f"up{j}"] = _convp(sd, f"model.{ti}")
    params["hr"] = _convp(sd, f"model.{hr}")
    params["tail"] = {"kernel": _conv_w(sd[f"model.{tail}.weight"])}
    return params


# ---------------------------------------------------------------------------
# Generic torch-export via import-converter inversion
# ---------------------------------------------------------------------------

def _tree_leaves(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_leaves(v, path + (k,))
    else:
        yield path, np.asarray(tree)


def _tree_get(tree, path):
    for p in path:
        tree = tree[p]
    return np.asarray(tree)


def discover_export_map(convert_fn, template: dict):
    """Invert an import converter mechanically.

    For each torch key in ``template`` (a reference-layout state dict — a
    real checkpoint or a torch module's state_dict; only shapes and the
    values of non-learned constant buffers matter), probe ``convert_fn`` with
    that key randomized and all others zero, find which output leaf changed,
    and record the (leaf path, transform) pair.  Supported transforms:
    conv OIHW->HWIO, matrix transpose, identity.  Keys that no simple
    transform explains (fixed buffers like ELAN's shift kernels or SPSR's
    Sobel stencils, or converter-synthesized values) are classified
    'constant' and exported verbatim from the template.

    Returns {torch_key: (leaf_path, transform_name) | ('__const__', None)}.
    """
    rng = np.random.default_rng(0)
    zeros = {k: np.zeros(np.shape(v), np.float32) for k, v in
             ((k, _to_np(v)) for k, v in template.items())}
    base = dict(_tree_leaves(convert_fn(dict(zeros))))
    mapping: dict = {}
    for key in template:
        shape = zeros[key].shape
        probe = rng.standard_normal(shape).astype(np.float32) if shape \
            else np.float32(rng.standard_normal())
        sd = dict(zeros)
        sd[key] = probe
        out = dict(_tree_leaves(convert_fn(sd)))
        changed = [p for p, v in out.items()
                   if p not in base or not np.array_equal(v, base[p])]
        tf = None
        for p in changed:
            v = out[p]
            if probe.ndim == 4 and v.shape == tuple(np.array(probe.shape)[[2, 3, 1, 0]]) \
                    and np.array_equal(v, probe.transpose(2, 3, 1, 0)):
                tf = (p, "conv")
            elif probe.ndim == 3 and probe.shape[2] == 1 \
                    and v.shape == (probe.shape[1], probe.shape[0]) \
                    and np.array_equal(v, probe[:, :, 0].T):
                tf = (p, "conv1d")   # torch Conv1d k=1 -> flax Dense kernel
            elif probe.ndim == 2 and v.shape == probe.shape[::-1] \
                    and np.array_equal(v, probe.T):
                tf = (p, "t")
            elif np.array_equal(v, probe):
                tf = (p, "id")
            if tf:
                break
        mapping[key] = tf if tf else ("__const__", None)
    return mapping


def export_to_torch_via(convert_fn, params, template: dict, path: str,
                        param_key: str = "params",
                        also_ema=None, mapping=None) -> dict:
    """Export our flax tree to a reference-layout .pth by inverting
    ``convert_fn`` (see discover_export_map).  Constant buffers are copied
    from ``template`` — pass a reference checkpoint or a freshly constructed
    reference module's state_dict.  Returns the exported state dict."""
    import torch
    mapping = mapping or discover_export_map(convert_fn, template)

    def tree_to_sd(tree):
        sd = {}
        for key, (leaf, tf) in mapping.items():
            if leaf == "__const__":
                sd[key] = torch.as_tensor(_to_np(template[key]))
                continue
            v = _tree_get(tree, leaf)
            if tf == "conv":
                v = v.transpose(3, 2, 0, 1)
            elif tf == "conv1d":
                v = v.T[:, :, None]
            elif tf == "t":
                v = v.T
            sd[key] = torch.from_numpy(np.ascontiguousarray(v))
        return sd

    payload = {param_key: tree_to_sd(params)}
    if also_ema is not None:
        payload["params_ema"] = tree_to_sd(also_ema)
    if path:
        torch.save(payload, path)
    return payload[param_key]
