"""Every shipped options file must parse and build its model (tiny-ified)."""
import glob
import os

import pytest
import yaml

CFG_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "options", "train")
YMLS = sorted(glob.glob(os.path.join(CFG_ROOT, "*", "*.yml")))
JSONS = sorted(glob.glob(os.path.join(CFG_ROOT, "*", "*.json")))


def _tinyify(opt):
    """Shrink nets so model construction + init stay fast on CPU."""
    g = opt.get("network_g", {})
    for k, v in {"num_feat": 8, "num_block": 2, "num_grow_ch": 4, "nf": 8, "nb": 2,
                 "gc": 4, "embed_dim": 12, "c_elan": 30, "m_elan": 2}.items():
        if k in g:
            g[k] = v
    if g.get("type") == "SPSRNet":
        g["nb"] = 23  # tap structure needs >= 21 blocks
    if "depths" in g:
        g["depths"] = [2]
        g["num_heads"] = [2]
    for dkey in ("network_d", "network_d_grad", "network_r"):
        if opt.get(dkey):
            for k in ("num_feat", "nf", "base_nc"):
                if k in opt[dkey]:
                    opt[dkey][k] = 4
    if "ssl_setting" in opt:
        opt["ssl_setting"]["kernel_size_search"] = 9
        opt["ssl_setting"]["kernel_size_window"] = 5
    opt["is_train"] = True
    opt.setdefault("path", {})
    opt["path"] = {k: None for k in opt["path"]}
    return opt


@pytest.mark.parametrize("path", YMLS, ids=[os.path.basename(p) for p in YMLS])
def test_yaml_config_builds_model(path):
    with open(path) as f:
        opt = yaml.safe_load(f)
    opt = _tinyify(opt)
    from ssl_tpu.models import build_model
    model = build_model(opt)
    state = model.init_state(lq_shape=(1, 8, 8, 3))
    assert int(state.step) == 0


@pytest.mark.parametrize("path", JSONS, ids=[os.path.basename(p) for p in JSONS])
def test_kair_json_config_builds_model(path):
    from ssl_tpu.utils.options import parse_json_options
    from ssl_tpu.utils.kair_options import kair_to_opt
    opt = kair_to_opt(parse_json_options(path))
    opt = _tinyify(opt)
    from ssl_tpu.models import build_model
    model = build_model(opt)
    state = model.init_state(lq_shape=(1, 8, 8, 3))
    assert int(state.step) == 0


def test_diffusion_config_builds():
    import yaml as _yaml
    path = os.path.join(os.path.dirname(CFG_ROOT), "diffusion", "ssl_base.yml")
    with open(path) as f:
        cfg = _yaml.safe_load(f)
    # tiny-ify
    cfg["model"]["unet"] = {"model_channels": 32, "num_res_blocks": 1,
                            "channel_mult": [1, 2], "attention_resolutions": [2],
                            "num_heads": 4}
    cfg["model"]["first_stage"] = {"embed_dim": 4, "ch": 16, "ch_mult": [1, 2, 2, 2],
                                   "num_res_blocks": 1}
    cfg["model"]["context_dim"] = 32
    cfg["sslopt"]["kernel_size_search"] = 9
    cfg["sslopt"]["kernel_size_window"] = 5
    from ssl_tpu.diffusion.main import build_from_config
    model = build_from_config(cfg)
    state = model.init_state(gt_shape=(1, 32, 32, 3))
    assert int(state.step) == 0
