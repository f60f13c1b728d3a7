"""Numerical parity of the transformers-Flax CLIP text path.

`pipeline.load_text_encoder` relies on FlaxCLIPTextModel.from_pretrained(
from_pt=True) to convert the SD checkpoint's torch CLIP text encoder
(reference model load: ipa_guidance.py:127-198, prompt encoding:
ipa_prompt_processor.py:80-100). The real checkpoint is absent from this
environment, so — with the same rigor as tests/test_weight_parity.py — we
build a TINY torch CLIPTextModel, convert it through the exact same
transformers from_pt path, and require numerical agreement on the hidden
states the prompt processor consumes."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_flax_clip_text_matches_torch(tmp_path):
    from transformers import CLIPTextConfig, CLIPTextModel, FlaxCLIPTextModel

    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77,
    )
    torch.manual_seed(0)
    pt = CLIPTextModel(cfg).eval()
    pt.save_pretrained(tmp_path)

    fx = FlaxCLIPTextModel.from_pretrained(str(tmp_path), from_pt=True)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 99, size=(3, 77)).astype("int64")
    ids[:, 0] = 49406 % 99  # arbitrary BOS-ish token; parity is what matters

    with torch.no_grad():
        out_pt = pt(torch.from_numpy(ids)).last_hidden_state.numpy()
    out_fx = np.asarray(fx(ids).last_hidden_state)

    assert out_fx.shape == out_pt.shape == (3, 77, 32)
    np.testing.assert_allclose(out_fx, out_pt, atol=2e-5, rtol=2e-5)


def test_load_text_encoder_shape(tmp_path):
    """pipeline.load_text_encoder end-to-end on a tiny saved checkpoint
    (tokenizer + text_encoder subdirs, the diffusers layout it expects)."""
    from transformers import CLIPTextConfig, CLIPTextModel, CLIPTokenizer

    cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77,
    )
    torch.manual_seed(0)
    CLIPTextModel(cfg).save_pretrained(tmp_path / "text_encoder")

    # minimal BPE vocab for the CLIP tokenizer
    import json

    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1, "a</w>": 2,
             "person</w>": 3, "p": 4, "e": 5, "r": 6, "s": 7, "o": 8,
             "n": 9, "er": 10}
    (tmp_path / "tokenizer").mkdir()
    (tmp_path / "tokenizer" / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "tokenizer" / "merges.txt").write_text("#version: 0.2\ne r\n")
    tok = CLIPTokenizer(str(tmp_path / "tokenizer" / "vocab.json"),
                        str(tmp_path / "tokenizer" / "merges.txt"))
    tok.save_pretrained(tmp_path / "tokenizer")

    from gaussianip_tpu.system.pipeline import load_text_encoder

    encode = load_text_encoder(str(tmp_path))
    out = encode(["a person", "a"])
    assert out.shape == (2, 77, 32)
    assert np.isfinite(out).all()
    # the two prompts must encode differently
    assert np.abs(out[0] - out[1]).max() > 1e-4
