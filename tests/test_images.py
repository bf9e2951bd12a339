"""Multimodal input pipeline tests: image preprocessing, [IMG] token grid
layout, chat encoding with image chunks, and image requests through the
serving engine (reference: main.py:77-99,150-159 + mistral-common's image
preprocessing contract)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mistral_inference_tpu.args import VisionEncoderArgs
from mistral_inference_tpu.generate import generate
from mistral_inference_tpu.images import (
    DATASET_MEAN,
    DATASET_STD,
    encode_user_content,
    image_token_layout,
    preprocess_image,
    target_size,
)
from mistral_inference_tpu.model import Transformer
from mistral_inference_tpu.models.vision import init_vision_params
from mistral_inference_tpu.server.engine import Engine
from mistral_inference_tpu.tokenizers.chat import (
    ChatRequest,
    Message,
    encode_chat_multimodal,
)

from test_generate import tiny_args


class MMTok:
    """Control-token tokenizer fake with the multimodal special layout."""

    bos_id, eos_id = 1, 2
    SPECIALS = {
        "[INST]": 3,
        "[/INST]": 4,
        "[IMG]": 10,
        "[IMG_BREAK]": 12,
        "[IMG_END]": 13,
    }

    def special(self, name):
        return self.SPECIALS[name]

    def encode(self, text, bos=True, eos=False):
        ids = [20 + (ord(c) % 100) for c in text]
        if bos:
            ids = [self.bos_id] + ids
        if eos:
            ids = ids + [self.eos_id]
        return ids

    def decode(self, ids):
        return " ".join(map(str, ids))


def vargs(**over) -> VisionEncoderArgs:
    kw = dict(
        hidden_size=64,
        num_channels=3,
        image_size=64,
        patch_size=8,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        rope_theta=1e4,
        image_token_id=10,
    )
    kw.update(over)
    return VisionEncoderArgs(**kw)


def pixtral_model(va: VisionEncoderArgs, seed=42) -> Transformer:
    args = tiny_args(vision_encoder=va)
    model = Transformer.random(args, dtype=jnp.float32, seed=seed)
    model.params["vision"] = init_vision_params(
        jax.random.PRNGKey(seed + 1), va, args.dim, jnp.float32
    )
    return model


# -- preprocessing -----------------------------------------------------------


def test_target_size_round_up_to_patch_multiple():
    # no downscale needed; round up to patch multiples (PixtralImageProcessor
    # contract: _num_image_tokens → tokens·patch)
    assert target_size(20, 50, 16, 1024) == (32, 64)
    assert target_size(16, 16, 16, 1024) == (16, 16)


def test_target_size_downscales_longest_edge():
    h, w = target_size(2048, 1024, 16, 1024)
    assert h <= 1024 + 16 and w <= 512 + 16  # floor(scale) then ceil to patch
    assert h % 16 == 0 and w % 16 == 0
    # longest edge respected up to patch rounding
    assert h == 1024


def test_target_size_merge_multiple():
    h, w = target_size(20, 20, 16, 1024, spatial_merge_size=2)
    assert h % 32 == 0 and w % 32 == 0


def test_preprocess_image_normalization():
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (24, 40, 3), np.uint8)
    out = preprocess_image(raw, vargs())
    assert out.shape == (3, 24, 40)  # already patch multiples of 8
    assert out.dtype == np.float32
    expect = (raw[..., 0].astype(np.float32) / 255.0 - DATASET_MEAN[0]) / DATASET_STD[0]
    np.testing.assert_allclose(out[0], expect, atol=1e-5)


def test_preprocess_image_chw_input_and_resize():
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, (3, 30, 70), np.uint8)  # CHW in
    va = vargs(image_size=64)  # longest 70 > 64 → downscale
    out = preprocess_image(raw, va)
    assert out.shape[0] == 3
    assert out.shape[1] % 8 == 0 and out.shape[2] % 8 == 0
    assert max(out.shape[1], out.shape[2]) <= 64 + 8


# -- token layout ------------------------------------------------------------


def test_image_token_layout_grid():
    tok = MMTok()
    va = vargs()
    ids = image_token_layout(16, 24, va, tok)  # 2 rows x 3 cols of patches
    IMG, BRK, END = 10, 12, 13
    assert ids == [IMG, IMG, IMG, BRK, IMG, IMG, IMG, END]


def test_image_token_layout_merge():
    tok = MMTok()
    va = vargs(spatial_merge_size=2)
    ids = image_token_layout(32, 16, va, tok)  # merged grid: 2 rows x 1 col
    assert ids == [10, 12, 10, 13]


def test_encode_user_content_interleaves():
    tok = MMTok()
    va = vargs()
    rng = np.random.default_rng(0)
    im = rng.integers(0, 256, (8, 16, 3), np.uint8)
    ids, images = encode_user_content(tok, va, ["hi", im, "bye"])
    assert len(images) == 1
    assert images[0].shape == (3, 8, 16)
    n_img = sum(1 for i in ids if i == 10)
    assert n_img == 2  # 1 row x 2 cols
    assert 13 in ids  # [IMG_END]


# -- chat encoding + generation e2e ------------------------------------------


def test_chat_multimodal_generate():
    """Interactive-chat path: text+image chunks → encode_chat_multimodal →
    generate — and the decode-vs-prefill logprob invariant must hold."""
    tok = MMTok()
    va = vargs()
    model = pixtral_model(va)
    rng = np.random.default_rng(0)
    im = rng.integers(0, 256, (16, 16, 3), np.uint8)

    req = ChatRequest(messages=[Message("user", ["Look:", im])])
    ids, images = encode_chat_multimodal(tok, req, va)
    n_img_tokens = sum(1 for i in ids if i == va.image_token_id)
    assert n_img_tokens == 4  # 2x2 patch grid
    assert ids[0] == tok.bos_id and ids[1] == tok.special("[INST]")
    assert ids[-1] == tok.special("[/INST]")

    gen, lp = generate([ids], model, images=[images], max_tokens=5, temperature=0.0)
    assert len(gen[0]) == 5
    full = [ids + gen[0]]
    _, lp_ref = generate(full, model, images=[images], max_tokens=0, temperature=0.0)
    np.testing.assert_allclose(lp[0], lp_ref[0], atol=5e-4, rtol=0)


def test_chat_multimodal_requires_vargs():
    tok = MMTok()
    im = np.zeros((8, 8, 3), np.uint8)
    with pytest.raises(AssertionError):
        encode_chat_multimodal(
            tok, ChatRequest(messages=[Message("user", ["x", im])]), None
        )


# -- engine ------------------------------------------------------------------


def test_engine_image_request_matches_generate():
    va = vargs()
    model = pixtral_model(va, seed=9)
    tok = MMTok()
    rng = np.random.default_rng(3)
    im = rng.integers(0, 256, (16, 24, 3), np.uint8)
    req = ChatRequest(messages=[Message("user", ["describe", im])])
    ids, images = encode_chat_multimodal(tok, req, va)

    ref, _ = generate([ids], model, images=[images], max_tokens=6, temperature=0.0)

    eng = Engine(model, batch_size=2, max_seq_len=96, temperature=0.0)
    text_rid = eng.submit([1, 5, 9], max_tokens=6)  # text row rides along
    img_rid = eng.submit(ids, max_tokens=6, images=images)
    results = eng.run_to_completion()
    assert results[img_rid] == ref[0]

    ref_t, _ = generate([[1, 5, 9]], model, max_tokens=6, temperature=0.0)
    assert results[text_rid] == ref_t[0]
