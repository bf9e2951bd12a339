"""Pixtral vision-language tests, mirroring the reference's pixtral suite
(reference: tests/test_generate.py:72-171) on random weights: images
interleaved via image_token_id, decode-vs-prefill logprob equivalence, and
the PatchMerger path."""

import jax
import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.args import TransformerArgs, VisionEncoderArgs
from mistral_inference_tpu.generate import generate
from mistral_inference_tpu.model import Transformer
from mistral_inference_tpu.models.vision import (
    _patch_merge_one,
    image_features,
    init_vision_params,
)

from test_generate import tiny_args

IMG_TOK = 2


def vision_args(**over) -> VisionEncoderArgs:
    kw = dict(
        hidden_size=64,
        num_channels=3,
        image_size=64,
        patch_size=8,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        rope_theta=1e4,
        image_token_id=IMG_TOK,
    )
    kw.update(over)
    return VisionEncoderArgs(**kw)


def pixtral_model(vargs: VisionEncoderArgs, seed=42) -> Transformer:
    args = tiny_args(vision_encoder=vargs)
    model = Transformer.random(args, dtype=jnp.float32, seed=seed)
    model.params["vision"] = init_vision_params(
        jax.random.PRNGKey(seed + 1), vargs, args.dim, jnp.float32
    )
    return model


def img(rng, h, w):
    return rng.standard_normal((3, h, w)).astype(np.float32)


def make_multimodal_prompts(vargs):
    """Two rows with images of different sizes, one text-only row."""
    rng = np.random.default_rng(0)
    P = vargs.patch_size
    s = vargs.spatial_merge_size
    img1 = img(rng, 2 * P * s, 2 * P * s)  # (2s)x(2s) patches → 4 tokens after merge
    img2 = img(rng, P * s, 3 * P * s)
    n1 = (img1.shape[1] // P // s) * (img1.shape[2] // P // s)
    n2 = (img2.shape[1] // P // s) * (img2.shape[2] // P // s)
    prompts = [
        [1] + [IMG_TOK] * n1 + [4, 5, 6],
        [1, 7] + [IMG_TOK] * n2 + [8],
        [3, 9, 11, 13],
    ]
    images = [[img1], [img2], []]
    return prompts, images


def check_mm_equivalence(model, atol=5e-4):
    prompts, images = make_multimodal_prompts(model.args.vision_encoder)
    generated, logprobs = generate(
        prompts, model, images=images, max_tokens=6, temperature=0.0
    )
    full = [list(p) + g for p, g in zip(prompts, generated)]
    _, logprobs_ref = generate(full, model, images=images, max_tokens=0, temperature=0.0)
    for lp, lp_ref in zip(logprobs, logprobs_ref):
        assert len(lp) == len(lp_ref)
        np.testing.assert_allclose(lp, lp_ref, atol=atol, rtol=0)


def test_generation_pixtral():
    model = pixtral_model(vision_args())
    check_mm_equivalence(model)


def test_generation_pixtral_patch_merger():
    vargs = vision_args(
        spatial_merge_size=2,
        adapter_bias=False,
        add_pre_mm_projector_layer_norm=True,
        mm_projector_id="patch_merge",
    )
    model = pixtral_model(vargs, seed=7)
    check_mm_equivalence(model)


def test_patch_merge_layout():
    """The merge must produce feature order (d, ki, kj) and row-major patch
    order — the exact layout of torch unfold in the reference
    (vision_encoder.py:206-228)."""
    h, w, d, s = 4, 6, 3, 2
    x = jnp.arange(h * w * d, dtype=jnp.float32).reshape(h * w, d)
    out = np.asarray(_patch_merge_one(x, h, w, s))
    assert out.shape == ((h // s) * (w // s), d * s * s)
    grid = np.arange(h * w * d).reshape(h, w, d)
    # first output patch covers rows 0:2, cols 0:2; feature index (di, ki, kj)
    expect = np.empty(d * s * s)
    for di in range(d):
        for ki in range(s):
            for kj in range(s):
                expect[(di * s + ki) * s + kj] = grid[ki, kj, di]
    np.testing.assert_array_equal(out[0], expect)


def test_image_feature_count():
    vargs = vision_args()
    model = pixtral_model(vargs)
    rng = np.random.default_rng(1)
    P = vargs.patch_size
    feats = image_features(
        model.params["vision"], vargs, [img(rng, 2 * P, 3 * P)], jnp.float32
    )
    assert feats.shape == (6, model.args.dim)
    assert np.isfinite(np.asarray(feats)).all()


def test_pixtral_chunked_prefill():
    """Chunked prefill with images: vision embeds computed once, sliced per
    chunk — must match full prefill."""
    model = pixtral_model(vision_args())
    prompts, images = make_multimodal_prompts(model.args.vision_encoder)
    from mistral_inference_tpu.generate import generate

    g_full, lp_full = generate(
        prompts, model, images=images, max_tokens=4, temperature=0.0
    )
    g_chunk, lp_chunk = generate(
        prompts, model, images=images, max_tokens=4, temperature=0.0, chunk_size=3
    )
    assert g_full == g_chunk
    for a, b in zip(lp_full, lp_chunk):
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=0)
