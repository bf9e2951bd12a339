"""Vision-encoder attention backends must agree: flash (stock jax pallas
flash_attention + SegmentIds, interpret mode on CPU) vs the masked-XLA
path, including padding isolation (the -1 segment)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mistral_inference_tpu.models import vision as V
from mistral_inference_tpu.models.registry import PIXTRAL_VISION


def _clear_vision_caches():
    # MISTRAL_VISION_FLASH is read at trace time (the same convention as
    # MISTRAL_PALLAS_INTERPRET): flush the jit caches between A and B.
    V._encode_batch.clear_cache()
    V._vision_blocks.clear_cache()


@pytest.fixture()
def small_args():
    return dataclasses.replace(PIXTRAL_VISION, num_hidden_layers=2)


def test_flash_attend_matches_naive(monkeypatch, small_args):
    """384x336 image → 504 patches → 512 bucket: 8 padding tokens exercise
    the -1 padding segment under flash."""
    monkeypatch.setenv("MISTRAL_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(0)
    params = V.init_vision_params(jax.random.PRNGKey(0), small_args, 64,
                                  jnp.float32)
    im = rng.normal(size=(3, 384, 336)).astype(np.float32)

    monkeypatch.setenv("MISTRAL_VISION_FLASH", "1")
    _clear_vision_caches()
    f_flash = np.asarray(V.image_features(params, small_args, [im], jnp.float32))

    monkeypatch.setenv("MISTRAL_VISION_FLASH", "0")
    _clear_vision_caches()
    f_naive = np.asarray(V.image_features(params, small_args, [im], jnp.float32))
    _clear_vision_caches()

    assert f_flash.shape == f_naive.shape
    np.testing.assert_allclose(f_flash, f_naive, atol=2e-4, rtol=2e-4)


def test_per_image_equals_concatenated_blockdiag(small_args):
    """The per-image restructure must reproduce the reference's design: ONE
    concatenated patch sequence with a block-diagonal mask isolating the
    images (vision_encoder.py:96-98). This oracle builds that concatenated
    sequence directly through _vision_blocks (multi-image ids => the
    block-diag mask) and diffs it against encode_images' per-image calls —
    the real equivalence, not the per-image code against itself."""
    rng = np.random.default_rng(1)
    params = V.init_vision_params(jax.random.PRNGKey(0), small_args, 64,
                                  jnp.float32)
    a = rng.normal(size=(3, 128, 128)).astype(np.float32)
    b = rng.normal(size=(3, 64, 192)).astype(np.float32)
    per_image = np.asarray(
        V.encode_images(params, small_args, [a, b], jnp.float32)
    )

    # concatenated-sequence oracle
    P = small_args.patch_size
    Dh = small_args.hidden_size // small_args.num_attention_heads
    kernel = params["patch_conv"]
    grids, sizes = [], []
    for im in (a, b):
        patches = jax.lax.conv_general_dilated(
            jnp.asarray(im, jnp.float32)[None], kernel,
            window_strides=(P, P), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0]
        h, w = patches.shape[1], patches.shape[2]
        grids.append(patches.reshape(patches.shape[0], h * w).T)
        sizes.append((h, w))
    n_tok = sum(h * w for h, w in sizes)
    N = V._bucket(n_tok)
    flat = jnp.pad(jnp.concatenate(grids, axis=0), ((0, N - n_tok), (0, 0)))
    rows = np.zeros((N,), np.int32)
    cols = np.zeros((N,), np.int32)
    ids = np.full((N,), -1, np.int32)
    off = 0
    for i, (h, w) in enumerate(sizes):
        rr, cc = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        rows[off:off + h * w] = rr.reshape(-1)
        cols[off:off + h * w] = cc.reshape(-1)
        ids[off:off + h * w] = i
        off += h * w
    side = small_args.image_size // P
    cos2d, sin2d = V.precompute_rope_2d(Dh, side, side, small_args.rope_theta)
    cos = jnp.asarray(np.asarray(cos2d)[rows, cols])
    sin = jnp.asarray(np.asarray(sin2d)[rows, cols])
    x = V.rms_norm(flat, params["ln_pre"], V.VISION_NORM_EPS)
    concat_oracle = np.asarray(
        V._vision_blocks(params, x, (cos, sin), jnp.asarray(ids),
                         args=small_args)[:n_tok]
    )
    np.testing.assert_allclose(per_image, concat_oracle, atol=2e-4, rtol=2e-4)
