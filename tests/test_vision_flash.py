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
    V._encode_one.clear_cache()
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


def test_multi_image_equals_per_image(small_args):
    """encode_images on a 2-image request must equal the concatenation of
    the single-image encodings (the block-diagonal isolation contract the
    per-image restructure relies on)."""
    rng = np.random.default_rng(1)
    params = V.init_vision_params(jax.random.PRNGKey(0), small_args, 64,
                                  jnp.float32)
    a = rng.normal(size=(3, 128, 128)).astype(np.float32)
    b = rng.normal(size=(3, 64, 192)).astype(np.float32)
    both = np.asarray(V.encode_images(params, small_args, [a, b], jnp.float32))
    fa = np.asarray(V.encode_images(params, small_args, [a], jnp.float32))
    fb = np.asarray(V.encode_images(params, small_args, [b], jnp.float32))
    np.testing.assert_allclose(both, np.concatenate([fa, fb]), atol=1e-6)
