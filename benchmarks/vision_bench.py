"""Pixtral vision-encoder throughput + MFU on one chip (BASELINE row:
"Pixtral 12B multimodal ... same kernel-efficiency bar" — the last target
cell with no perf number; the reference publishes none).

Measures the real multimodal ingestion path (models/vision.py
``image_features``: patch conv → 24-layer full-attention encoder with
block-diagonal image isolation + 2-D RoPE → merger/adapter) at Pixtral-12B
geometry (hidden 1024, 24 layers, 16 heads, patch 16) for batches of
1024x1024 images (4096 patches each, the model's maximum) and a mixed-size
batch exercising the bucketed padding path.

MFU denominator: matmul FLOPs (qkv/o + ffn + patch conv + adapter) plus
full self-attention (2 dots, N^2), against the chip's bf16 peak — the
encoder is compute-bound (ViT), so MFU is its honest roofline.

Timing (axon): one batch is dispatched image-by-image (the real API), but
all device work chains asynchronously; ONE np.asarray sync closes the
region, and the batch is sized so compute >> the ~28 ms tunnel RTT.

Usage: python benchmarks/vision_bench.py          (~2-4 min warm)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.models.registry import PIXTRAL_VISION
from mistral_inference_tpu.models.vision import image_features, init_vision_params
from mistral_inference_tpu.utils.chip import spec_for_device_kind


def vit_flops(args, n_patches: int) -> float:
    Dv, inter, L = args.hidden_size, args.intermediate_size, args.num_hidden_layers
    per_layer = 4 * Dv * Dv + 3 * Dv * inter
    mm = 2.0 * L * per_layer * n_patches
    attn = L * 2 * 2 * Dv * n_patches * n_patches  # scores + values, full attn
    conv = 2.0 * n_patches * Dv * args.num_channels * args.patch_size**2
    adapter = 2.0 * n_patches * (Dv * Dv + Dv * Dv)  # two-layer MLP approx
    return mm + attn + conv + adapter


def run(args, images, label: str, reps: int = 2):
    params = init_vision_params(jax.random.PRNGKey(0), args, 5120, jnp.bfloat16)
    # Pre-stage pixels on device: through the axon tunnel a host→device
    # image push costs ~100 ms/12 MB and would swamp the encoder (a real
    # deployment feeds over local PCIe). The encoder compute is what's
    # being scored.
    images = [jax.device_put(jnp.asarray(im, jnp.bfloat16)) for im in images]
    np.asarray(images[-1][0, 0, :1])
    feats = image_features(params, args, images, jnp.bfloat16)
    np.asarray(jnp.sum(feats))  # warm: compile every bucket this batch touches
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        feats = image_features(params, args, images, jnp.bfloat16)
        # sync on a device-side scalar: fetching the full (N, 5120) feature
        # tensor would pull hundreds of MB through the axon tunnel and time
        # the tunnel, not the chip (eager ops on concrete arrays execute —
        # in-jit DCE does not apply here)
        np.asarray(jnp.sum(feats))
        best = min(best, time.perf_counter() - t0)
    n_patches = [im.shape[1] // args.patch_size * (im.shape[2] // args.patch_size)
                 for im in images]
    flops = sum(vit_flops(args, n) for n in n_patches)
    dev = jax.devices()[0]
    peak = spec_for_device_kind(dev.device_kind).bf16_tflops * 1e12
    out = {
        "case": label,
        "images": len(images),
        "patch_tokens": int(sum(n_patches)),
        "seconds": round(best, 4),
        "images_per_s": round(len(images) / best, 2),
        "patch_tokens_per_s": round(sum(n_patches) / best, 1),
        "mfu": round(flops / best / peak, 4),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    args = PIXTRAL_VISION
    rng = np.random.default_rng(0)

    big = [rng.normal(size=(3, 1024, 1024)).astype(np.float32) for _ in range(8)]
    run(args, big, "8x1024px (4096 patches each)")

    mixed = [
        rng.normal(size=(3, h, w)).astype(np.float32)
        for h, w in ((512, 512), (768, 1024), (256, 640), (1024, 1024)) * 2
    ]
    run(args, mixed, "8 mixed sizes (bucketed padding)")


if __name__ == "__main__":
    main()
