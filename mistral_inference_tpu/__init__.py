"""mistral_inference_tpu — TPU-native inference framework for the Mistral
model family (dense, MoE, Mamba2, vision-language), built on JAX/XLA/Pallas.

Re-implements the full capability surface of mistralai/mistral-inference
(reference mounted at /root/reference) with a TPU-first architecture:
static-shape jitted prefill/decode programs, a functional ring KV cache,
GSPMD sharding over device meshes, and Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"

from mistral_inference_tpu.args import (  # noqa: F401
    LoraArgs,
    MambaArgs,
    MoeArgs,
    TransformerArgs,
    VisionEncoderArgs,
    load_args,
)


def __getattr__(name):
    # Lazy top-level conveniences (importing them eagerly would pull jax
    # compilation machinery into trivial config-only imports). importlib is
    # used to avoid re-entering this hook for same-named submodules.
    import importlib

    # NOTE: the generate()/generate_mamba() functions are NOT re-exported —
    # the name would collide with the `generate` submodule (whichever import
    # happens first would win). Import them from
    # mistral_inference_tpu.generate directly.
    if name in ("Transformer", "Mamba", "from_folder", "get_model_cls"):
        return getattr(importlib.import_module("mistral_inference_tpu.model"), name)
    if name == "load_tokenizer":
        return importlib.import_module("mistral_inference_tpu.tokenizers").load_tokenizer
    raise AttributeError(name)
