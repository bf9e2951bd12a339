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
