"""Model configuration schemas.

Deserialized from the ``params.json`` shipped inside checkpoint folders.
Mirrors the reference config surface (reference: src/mistral_inference/args.py:13-76,
moe.py:10-13, lora.py:12-19) but as plain dataclasses with tolerant
``from_dict`` parsing (unknown keys ignored) instead of simple-parsing.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

PATCH_MERGE = "patch_merge"


def _filter_kwargs(cls: type, d: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


@dataclass
class MoeArgs:
    num_experts: int
    num_experts_per_tok: int

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "MoeArgs":
        return cls(**_filter_kwargs(cls, d))


@dataclass
class LoraArgs:
    rank: int
    scaling: float

    def __post_init__(self) -> None:
        assert self.rank > 0
        assert self.scaling > 0.0

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "LoraArgs":
        return cls(**_filter_kwargs(cls, d))


@dataclass(frozen=True)  # hashable: used as a static jit arg (models/vision.py)
class VisionEncoderArgs:
    hidden_size: int
    num_channels: int
    image_size: int
    patch_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    rope_theta: float = 1e4  # for 2-D RoPE
    image_token_id: int = 10
    adapter_bias: bool = True
    spatial_merge_size: int = 1
    add_pre_mm_projector_layer_norm: bool = False
    mm_projector_id: str = ""

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "VisionEncoderArgs":
        return cls(**_filter_kwargs(cls, d))


@dataclass
class TransformerArgs:
    dim: int
    n_layers: int
    head_dim: int
    hidden_dim: int
    n_heads: int
    n_kv_heads: int
    norm_eps: float
    vocab_size: int

    max_batch_size: int = 0

    # Rotary embeddings; reference defaults to 1e6 when unset
    # (reference: transformer.py:114-116).
    rope_theta: Optional[float] = None
    moe: Optional[MoeArgs] = None
    lora: Optional[LoraArgs] = None
    # Scalar, per-layer list, or None. A list is tiled to cover n_layers
    # (reference: cache.py:13-24).
    sliding_window: Optional[Union[int, List[Optional[int]]]] = None
    model_type: str = "transformer"
    vision_encoder: Optional[VisionEncoderArgs] = None

    # Quantization config — new capability vs reference. "bf16" | "int8" | "int4".
    quant: str = "bf16"
    # KV-cache element type: "bf16" | "fp8" | "int8".
    kv_quant: str = "bf16"
    # MoE compute strategy: "dense" evaluates every expert on every token
    # (exact, memory-bound-optimal for decode); "dispatch" is GShard-style
    # capacity-bounded routing (compute-optimal for prefill; tokens over
    # capacity fall back to zero contribution for that expert).
    moe_impl: str = "dense"
    moe_capacity_factor: float = 2.0

    def __post_init__(self) -> None:
        assert self.model_type == "transformer", self.model_type
        assert self.n_heads % self.n_kv_heads == 0

    @property
    def q_per_kv(self) -> int:
        return self.n_heads // self.n_kv_heads

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "TransformerArgs":
        d = dict(d)
        # vLLM-compat alias (reference: args.py:48-59).
        if d.get("sliding_window") is None and d.get("_sliding_window") is not None:
            d["sliding_window"] = d["_sliding_window"]
        kw = _filter_kwargs(cls, d)
        if isinstance(kw.get("moe"), dict):
            kw["moe"] = MoeArgs.from_dict(kw["moe"])
        if isinstance(kw.get("lora"), dict):
            kw["lora"] = LoraArgs.from_dict(kw["lora"])
        if isinstance(kw.get("vision_encoder"), dict):
            kw["vision_encoder"] = VisionEncoderArgs.from_dict(kw["vision_encoder"])
        return cls(**kw)


@dataclass
class MambaArgs:
    dim: int
    n_layers: int
    vocab_size: int
    n_groups: int
    rms_norm: bool
    residual_in_fp32: bool
    fused_add_norm: bool
    pad_vocab_size_multiple: int
    tie_embeddings: bool
    model_type: str = "mamba"
    # Weight quantization state ("bf16" | "int8" | "int4") — set by
    # Mamba.quantize and recorded in native stacked exports so a
    # pre-quantized checkpoint is never re-quantized (same contract as
    # TransformerArgs.quant).
    quant: str = "bf16"

    # Mamba2 defaults matching the reference's ssm_cfg (reference: mamba.py:30-42
    # wires mamba_ssm defaults: d_state=128, d_conv=4, expand=2, headdim=64).
    d_state: int = 128
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64

    def __post_init__(self) -> None:
        assert self.model_type == "mamba", self.model_type

    @property
    def d_inner(self) -> int:
        return self.expand * self.dim

    @property
    def n_ssm_heads(self) -> int:
        return self.d_inner // self.headdim

    @property
    def padded_vocab_size(self) -> int:
        m = self.pad_vocab_size_multiple
        return ((self.vocab_size + m - 1) // m) * m

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "MambaArgs":
        return cls(**_filter_kwargs(cls, d))


ModelArgs = Union[TransformerArgs, MambaArgs]


def load_args(folder: Union[str, Path]) -> ModelArgs:
    """Parse ``<folder>/params.json`` dispatching on ``model_type``
    (reference: main.py:60-64, transformer.py:306-307)."""
    with open(Path(folder) / "params.json", "r") as f:
        d = json.load(f)
    model_type = d.get("model_type", "transformer")
    if model_type == "transformer":
        return TransformerArgs.from_dict(d)
    if model_type == "mamba":
        return MambaArgs.from_dict(d)
    raise ValueError(f"Unknown model_type: {model_type}")
