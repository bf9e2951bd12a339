"""Model-family architecture presets.

The reference's capability envelope (reference: README.md:45-58,72-78):
Mistral 7B, Nemo 12B, Codestral 22B, Mixtral 8x7B/8x22B, Large 2 123B,
Pixtral 12B, Small 3.1 24B, Codestral-Mamba 7B. Real checkpoints always
carry their own ``params.json`` (loading honors it verbatim —
args.load_args); these presets exist for benchmarks, capacity planning, and
random-weight testing at authentic shapes.
"""

from __future__ import annotations

from typing import Dict, Union

from mistral_inference_tpu.args import MambaArgs, MoeArgs, TransformerArgs, VisionEncoderArgs


def _t(**kw) -> TransformerArgs:
    return TransformerArgs(**kw)


PIXTRAL_VISION = VisionEncoderArgs(
    hidden_size=1024,
    num_channels=3,
    image_size=1024,
    patch_size=16,
    intermediate_size=4096,
    num_hidden_layers=24,
    num_attention_heads=16,
    rope_theta=1e4,
    image_token_id=10,
)

REGISTRY: Dict[str, Union[TransformerArgs, MambaArgs]] = {
    "mistral-7b-v0.1": _t(
        dim=4096, n_layers=32, head_dim=128, hidden_dim=14336, n_heads=32,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=32_000, rope_theta=1e4,
        sliding_window=4096,
    ),
    "mistral-7b-v0.3": _t(
        dim=4096, n_layers=32, head_dim=128, hidden_dim=14336, n_heads=32,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=32_768, rope_theta=1e6,
    ),
    "mistral-nemo-12b": _t(
        dim=5120, n_layers=40, head_dim=128, hidden_dim=14336, n_heads=32,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=131_072, rope_theta=1e6,
    ),
    "codestral-22b": _t(
        dim=6144, n_layers=56, head_dim=128, hidden_dim=16384, n_heads=48,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=32_768, rope_theta=1e6,
    ),
    "mixtral-8x7b": _t(
        dim=4096, n_layers=32, head_dim=128, hidden_dim=14336, n_heads=32,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=32_000, rope_theta=1e6,
        moe=MoeArgs(num_experts=8, num_experts_per_tok=2),
    ),
    "mixtral-8x22b": _t(
        dim=6144, n_layers=56, head_dim=128, hidden_dim=16384, n_heads=48,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=32_768, rope_theta=1e6,
        moe=MoeArgs(num_experts=8, num_experts_per_tok=2),
    ),
    "mistral-large-2-123b": _t(
        dim=12288, n_layers=88, head_dim=128, hidden_dim=28672, n_heads=96,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=32_768, rope_theta=1e6,
    ),
    "pixtral-12b": _t(
        dim=5120, n_layers=40, head_dim=128, hidden_dim=14336, n_heads=32,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=131_072, rope_theta=1e9,
        vision_encoder=PIXTRAL_VISION,
    ),
    "mistral-small-3.1-24b": _t(
        dim=5120, n_layers=40, head_dim=128, hidden_dim=32768, n_heads=32,
        n_kv_heads=8, norm_eps=1e-5, vocab_size=131_072, rope_theta=1e9,
    ),
    "codestral-mamba-7b": MambaArgs(
        dim=4096, n_layers=64, vocab_size=32_768, n_groups=8, rms_norm=True,
        residual_in_fp32=True, fused_add_norm=True, pad_vocab_size_multiple=16,
        tie_embeddings=False,
    ),
}


def get_args(name: str) -> Union[TransformerArgs, MambaArgs]:
    import copy

    return copy.deepcopy(REGISTRY[name])


def param_count(name: str) -> int:
    a = get_args(name)
    if isinstance(a, MambaArgs):
        cfg_inner = a.d_inner
        per_layer = (
            a.dim * (2 * cfg_inner + 2 * a.n_groups * a.d_state + a.n_ssm_heads)
            + a.d_conv * (cfg_inner + 2 * a.n_groups * a.d_state)
            + cfg_inner * a.dim
            + 3 * a.n_ssm_heads
            + cfg_inner
            + a.dim
        )
        total = a.n_layers * per_layer + a.padded_vocab_size * a.dim + a.dim
        if not a.tie_embeddings:
            total += a.padded_vocab_size * a.dim
        return total
    attn = a.dim * (a.n_heads + 2 * a.n_kv_heads) * a.head_dim + a.n_heads * a.head_dim * a.dim
    ffn = 3 * a.dim * a.hidden_dim
    if a.moe:
        ffn = a.moe.num_experts * ffn + a.dim * a.moe.num_experts
    per_layer = attn + ffn + 2 * a.dim
    return a.n_layers * per_layer + 2 * a.vocab_size * a.dim + a.dim
