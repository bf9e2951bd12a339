"""LoRA merge tests (reference: lora.py:118-139 merge semantics)."""

import jax.numpy as jnp
import numpy as np
from safetensors.numpy import save_file

from mistral_inference_tpu.generate import generate
from mistral_inference_tpu.lora import load_lora, merge_lora
from mistral_inference_tpu.model import Transformer

from test_generate import tiny_args


def _adapter_sd(args, rank=4, seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    D, H, Dh, F = args.dim, args.n_heads, args.head_dim, args.hidden_dim
    for i in range(args.n_layers):
        for name, out_dim in [
            ("attention.wq", H * Dh),
            ("attention.wo", D),
            ("feed_forward.w1", F),
        ]:
            sd[f"layers.{i}.{name}.lora_A.weight"] = (
                rng.standard_normal((rank, D if "w1" in name or "wq" in name else H * Dh))
                .astype(np.float32) * 0.05
            )
            sd[f"layers.{i}.{name}.lora_B.weight"] = (
                rng.standard_normal((out_dim, rank)).astype(np.float32) * 0.05
            )
    return sd


def test_merge_math():
    """Merged weight must equal W + scaling·(B@A)^T in (in, out) layout."""
    args = tiny_args()
    model = Transformer.random(args, dtype=jnp.float32, seed=1)
    sd = _adapter_sd(args)
    w_before = np.asarray(model.params["layers"]["attention"]["wq"])
    merged = merge_lora(model.params, sd, args.n_layers, scaling=2.0)
    w_after = np.asarray(merged["layers"]["attention"]["wq"])
    a = sd["layers.1.attention.wq.lora_A.weight"]
    b = sd["layers.1.attention.wq.lora_B.weight"]
    np.testing.assert_allclose(
        w_after[1], w_before[1] + 2.0 * (b @ a).T, atol=1e-5, rtol=1e-5
    )
    # untouched family stays identical
    np.testing.assert_array_equal(
        np.asarray(merged["layers"]["attention"]["wk"]),
        np.asarray(model.params["layers"]["attention"]["wk"]),
    )


def test_load_lora_changes_generation(tmp_path):
    args = tiny_args()
    model = Transformer.random(args, dtype=jnp.float32, seed=42)
    _, base_lp = generate([[1, 2, 3, 4, 5]], model, max_tokens=5, temperature=0.0)

    save_file(_adapter_sd(args, seed=3), str(tmp_path / "lora.safetensors"))
    load_lora(model, tmp_path / "lora.safetensors", scaling=2.0)
    _, lora_lp = generate([[1, 2, 3, 4, 5]], model, max_tokens=5, temperature=0.0)
    assert np.isfinite(lora_lp[0]).all()
    # the merged deltas must move the distribution
    assert not np.allclose(base_lp[0][:4], lora_lp[0][:4], atol=1e-6)


def test_partial_adapter():
    """Only layers present in the adapter are merged (reference merges only
    where lora_B exists, lora.py:131)."""
    args = tiny_args()
    model = Transformer.random(args, dtype=jnp.float32, seed=2)
    sd = _adapter_sd(args)
    # strip layer-0 keys
    sd = {k: v for k, v in sd.items() if not k.startswith("layers.0.")}
    w0_before = np.asarray(model.params["layers"]["attention"]["wq"][0])
    merged = merge_lora(model.params, sd, args.n_layers, scaling=2.0)
    np.testing.assert_array_equal(
        np.asarray(merged["layers"]["attention"]["wq"][0]), w0_before
    )


def test_live_lora_equals_merged(tmp_path):
    """A model built WITH LoraArgs applying live adapters must produce the
    same logits as a plain model with the adapter merged into its weights
    (reference dispatch: lora.py:116-155)."""
    from mistral_inference_tpu.args import LoraArgs

    base_args = tiny_args()
    sd = _adapter_sd(base_args, rank=4, seed=9)
    save_file(sd, str(tmp_path / "lora.safetensors"))

    merged = Transformer.random(base_args, dtype=jnp.float32, seed=42)
    load_lora(merged, tmp_path / "lora.safetensors", scaling=2.0)

    live_args = tiny_args(lora=LoraArgs(rank=4, scaling=2.0))
    live = Transformer.random(live_args, dtype=jnp.float32, seed=42)
    load_lora(live, tmp_path / "lora.safetensors")

    prompts = [[1, 2, 3, 4, 5], [7, 8]]
    gen_m, lp_m = generate(prompts, merged, max_tokens=5, temperature=0.0)
    gen_l, lp_l = generate(prompts, live, max_tokens=5, temperature=0.0)
    assert gen_m == gen_l
    for a, b in zip(lp_m, lp_l):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=0)


def test_live_lora_zero_adapter_is_identity():
    from mistral_inference_tpu.args import LoraArgs

    plain = Transformer.random(tiny_args(), dtype=jnp.float32, seed=42)
    live = Transformer.random(
        tiny_args(lora=LoraArgs(rank=4, scaling=2.0)), dtype=jnp.float32, seed=42
    )
    prompts = [[1, 2, 3, 4]]
    _, lp_p = generate(prompts, plain, max_tokens=4, temperature=0.0)
    _, lp_l = generate(prompts, live, max_tokens=4, temperature=0.0)
    np.testing.assert_allclose(lp_p[0], lp_l[0], atol=1e-5, rtol=0)


def test_live_lora_moe_experts_equals_merged(tmp_path):
    """Live expert adapters (MoE) must match merge-at-load exactly."""
    from mistral_inference_tpu.args import LoraArgs, MoeArgs

    rng = np.random.default_rng(5)
    moe = MoeArgs(num_experts=4, num_experts_per_tok=2)
    base_args = tiny_args(moe=moe)
    D, F, r = base_args.dim, base_args.hidden_dim, 4
    sd = {}
    for i in range(base_args.n_layers):
        for e in range(4):
            for w, din, dout in (("w1", D, F), ("w2", F, D)):
                pre = f"layers.{i}.feed_forward.experts.{e}.{w}"
                sd[pre + ".lora_A.weight"] = (
                    rng.standard_normal((r, din)).astype(np.float32) * 0.05
                )
                sd[pre + ".lora_B.weight"] = (
                    rng.standard_normal((dout, r)).astype(np.float32) * 0.05
                )
    save_file(sd, str(tmp_path / "lora.safetensors"))

    merged = Transformer.random(base_args, dtype=jnp.float32, seed=42)
    load_lora(merged, tmp_path / "lora.safetensors", scaling=2.0)

    live_args = tiny_args(moe=moe, lora=LoraArgs(rank=r, scaling=2.0))
    live = Transformer.random(live_args, dtype=jnp.float32, seed=42)
    load_lora(live, tmp_path / "lora.safetensors")

    prompts = [[1, 2, 3, 4, 5], [7, 8]]
    gen_m, lp_m = generate(prompts, merged, max_tokens=5, temperature=0.0)
    gen_l, lp_l = generate(prompts, live, max_tokens=5, temperature=0.0)
    assert gen_m == gen_l
    for a, b in zip(lp_m, lp_l):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=0)


def test_live_lora_moe_dispatch_equals_dense(tmp_path):
    """moe_impl="dispatch" must apply live expert adapters too (ADVICE r1:
    the dispatch path used to silently drop them). With generous capacity
    the dispatch path is exact, so dense-vs-dispatch with the same adapters
    must agree."""
    from dataclasses import replace

    from mistral_inference_tpu.args import LoraArgs, MoeArgs

    rng = np.random.default_rng(6)
    moe = MoeArgs(num_experts=4, num_experts_per_tok=2)
    r = 4
    args_dense = tiny_args(moe=moe, lora=LoraArgs(rank=r, scaling=2.0))
    D, F = args_dense.dim, args_dense.hidden_dim
    sd = {}
    for i in range(args_dense.n_layers):
        for e in range(4):
            for w, din, dout in (("w1", D, F), ("w2", F, D), ("w3", D, F)):
                pre = f"layers.{i}.feed_forward.experts.{e}.{w}"
                sd[pre + ".lora_A.weight"] = (
                    rng.standard_normal((r, din)).astype(np.float32) * 0.05
                )
                sd[pre + ".lora_B.weight"] = (
                    rng.standard_normal((dout, r)).astype(np.float32) * 0.05
                )
    save_file(sd, str(tmp_path / "lora.safetensors"))

    dense = Transformer.random(args_dense, dtype=jnp.float32, seed=42)
    load_lora(dense, tmp_path / "lora.safetensors")

    import copy

    args_disp = copy.deepcopy(args_dense)
    args_disp.moe_impl = "dispatch"
    args_disp.moe_capacity_factor = 4.0  # capacity ≥ all assignments: exact
    disp = Transformer.random(args_disp, dtype=jnp.float32, seed=42)
    load_lora(disp, tmp_path / "lora.safetensors")

    prompts = [[1, 2, 3, 4, 5], [7, 8]]
    gen_d, lp_d = generate(prompts, dense, max_tokens=5, temperature=0.0)
    gen_s, lp_s = generate(prompts, disp, max_tokens=5, temperature=0.0)
    assert gen_d == gen_s
    for a, b in zip(lp_d, lp_s):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=0)
