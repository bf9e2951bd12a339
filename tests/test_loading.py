"""Checkpoint loading round-trip: write a reference-format folder
(params.json + consolidated.safetensors with torch-style key names/layouts),
load via Transformer.from_folder, and verify the stacked pytree matches the
expected transposed layout exactly."""

import json

import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from mistral_inference_tpu.args import TransformerArgs, load_args
from mistral_inference_tpu.generate import generate
from mistral_inference_tpu.model import Transformer

ARGS = dict(
    dim=64,
    n_layers=2,
    head_dim=16,
    hidden_dim=128,
    n_heads=4,
    n_kv_heads=2,
    norm_eps=1e-5,
    vocab_size=256,
    rope_theta=10000.0,
)


def _write_ckpt(folder, moe=False):
    rng = np.random.default_rng(0)
    d = dict(ARGS)
    if moe:
        d["moe"] = {"num_experts": 4, "num_experts_per_tok": 2}
    (folder / "params.json").write_text(json.dumps(d))

    D, L = ARGS["dim"], ARGS["n_layers"]
    H, Hkv, Dh, F, V = (
        ARGS["n_heads"], ARGS["n_kv_heads"], ARGS["head_dim"],
        ARGS["hidden_dim"], ARGS["vocab_size"],
    )

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    sd = {
        "tok_embeddings.weight": w(V, D),
        "norm.weight": np.ones(D, np.float32),
        "output.weight": w(V, D),
    }
    for i in range(L):
        sd[f"layers.{i}.attention.wq.weight"] = w(H * Dh, D)  # torch (out, in)
        sd[f"layers.{i}.attention.wk.weight"] = w(Hkv * Dh, D)
        sd[f"layers.{i}.attention.wv.weight"] = w(Hkv * Dh, D)
        sd[f"layers.{i}.attention.wo.weight"] = w(D, H * Dh)
        sd[f"layers.{i}.attention_norm.weight"] = np.ones(D, np.float32)
        sd[f"layers.{i}.ffn_norm.weight"] = np.ones(D, np.float32)
        if moe:
            sd[f"layers.{i}.feed_forward.gate.weight"] = w(4, D)
            for e in range(4):
                sd[f"layers.{i}.feed_forward.experts.{e}.w1.weight"] = w(F, D)
                sd[f"layers.{i}.feed_forward.experts.{e}.w2.weight"] = w(D, F)
                sd[f"layers.{i}.feed_forward.experts.{e}.w3.weight"] = w(F, D)
        else:
            sd[f"layers.{i}.feed_forward.w1.weight"] = w(F, D)
            sd[f"layers.{i}.feed_forward.w2.weight"] = w(D, F)
            sd[f"layers.{i}.feed_forward.w3.weight"] = w(F, D)
    save_file(sd, str(folder / "consolidated.safetensors"))
    return sd


def test_load_dense(tmp_path):
    sd = _write_ckpt(tmp_path)
    model = Transformer.from_folder(tmp_path, dtype=jnp.float32)

    np.testing.assert_array_equal(
        np.asarray(model.params["tok_embeddings"]), sd["tok_embeddings.weight"]
    )
    np.testing.assert_array_equal(
        np.asarray(model.params["output"]), sd["output.weight"].T
    )
    np.testing.assert_array_equal(
        np.asarray(model.params["layers"]["attention"]["wq"][1]),
        sd["layers.1.attention.wq.weight"].T,
    )
    np.testing.assert_array_equal(
        np.asarray(model.params["layers"]["feed_forward"]["w2"][0]),
        sd["layers.0.feed_forward.w2.weight"].T,
    )

    gen, lp = generate([[1, 2, 3, 4]], model, max_tokens=4, temperature=0.0)
    assert len(gen[0]) == 4 and np.isfinite(lp[0]).all()


def test_load_moe(tmp_path):
    sd = _write_ckpt(tmp_path, moe=True)
    model = Transformer.from_folder(tmp_path, dtype=jnp.float32)
    assert model.args.moe is not None
    np.testing.assert_array_equal(
        np.asarray(model.params["layers"]["moe"]["w1"][1, 3]),
        sd["layers.1.feed_forward.experts.3.w1.weight"].T,
    )
    gen, _ = generate([[1, 2, 3]], model, max_tokens=3, temperature=0.0)
    assert len(gen[0]) == 3


def test_load_args_dispatch(tmp_path):
    (tmp_path / "params.json").write_text(json.dumps(ARGS))
    args = load_args(tmp_path)
    assert isinstance(args, TransformerArgs)
    assert args.dim == 64


def test_pth_checkpoint(tmp_path):
    """The legacy consolidated.00.pth format (reference: transformer.py:331-333)."""
    torch = pytest.importorskip("torch")
    sd_np = _write_ckpt(tmp_path)
    (tmp_path / "consolidated.safetensors").unlink()
    torch.save(
        {k: torch.from_numpy(v).to(torch.bfloat16) for k, v in sd_np.items()},
        tmp_path / "consolidated.00.pth",
    )
    model = Transformer.from_folder(tmp_path, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(model.params["layers"]["attention"]["wo"][0]),
        sd_np["layers.0.attention.wo.weight"].T.astype(np.float32),
        atol=0.01,  # bf16 storage rounding
    )


def test_load_vision_checkpoint(tmp_path):
    """Pixtral-style checkpoint: vision_encoder.* / vision_language_adapter.*
    / patch_merger.* keys must map into the vision subtree and produce a
    working multimodal model (reference key space: transformer.py:279-283)."""
    rng = np.random.default_rng(0)
    d = dict(ARGS)
    d["vision_encoder"] = dict(
        hidden_size=32,
        num_channels=3,
        image_size=32,
        patch_size=8,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        rope_theta=1e4,
        image_token_id=2,
        adapter_bias=False,
        spatial_merge_size=2,
        add_pre_mm_projector_layer_norm=True,
        mm_projector_id="patch_merge",
    )
    (tmp_path / "params.json").write_text(json.dumps(d))
    sd = _write_ckpt_tensors_only(rng)

    Dv, F, Lv, D = 32, 64, 2, ARGS["dim"]

    def w(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    sd["vision_encoder.patch_conv.weight"] = w(Dv, 3, 8, 8)
    sd["vision_encoder.ln_pre.weight"] = np.ones(Dv, np.float32)
    for i in range(Lv):
        p = f"vision_encoder.transformer.layers.{i}"
        for name, shape in [
            ("attention.wq", (Dv, Dv)), ("attention.wk", (Dv, Dv)),
            ("attention.wv", (Dv, Dv)), ("attention.wo", (Dv, Dv)),
            ("feed_forward.w1", (F, Dv)), ("feed_forward.w2", (Dv, F)),
            ("feed_forward.w3", (F, Dv)),
        ]:
            sd[f"{p}.{name}.weight"] = w(*shape)
        sd[f"{p}.attention_norm.weight"] = np.ones(Dv, np.float32)
        sd[f"{p}.ffn_norm.weight"] = np.ones(Dv, np.float32)
    sd["vision_language_adapter.w_in.weight"] = w(D, Dv)
    sd["vision_language_adapter.w_out.weight"] = w(D, D)
    sd["patch_merger.merging_layer.weight"] = w(Dv, Dv * 4)
    sd["pre_mm_projector_norm.weight"] = np.ones(Dv, np.float32)
    save_file(sd, str(tmp_path / "consolidated.safetensors"))

    model = Transformer.from_folder(tmp_path, dtype=jnp.float32)
    assert "vision" in model.params
    np.testing.assert_array_equal(
        np.asarray(model.params["vision"]["layers"]["attention"]["wq"][1]),
        sd["vision_encoder.transformer.layers.1.attention.wq.weight"].T,
    )
    assert "b" not in model.params["vision"]["adapter"]["w_in"]  # adapter_bias=False

    # end-to-end: one 16x16 image = 2x2 patches -> 1 token after merge(2)
    img = rng.standard_normal((3, 16, 16)).astype(np.float32)
    gen, lp = generate(
        [[1, 2, 5]], model, images=[[img]], max_tokens=3, temperature=0.0
    )
    assert len(gen[0]) == 3 and np.isfinite(lp[0]).all()


def _write_ckpt_tensors_only(rng):
    """LM tensors for ARGS (no file writes) — shared by the vision test."""
    D, L = ARGS["dim"], ARGS["n_layers"]
    H, Hkv, Dh, F, V = (
        ARGS["n_heads"], ARGS["n_kv_heads"], ARGS["head_dim"],
        ARGS["hidden_dim"], ARGS["vocab_size"],
    )

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    sd = {
        "tok_embeddings.weight": w(V, D),
        "norm.weight": np.ones(D, np.float32),
        "output.weight": w(V, D),
    }
    for i in range(L):
        sd[f"layers.{i}.attention.wq.weight"] = w(H * Dh, D)
        sd[f"layers.{i}.attention.wk.weight"] = w(Hkv * Dh, D)
        sd[f"layers.{i}.attention.wv.weight"] = w(Hkv * Dh, D)
        sd[f"layers.{i}.attention.wo.weight"] = w(D, H * Dh)
        sd[f"layers.{i}.attention_norm.weight"] = np.ones(D, np.float32)
        sd[f"layers.{i}.ffn_norm.weight"] = np.ones(D, np.float32)
        sd[f"layers.{i}.feed_forward.w1.weight"] = w(F, D)
        sd[f"layers.{i}.feed_forward.w2.weight"] = w(D, F)
        sd[f"layers.{i}.feed_forward.w3.weight"] = w(F, D)
    return sd


def test_save_stacked_roundtrip(tmp_path):
    """Quantized export → native stacked load: identical outputs, no
    re-quantization at load (the reference is load-only)."""
    from mistral_inference_tpu.generate import generate
    from mistral_inference_tpu.loading import save_stacked
    from mistral_inference_tpu.model import Transformer, from_folder

    args = TransformerArgs(
        dim=128, n_layers=2, head_dim=32, hidden_dim=256, n_heads=4,
        n_kv_heads=2, norm_eps=1e-5, vocab_size=256, sliding_window=16,
        kv_quant="fp8",
    )
    model = Transformer.random(args, dtype=jnp.bfloat16, seed=5)
    model.quantize("int4", group=32)
    prompts = [[5, 17, 2, 91], [7, 3]]
    ref, ref_lps = generate(prompts, model, max_tokens=8, temperature=0.0)

    out_dir = tmp_path / "export"
    save_stacked(out_dir, model)

    loaded = from_folder(out_dir, dtype=jnp.bfloat16)
    assert loaded.args.quant == "int4" and loaded.args.kv_quant == "fp8"
    got, got_lps = generate(prompts, loaded, max_tokens=8, temperature=0.0)
    assert got == ref
    for a, b in zip(got_lps, ref_lps):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)

    # quant=... matching the stored mode is a no-op; a mismatch errors.
    from_folder(out_dir, dtype=jnp.bfloat16, quant="int4")
    import pytest

    with pytest.raises(AssertionError, match="already"):
        from_folder(out_dir, dtype=jnp.bfloat16, quant="int8")


def test_save_stacked_bf16_roundtrip(tmp_path):
    """Unquantized bf16 export round-trips exactly (bf16 stored as raw
    bits — safetensors.numpy has no ml_dtypes support)."""
    from mistral_inference_tpu.generate import generate
    from mistral_inference_tpu.loading import save_stacked
    from mistral_inference_tpu.model import Transformer, from_folder

    args = TransformerArgs(
        dim=128, n_layers=2, head_dim=32, hidden_dim=256, n_heads=4,
        n_kv_heads=2, norm_eps=1e-5, vocab_size=256,
    )
    model = Transformer.random(args, dtype=jnp.bfloat16, seed=6)
    prompts = [[9, 4, 7, 2]]
    ref, _ = generate(prompts, model, max_tokens=6, temperature=0.0)
    save_stacked(tmp_path / "e2", model)
    loaded = from_folder(tmp_path / "e2", dtype=jnp.bfloat16)
    got, _ = generate(prompts, loaded, max_tokens=6, temperature=0.0)
    assert got == ref


def test_save_stacked_mamba_roundtrip(tmp_path):
    from mistral_inference_tpu.generate import generate_mamba
    from mistral_inference_tpu.loading import save_stacked
    from mistral_inference_tpu.model import Mamba, from_folder
    from mistral_inference_tpu.args import MambaArgs

    args = MambaArgs(
        dim=64, n_layers=2, vocab_size=256, n_groups=2, rms_norm=True,
        residual_in_fp32=True, fused_add_norm=True, pad_vocab_size_multiple=16,
        tie_embeddings=False, d_state=16, d_conv=4, expand=2, headdim=16,
    )
    model = Mamba.random(args, dtype=jnp.bfloat16, seed=4)
    prompts = [[5, 9, 2], [7, 3, 11, 6]]
    ref, _ = generate_mamba(prompts, model, max_tokens=6, temperature=0.0)
    save_stacked(tmp_path / "m", model)
    loaded = from_folder(tmp_path / "m", dtype=jnp.bfloat16)
    assert isinstance(loaded, Mamba)
    got, _ = generate_mamba(prompts, loaded, max_tokens=6, temperature=0.0)
    assert got == ref
