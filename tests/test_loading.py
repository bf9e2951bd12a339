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
