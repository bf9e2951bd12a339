"""Δppl harness tests (benchmarks/ppl.py) on a tiny synthetic checkpoint —
the BASELINE ≤0.1 Δppl gate must be runnable end-to-end (VERDICT r1)."""

import base64
import json
import sys
from pathlib import Path

import numpy as np
from safetensors.numpy import save_file

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

import ppl as ppl_mod  # noqa: E402

from test_tokenizers import tiny_tekken_cfg  # noqa: E402

ARGS = dict(
    dim=64,
    n_layers=2,
    head_dim=16,
    hidden_dim=128,
    n_heads=4,
    n_kv_heads=2,
    norm_eps=1e-5,
    vocab_size=288,  # ≥ tiny tekken vocab (256 bytes + merges + 20 specials)
    rope_theta=10000.0,
)


def _write_ckpt_with_tokenizer(folder: Path) -> None:
    rng = np.random.default_rng(0)
    (folder / "params.json").write_text(json.dumps(ARGS))
    (folder / "tekken.json").write_text(json.dumps(tiny_tekken_cfg()))

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
    save_file(sd, str(folder / "consolidated.safetensors"))


def test_compute_ppl_matches_manual():
    """ppl == exp(-mean prompt logprob) from generate()."""
    import jax.numpy as jnp

    from mistral_inference_tpu.generate import generate
    from mistral_inference_tpu.model import Transformer

    from test_generate import tiny_args

    model = Transformer.random(tiny_args(), dtype=jnp.float32, seed=0)
    rows = [[1, 5, 9, 13, 17], [2, 6, 10]]
    _, lps = generate(rows, model, max_tokens=0, temperature=0.0)
    total = sum(float(np.sum(l)) for l in lps)
    count = sum(len(l) for l in lps)
    expect = np.exp(-total / count)
    got = ppl_mod.compute_ppl(model, rows)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_ppl_harness_end_to_end(tmp_path):
    _write_ckpt_with_tokenizer(tmp_path)
    results = ppl_mod.run(
        str(tmp_path),
        ppl_mod.SAMPLE_TEXT[:600],
        ["bf16", "int8"],
        kv_quant="fp8",
        seq_len=64,
        batch=2,
    )
    assert "ppl" in results["bf16"] and np.isfinite(results["bf16"]["ppl"])
    assert "delta_ppl_vs_bf16" in results["int8"]
    assert results["int8"]["gate_0.1"] in ("PASS", "FAIL")
    # int8 weight quantization on a tiny random model is near-lossless
    assert abs(results["int8"]["delta_ppl_vs_bf16"]) < 0.5


def test_make_rows():
    rows = ppl_mod.make_rows(list(range(23)), 10)
    assert [len(r) for r in rows] == [10, 10, 3]


def test_ppl_harness_mamba(tmp_path):
    """The Δppl gate also runs against Mamba checkpoints (quantized Mamba is
    a round-2 capability; the harness dispatches on model_type)."""
    import jax.numpy as jnp

    from mistral_inference_tpu.loading import save_stacked
    from mistral_inference_tpu.model import Mamba

    from test_mamba import tiny_mamba_args

    model = Mamba.random(
        tiny_mamba_args(vocab_size=288), dtype=jnp.float32, seed=1
    )
    save_stacked(tmp_path, model)
    (tmp_path / "tekken.json").write_text(json.dumps(tiny_tekken_cfg()))

    results = ppl_mod.run(
        str(tmp_path),
        ppl_mod.SAMPLE_TEXT[:400],
        ["bf16", "int8"],
        kv_quant=None,
        seq_len=48,
        batch=2,
    )
    assert np.isfinite(results["bf16"]["ppl"])
    assert "delta_ppl_vs_bf16" in results["int8"]
    # Random tiny models sit near uniform ppl (~500 here), so the absolute
    # ≤0.1 production gate is meaningless; assert relative closeness.
    assert (
        abs(results["int8"]["delta_ppl_vs_bf16"]) <= 0.01 * results["bf16"]["ppl"]
    )


def test_ppl_stacked_export_one_command(tmp_path):
    """The gate runs against a stacked quantized export directory via the
    ``label=dir`` form (VERDICT r3 #4): no re-quantization — params.json
    in the export carries the mode and from_folder loads it as-is."""
    import jax.numpy as jnp

    from mistral_inference_tpu.loading import save_stacked
    from mistral_inference_tpu.model import Transformer

    src = tmp_path / "bf16"
    src.mkdir()
    _write_ckpt_with_tokenizer(src)
    exp = tmp_path / "int8"
    exp.mkdir()
    model = Transformer.from_folder(src, max_batch_size=2, dtype=jnp.bfloat16)
    model.quantize("int8", group=32)
    save_stacked(exp, model)
    # the export has no tokenizer file; the gate loads tok from model_dir
    (exp / "tekken.json").write_text((src / "tekken.json").read_text())

    results = ppl_mod.run(
        str(src),
        ppl_mod.SAMPLE_TEXT[:600],
        ["bf16", f"int8-export={exp}"],
        kv_quant="fp8",
        seq_len=64,
        batch=2,
    )
    assert "delta_ppl_vs_bf16" in results["int8-export"]
    assert abs(results["int8-export"]["delta_ppl_vs_bf16"]) < 0.5
