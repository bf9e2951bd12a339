"""CLI end-to-end: build a complete model folder (params.json + safetensors +
tekken tokenizer) and run the demo subcommand (reference CLI surface:
main.py:203-265)."""

import json

import pytest

from mistral_inference_tpu.main import build_parser, demo, main

from test_loading import _write_ckpt
from test_tokenizers import tiny_tekken_cfg


@pytest.fixture
def model_folder(tmp_path):
    _write_ckpt(tmp_path)
    # vocab_size 256 < tekken ids; use a matching small tokenizer: restrict
    # tekken vocab to fit vocab_size=256 (20 specials + 236 bytes)
    cfg = tiny_tekken_cfg()
    cfg["config"]["default_vocab_size"] = 256
    cfg["vocab"] = cfg["vocab"][:236]
    (tmp_path / "tekken.json").write_text(json.dumps(cfg))
    return tmp_path


def test_demo_runs(model_folder, capsys):
    main(["demo", str(model_folder), "--max_tokens", "5"])
    out = capsys.readouterr().out
    assert out.count("=" * 40) == 3


def test_demo_quantized(model_folder, capsys):
    main([
        "demo", str(model_folder), "--max_tokens", "4",
        "--quant", "int8", "--kv_quant", "fp8",
    ])
    assert capsys.readouterr().out.count("=" * 40) == 3


def test_parser_defaults():
    args = build_parser().parse_args(["chat", "/x"])
    assert args.instruct and args.temperature == 0.7
    args = build_parser().parse_args(["demo", "/x", "--no-instruct"])
    assert not args.instruct


def test_quant_with_lora(model_folder, tmp_path, capsys):
    """--quant + --lora_path must merge the adapter BEFORE quantizing."""
    import numpy as np
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    sd = {}
    for i in range(2):
        sd[f"layers.{i}.attention.wq.lora_A.weight"] = (
            rng.standard_normal((4, 64)).astype(np.float32) * 0.05
        )
        sd[f"layers.{i}.attention.wq.lora_B.weight"] = (
            rng.standard_normal((64, 4)).astype(np.float32) * 0.05
        )
    lora_file = tmp_path / "adapter.safetensors"
    save_file(sd, str(lora_file))
    main([
        "demo", str(model_folder), "--max_tokens", "3",
        "--quant", "int8", "--lora_path", str(lora_file),
    ])
    assert capsys.readouterr().out.count("=" * 40) == 3


def test_demo_speculative(model_folder, tmp_path, capsys):
    """--draft_path routes the demo through speculative decoding; greedy
    output must match the plain run exactly."""
    draft_dir = tmp_path / "draft"
    draft_dir.mkdir()
    _write_ckpt(draft_dir)

    main(["demo", str(model_folder), "--max_tokens", "5"])
    plain = capsys.readouterr().out
    main([
        "demo", str(model_folder), "--max_tokens", "5",
        "--draft_path", str(draft_dir), "--spec_tokens", "2",
    ])
    spec = capsys.readouterr().out
    assert spec == plain


def test_demo_lookup_speculative(model_folder, capsys):
    """--draft_path lookup (draft-free n-gram speculation) must match the
    plain greedy demo output exactly."""
    main(["demo", str(model_folder), "--max_tokens", "5"])
    plain = capsys.readouterr().out
    main([
        "demo", str(model_folder), "--max_tokens", "5",
        "--draft_path", "lookup", "--spec_tokens", "2",
    ])
    assert capsys.readouterr().out == plain


def test_demo_auto_mesh(model_folder, capsys):
    """--tensor auto factorizes every visible device (8 virtual CPUs here →
    tensor=2 for the n_kv_heads=2 test checkpoint, data capped to divide the
    3-prompt batch) and must match the single-device demo output exactly."""
    main(["demo", str(model_folder), "--max_tokens", "5"])
    plain = capsys.readouterr().out
    main(["demo", str(model_folder), "--max_tokens", "5", "--tensor", "auto"])
    assert capsys.readouterr().out == plain


def test_quantize_export_command(model_folder, tmp_path, capsys):
    """`quantize` subcommand: export int4 stacked checkpoint, then demo
    from it — output matches the on-the-fly quantized demo."""
    main(["demo", str(model_folder), "--max_tokens", "4", "--quant", "int4"])
    ref = capsys.readouterr().out
    out_dir = tmp_path / "q4"
    main(["quantize", str(model_folder), str(out_dir), "--quant", "int4"])
    capsys.readouterr()
    main(["demo", str(out_dir), "--max_tokens", "4"])
    assert capsys.readouterr().out == ref


def test_demo_sequence_parallel(model_folder, capsys):
    """--seq N shards prefill chunks over the seq mesh axis (composed with
    TP); demo output contract unchanged."""
    main([
        "demo", str(model_folder), "--max_tokens", "4",
        "--seq", "2", "--tensor", "2",
    ])
    assert capsys.readouterr().out.count("=" * 40) == 3


def test_seq_rejected_for_mamba(tmp_path):
    """--seq on a Mamba checkpoint must fail loud (recurrent prefill cannot
    sequence-shard)."""
    import jax.numpy as jnp

    from mistral_inference_tpu.args import MambaArgs
    from mistral_inference_tpu.loading import save_stacked
    from mistral_inference_tpu.model import Mamba

    args = MambaArgs(
        dim=64, n_layers=2, vocab_size=256, n_groups=2, rms_norm=True,
        residual_in_fp32=True, fused_add_norm=True,
        pad_vocab_size_multiple=16, tie_embeddings=False, d_state=16,
        d_conv=4, expand=2, headdim=16,
    )
    save_stacked(tmp_path / "m", Mamba.random(args, dtype=jnp.bfloat16))
    cfg = tiny_tekken_cfg()
    cfg["config"]["default_vocab_size"] = 256
    cfg["vocab"] = cfg["vocab"][:236]
    (tmp_path / "m" / "tekken.json").write_text(json.dumps(cfg))
    with pytest.raises(AssertionError, match="transformer models only"):
        main(["demo", str(tmp_path / "m"), "--max_tokens", "3", "--seq", "2"])
