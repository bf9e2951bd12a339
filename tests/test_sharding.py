"""GSPMD sharding tests on the 8-virtual-device CPU mesh (conftest.py).

The reference has no equivalent — its only parallelism (pipeline) is
untested (reference: tests/ contain no distributed tests, SURVEY §4). Here
sharded execution must be numerically equivalent to single-device execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mistral_inference_tpu.args import MoeArgs, TransformerArgs
from mistral_inference_tpu.generate import generate
from mistral_inference_tpu.model import Transformer
from mistral_inference_tpu.parallel.mesh import auto_factorize, make_mesh

from test_generate import PROMPTS, tiny_args


def _compare_sharded(args: TransformerArgs, mesh, seed=42, atol=2e-3):
    ref = Transformer.random(args, dtype=jnp.float32, seed=seed)
    shd = Transformer.random(args, dtype=jnp.float32, seed=seed, mesh=mesh)
    gen_ref, lp_ref = generate(PROMPTS, ref, max_tokens=6, temperature=0.0)
    gen_shd, lp_shd = generate(PROMPTS, shd, max_tokens=6, temperature=0.0)
    assert gen_ref == gen_shd
    for a, b in zip(lp_ref, lp_shd):
        np.testing.assert_allclose(a, b, atol=atol, rtol=0)


def test_tp_dp_dense():
    mesh = make_mesh(data=2, tensor=2)
    _compare_sharded(tiny_args(), mesh)


def test_tp_dp_dense_sliding_window():
    mesh = make_mesh(data=2, tensor=2)
    _compare_sharded(tiny_args(sliding_window=4), mesh)


def test_tp_only_full_kv_shard():
    # tensor axis == n_kv_heads: every kv head on its own shard.
    mesh = make_mesh(tensor=2)
    _compare_sharded(tiny_args(), mesh)


def test_ep_tp_moe():
    mesh = make_mesh(data=2, expert=2, tensor=2)
    args = tiny_args(moe=MoeArgs(num_experts=4, num_experts_per_tok=2))
    _compare_sharded(args, mesh)


def test_auto_factorize():
    assert auto_factorize(8, n_kv_heads=8) == (1, 1, 8)
    d, e, t = auto_factorize(8, n_kv_heads=2, n_experts=4)
    assert d * e * t == 8 and t == 2 and e == 4
    assert auto_factorize(1) == (1, 1, 1)


def _compare_sharded_quant(args, mesh, quant, kv_quant=None, group=32, atol=2e-3):
    """Quantization is deterministic, so a quantized model under a mesh must
    produce exactly the tokens (and logprobs to fp tolerance) of the same
    quantized model on one device (VERDICT r1 #5: quant x mesh untested)."""
    ref = Transformer.random(args, dtype=jnp.float32, seed=42)
    shd = Transformer.random(args, dtype=jnp.float32, seed=42, mesh=mesh)
    for m in (ref, shd):
        if kv_quant is not None:
            m.args.kv_quant = kv_quant
        m.quantize(quant, group=group)
    gen_ref, lp_ref = generate(PROMPTS, ref, max_tokens=6, temperature=0.0)
    gen_shd, lp_shd = generate(PROMPTS, shd, max_tokens=6, temperature=0.0)
    assert gen_ref == gen_shd
    for a, b in zip(lp_ref, lp_shd):
        np.testing.assert_allclose(a, b, atol=atol, rtol=0)


def test_tp_dp_int8():
    _compare_sharded_quant(tiny_args(), make_mesh(data=2, tensor=2), "int8")


def test_tp_int4_fp8kv():
    # tensor=2 shards int4 packed-K/2 rows and per-group scale rows; both
    # must reshard consistently with the activations (split-halves packing).
    _compare_sharded_quant(
        tiny_args(), make_mesh(tensor=2), "int4", kv_quant="fp8"
    )


def test_ep_tp_moe_int8():
    args = tiny_args(moe=MoeArgs(num_experts=4, num_experts_per_tok=2))
    _compare_sharded_quant(args, make_mesh(expert=2, tensor=2), "int8")


def test_divisible_spec_fallback():
    """Scale/packed axes that a mesh axis can't split evenly must fall back
    to replication on that axis instead of erroring."""
    from jax.sharding import PartitionSpec as P

    from mistral_inference_tpu.parallel.sharding import _divisible_spec

    mesh = make_mesh(tensor=8)
    x = jnp.zeros((2, 4, 24))  # axis 1 (4 groups) not divisible by tensor=8
    spec = _divisible_spec(x, P(None, "tensor", None), mesh)
    assert spec == P(None, None, None)
    y = jnp.zeros((2, 16, 24))
    spec2 = _divisible_spec(y, P(None, "tensor", None), mesh)
    assert spec2 == P(None, "tensor", None)


def test_ep_tp_moe_dispatch():
    """GShard dispatch path under an expert-sharded mesh must match the
    unsharded dense reference."""
    import dataclasses

    mesh = make_mesh(data=2, expert=2, tensor=2)
    base = tiny_args(moe=MoeArgs(num_experts=4, num_experts_per_tok=2))
    disp = dataclasses.replace(base, moe_impl="dispatch", moe_capacity_factor=4.0)
    ref = Transformer.random(base, dtype=jnp.float32, seed=42)
    shd = Transformer.random(disp, dtype=jnp.float32, seed=42, mesh=mesh)
    gen_ref, lp_ref = generate(PROMPTS, ref, max_tokens=6, temperature=0.0)
    gen_shd, lp_shd = generate(PROMPTS, shd, max_tokens=6, temperature=0.0)
    assert gen_ref == gen_shd
    for a, b in zip(lp_ref, lp_shd):
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=0)


def test_decode_collective_budget():
    """Pin the TP decode step's collective inventory (VERDICT r1 #8).

    The layout contract (parallel/sharding.py) costs exactly two
    all-reduces per layer (attention wo + FFN w2 reductions) and two
    all-gathers per step (dim-sharded embed lookup + vocab-sharded
    logits); anything beyond that means a sharding regression introduced
    resharding collectives. Counts are per compiled program: the layer
    stack is one scan, so per-layer collectives appear ONCE in the HLO.
    """
    from mistral_inference_tpu.parallel.inspect import (
        decode_collective_inventory,
    )

    mesh = make_mesh(tensor=8)
    inv = decode_collective_inventory(
        tiny_args(n_heads=8, n_kv_heads=8), mesh
    )
    assert inv["all-reduce("] + inv["all-reduce-start"] == 2, inv
    assert inv["all-gather("] + inv["all-gather-start"] <= 2, inv
    assert inv["all-to-all"] == 0 and inv["collective-permute"] == 0, inv


def test_ep_collective_budget():
    """Pin the EP dispatch path's collective inventory (VERDICT r2 #8).

    On the expert-sharded mesh GSPMD lowers the capacity-dispatch MoE
    (models/transformer._moe_ffn_dispatch) as ONE all-reduce per program:
    the (E, C, D) expert buffers are E-sharded, every rank scatter-adds
    its tokens into its local shard, and the combine after the expert
    FFNs reduces the gathered outputs. No all-to-all, no
    collective-permute, no reduce-scatter may appear — those would mean
    the dispatch buffers or routing metadata got resharded mid-layer.
    With tensor=2 added, the two Megatron all-reduces (attention wo +
    expert w2 reduction) and the two dim-sharded embed/logits all-gathers
    join the budget. Counts are per compiled program (layers ride one
    scan, so per-layer collectives appear once)."""
    from mistral_inference_tpu.parallel.inspect import (
        decode_collective_inventory,
    )

    a = tiny_args(moe=MoeArgs(num_experts=8, num_experts_per_tok=2))
    a.moe_impl = "dispatch"
    inv = decode_collective_inventory(a, make_mesh(expert=8))
    assert inv["all-reduce("] + inv["all-reduce-start"] == 1, inv
    assert inv["all-to-all"] == 0, inv
    assert inv["reduce-scatter"] == 0 and inv["collective-permute"] == 0, inv

    inv = decode_collective_inventory(a, make_mesh(expert=4, tensor=2))
    assert inv["all-reduce("] + inv["all-reduce-start"] == 3, inv
    assert inv["all-gather("] + inv["all-gather-start"] <= 2, inv
    assert inv["all-to-all"] == 0, inv
    assert inv["reduce-scatter"] == 0 and inv["collective-permute"] == 0, inv


def test_speculative_under_mesh():
    """Speculative decoding with BOTH models sharded (target dp×tp, draft
    same mesh): tokens must equal the single-device speculative run, which
    itself equals plain greedy (tests/test_speculative.py)."""
    from mistral_inference_tpu.speculative import generate_speculative

    mesh = make_mesh(data=2, tensor=2)
    t_args = tiny_args()
    d_args = tiny_args(dim=64, n_layers=1, hidden_dim=128)
    ref_t = Transformer.random(t_args, dtype=jnp.float32, seed=1)
    ref_d = Transformer.random(d_args, dtype=jnp.float32, seed=2)
    shd_t = Transformer.random(t_args, dtype=jnp.float32, seed=1, mesh=mesh)
    shd_d = Transformer.random(d_args, dtype=jnp.float32, seed=2, mesh=mesh)

    plain, _ = generate(PROMPTS, ref_t, max_tokens=6, temperature=0.0)
    a, _ = generate_speculative(
        PROMPTS, ref_t, ref_d, max_tokens=6, spec_tokens=2
    )
    b, _ = generate_speculative(
        PROMPTS, shd_t, shd_d, max_tokens=6, spec_tokens=2
    )
    assert a == plain
    assert b == plain


def test_lookup_speculative_under_mesh():
    from mistral_inference_tpu.speculative import generate_lookup

    mesh = make_mesh(data=2, tensor=2)
    args = tiny_args()
    ref = Transformer.random(args, dtype=jnp.float32, seed=3)
    shd = Transformer.random(args, dtype=jnp.float32, seed=3, mesh=mesh)
    plain, _ = generate(PROMPTS, ref, max_tokens=6, temperature=0.0)
    out, _ = generate_lookup(PROMPTS, shd, max_tokens=6, spec_tokens=2)
    assert out == plain


def test_stacked_export_load_under_mesh(tmp_path):
    """A quantized native stacked export loaded with a mesh must equal the
    single-device load (shard_params maps the packed leaves)."""
    from mistral_inference_tpu.loading import save_stacked
    from mistral_inference_tpu.model import from_folder

    args = tiny_args(kv_quant="fp8")
    model = Transformer.random(args, dtype=jnp.float32, seed=13)
    model.quantize("int8", group=32)
    ref, _ = generate(PROMPTS, model, max_tokens=5, temperature=0.0)

    save_stacked(tmp_path / "x", model)
    shd = from_folder(tmp_path / "x", dtype=jnp.float32,
                      mesh=make_mesh(data=2, tensor=2))
    got, _ = generate(PROMPTS, shd, max_tokens=5, temperature=0.0)
    assert got == ref


def test_mamba_lookup_under_mesh():
    """Mamba prompt-lookup speculation under a dp×tp mesh must equal
    single-device plain greedy decode (the seqlens-masked commit runs
    through the sharded mixer)."""
    from mistral_inference_tpu.generate import generate_mamba
    from mistral_inference_tpu.model import Mamba
    from mistral_inference_tpu.speculative import generate_lookup_mamba

    from test_mamba import tiny_mamba_args

    mesh = make_mesh(data=2, tensor=2)
    args = tiny_mamba_args()
    ref = Mamba.random(args, dtype=jnp.float32, seed=4)
    shd = Mamba.random(args, dtype=jnp.float32, seed=4, mesh=mesh)
    plain, _ = generate_mamba(PROMPTS, ref, max_tokens=6, temperature=0.0)
    out, _ = generate_lookup_mamba(PROMPTS, shd, max_tokens=6, spec_tokens=2)
    assert out == plain


# ---------------------------------------------------------------------------
# Sequence (context) parallelism: prefill-chunk tokens sharded on the seq
# axis. Reference equivalent: none (SURVEY §2.3 — the reference scales
# sequence only by window truncation).
# ---------------------------------------------------------------------------


def test_sp_prefill_matches_single_device():
    """dp×sp×tp mesh: chunk T=4 divides seq=2, so every prefill chunk is
    actually sequence-sharded; decode steps (T=1) replicate over seq.
    Outputs must equal the single-device run exactly."""
    mesh = make_mesh(data=2, seq=2, tensor=2)
    args = tiny_args()
    ref = Transformer.random(args, dtype=jnp.float32, seed=21)
    shd = Transformer.random(args, dtype=jnp.float32, seed=21, mesh=mesh)
    gen_ref, lp_ref = generate(
        PROMPTS, ref, max_tokens=6, temperature=0.0, chunk_size=4
    )
    gen_shd, lp_shd = generate(
        PROMPTS, shd, max_tokens=6, temperature=0.0, chunk_size=4
    )
    assert gen_ref == gen_shd
    for a, b in zip(lp_ref, lp_shd):
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=0)


def test_sp_indivisible_chunk_falls_back():
    """A chunk width seq doesn't divide must silently replicate over seq
    (seq_axis returns None), not error: prompt lengths here are ragged and
    the unchunked prefill width is 9."""
    from mistral_inference_tpu.parallel.sharding import seq_axis

    mesh = make_mesh(seq=2, tensor=2)
    assert seq_axis(mesh, 8) == "seq"
    assert seq_axis(mesh, 9) is None
    assert seq_axis(mesh, 1) is None
    assert seq_axis(None, 8) is None
    args = tiny_args()
    ref = Transformer.random(args, dtype=jnp.float32, seed=22)
    shd = Transformer.random(args, dtype=jnp.float32, seed=22, mesh=mesh)
    gen_ref, _ = generate(PROMPTS, ref, max_tokens=5, temperature=0.0)
    gen_shd, _ = generate(PROMPTS, shd, max_tokens=5, temperature=0.0)
    assert gen_ref == gen_shd


def test_sp_sliding_window_and_fp8():
    """SP prefill over a windowed ring with fp8 KV: the ring replicates
    over seq while the chunk shards — scatter + quantize-on-write must
    stay exact."""
    mesh = make_mesh(seq=4, tensor=2)
    args = tiny_args(sliding_window=4, kv_quant="fp8")
    ref = Transformer.random(args, dtype=jnp.float32, seed=23)
    shd = Transformer.random(args, dtype=jnp.float32, seed=23, mesh=mesh)
    gen_ref, _ = generate(
        PROMPTS, ref, max_tokens=6, temperature=0.0, chunk_size=8
    )
    gen_shd, _ = generate(
        PROMPTS, shd, max_tokens=6, temperature=0.0, chunk_size=8
    )
    assert gen_ref == gen_shd


def test_sp_prefill_collective_budget():
    """Pin the SP prefill collective inventory (regression guard, like
    test_decode_collective_budget): no reduce-scatter / collective-permute,
    and the all-gather + all-to-all counts must not grow — growth would
    mean a sharding change leaked new reshardings into the chunk step.
    Measured on the 8-virtual-CPU mesh at the time the budget was set:
    seq=4 → 1 all-reduce (carry select), 8 all-gathers (chunk K/V + ring
    write), 18 all-to-alls (reshape reshardings of small chunk tensors)."""
    from mistral_inference_tpu.parallel.inspect import (
        prefill_collective_inventory,
    )

    mesh = make_mesh(seq=4)
    inv = prefill_collective_inventory(tiny_args(), mesh, chunk=8)
    assert inv["reduce-scatter"] == 0 and inv["collective-permute"] == 0, inv
    assert inv["all-reduce("] + inv["all-reduce-start"] <= 2, inv
    assert inv["all-gather("] + inv["all-gather-start"] <= 10, inv
    assert inv["all-to-all"] <= 20, inv


# ---------------------------------------------------------------------------
# Pallas kernels under a mesh (r4, parallel/shmap.py): attn_impl="pallas"
# with a mesh runs every kernel per shard via jax.shard_map — batch on
# ``data``, heads / the ring's flat Hkv·D axis on ``tensor``, experts on
# ``expert`` (VERDICT r3 weak #2: rounds 1-3 forced the XLA path under any
# mesh, so the multi-chip north-star config ran none of the kernels).
# MISTRAL_PALLAS_INTERPRET=1 runs the kernels in pallas interpret mode on
# the CPU backend. Greedy tokens must MATCH single-device pallas exactly;
# logprobs to the suite's fp tolerance (on real MXUs the kernels'
# fixed-order K=128 accumulations are bitwise; CPU-interpret dots
# reassociate across tile widths, measured ≤2e-6 per forward).
# ---------------------------------------------------------------------------


def pallas_args(**overrides) -> TransformerArgs:
    """Kernel-shaped tiny model: head_dim 128 (lane width), dims %128."""
    kw = dict(
        dim=256,
        n_layers=2,
        head_dim=128,
        hidden_dim=256,
        n_heads=4,
        n_kv_heads=2,
        norm_eps=1e-5,
        vocab_size=512,
        max_batch_size=4,
        rope_theta=10000.0,
    )
    kw.update(overrides)
    return TransformerArgs(**kw)


def _compare_mesh_pallas(args, mesh, quant=None, kv_quant=None, atol=2e-3):
    ref = Transformer.random(args, dtype=jnp.float32, seed=42, attn_impl="pallas")
    shd = Transformer.random(
        args, dtype=jnp.float32, seed=42, mesh=mesh, attn_impl="pallas"
    )
    for m in (ref, shd):
        if kv_quant:
            m.args.kv_quant = kv_quant
        if quant:
            m.quantize(quant, group=128)
    gen_ref, lp_ref = generate(PROMPTS, ref, max_tokens=6, temperature=0.0)
    gen_shd, lp_shd = generate(PROMPTS, shd, max_tokens=6, temperature=0.0)
    assert gen_ref == gen_shd
    for a, b in zip(lp_ref, lp_shd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=0)


def test_mesh_pallas_dense_int4_int8kv(monkeypatch):
    """North-star decode combo (INT4 weights + INT8 ring) on a dp×tp mesh:
    fused update+attend decode kernel + stacked dequant matmuls, all per
    shard."""
    monkeypatch.setenv("MISTRAL_PALLAS_INTERPRET", "1")
    _compare_mesh_pallas(
        pallas_args(), make_mesh(data=2, tensor=2), quant="int4",
        kv_quant="int8",
    )


def test_mesh_pallas_moe_dispatch(monkeypatch):
    """Mixtral-shaped config on dp×ep×tp: grouped quantized expert kernel
    sharded over the expert axis, fused decode attention over data×tensor."""
    monkeypatch.setenv("MISTRAL_PALLAS_INTERPRET", "1")
    args = pallas_args(
        moe=MoeArgs(num_experts=4, num_experts_per_tok=2), moe_impl="dispatch"
    )
    _compare_mesh_pallas(
        args, make_mesh(data=2, expert=2, tensor=2), quant="int4",
        kv_quant="int8",
    )


def test_mesh_pallas_sp_prefill(monkeypatch):
    """Sequence-parallel prefill chunks through the sharded flash kernels
    (queries on ``seq``, keys whole per shard)."""
    monkeypatch.setenv("MISTRAL_PALLAS_INTERPRET", "1")
    _compare_mesh_pallas(
        pallas_args(), make_mesh(data=2, seq=2, tensor=2), quant="int4",
        kv_quant="int8",
    )


def test_mesh_pallas_lookup_spec(monkeypatch):
    """Speculative lookup serving with the fused in-ring verify kernel
    under a tp mesh (fused_verify_attention_sharded)."""
    monkeypatch.setenv("MISTRAL_PALLAS_INTERPRET", "1")
    from mistral_inference_tpu.server.engine import Engine

    args = pallas_args()
    ref_model = Transformer.random(args, dtype=jnp.float32, seed=33, attn_impl="pallas")
    gen_ref, _ = generate(PROMPTS[:2], ref_model, max_tokens=6, temperature=0.0)

    mesh = make_mesh(tensor=2)
    model = Transformer.random(
        args, dtype=jnp.float32, seed=33, mesh=mesh, attn_impl="pallas"
    )
    eng = Engine(model, batch_size=2, max_seq_len=64, temperature=0.0,
                 draft_model="lookup", spec_tokens=2)
    assert eng._spec_fused, "test must exercise the fused verify path"
    ids = [eng.submit(p, max_tokens=6) for p in PROMPTS[:2]]
    results = eng.run_to_completion()
    for rid, expect in zip(ids, gen_ref):
        assert results[rid] == expect
