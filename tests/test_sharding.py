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
