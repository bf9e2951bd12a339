"""Pallas fused Mamba-2 SSD decode step (T == 1).

The reference outsources this exact op to ``mamba_ssm``'s
``selective_state_update`` CUDA kernel (reference: mamba.py:71-86 via
``MambaLMHeadModel.generate`` step path); in this repo rounds 1-3 ran the
decode step through the generic chunked-SSD XLA path (models/mamba.py
``_ssd_chunked`` with T=1), which materializes several state-sized fp32
intermediates per layer per step — measured 411-490 µs/layer-step at
Codestral-Mamba B=8 vs an 82 µs read+write state roofline (5-6x over).
The SSD state is the Mamba analogue of KV-cache traffic — (nh, hd, ds)
fp32 = 4.2 MB per layer per row, read AND written every step, the dominant
HBM term of the decode roofline (bench.py mamba_step_bytes).

This kernel does the whole per-layer step in ONE pass over the state:

    h_new = exp(Δ·A) · h0 + (Δ·x) ⊗ B        (per head; B,C per group)
    y     = Σ_ds h_new · C                    (+ D·x added by the caller)

reading h0 once and writing h_new once. The per-head operands are
precomputed by the caller in XLA and shipped in layouts whose broadcasts
are all from unit minor dims — the only relayouts Mosaic supports
natively. (Two rejected designs, for the record: a lane-vector
``a[:, None, None]`` broadcast is an "unsupported shape cast"; a per-head
fori_loop with mask-reduce selects compiles but serializes to ~683
µs/layer-step, worse than XLA.) The expanded operands total ~1.3 MB per
layer vs 33 MB of state at B=8. The state ref may be fp32 (exact default)
or bf16 (the opt-in ``ssm_dtype`` serving trade, README): the kernel
computes in fp32 and rounds only at the final store, exactly like the XLA
path's astype pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mistral_inference_tpu.ops.pallas.attention import _resolve_interpret


def fused_ssd_step(
    a: jax.Array,  # (B, nh) fp32 — exp(Δ·A), Δ already softplus'ed/masked
    dtx: jax.Array,  # (B, nh, hd) fp32 — Δ·x
    Bm: jax.Array,  # (B, ng, ds) fp32
    Cm: jax.Array,  # (B, ng, ds) fp32
    h0: jax.Array,  # (B, nh, hd, ds) fp32 or bf16 (stored state)
    interpret: bool = None,
):
    """Single-layer convenience wrapper: returns (y (B, nh, hd) fp32,
    h_new same dtype as h0). One kernel serves both entry points — this is
    the stacked kernel over a depth-1 stack, so any numerics or layout fix
    lands in exactly one place (and the test oracle can never diverge from
    the shipped kernel)."""
    y, h_new = fused_ssd_step_stacked(
        a, dtx, Bm, Cm, h0[None], jnp.int32(0), interpret=interpret
    )
    return y, h_new[0]


def _ssd_step_stacked_kernel(li_ref, a_ref, dtx_ref, b_ref, c_ref, h0_ref,
                             h_ref, y_ref):
    """Stacked-state variant: identical math to _ssd_step_kernel; the
    (1, 1, nh, hd, ds) state block is the current layer's slice of the full
    (L, B, nh, hd, ds) stack, selected by the prefetched layer index in the
    BlockSpec index maps and written back IN PLACE (aliased)."""
    h0 = h0_ref[0, 0].astype(jnp.float32)  # (nh, hd, ds)
    dtx_col = jnp.swapaxes(dtx_ref[0], -1, -2)  # (nh, hd, 1)
    hn = h0 * a_ref[0] + dtx_col * b_ref[0]
    h_ref[0, 0] = hn.astype(h_ref.dtype)
    y = jnp.sum(hn * c_ref[0], axis=-1, keepdims=True)
    y_ref[0] = jnp.swapaxes(y, -1, -2)


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(4,))
def fused_ssd_step_stacked(
    a: jax.Array,  # (B, nh) fp32 — exp(Δ·A)
    dtx: jax.Array,  # (B, nh, hd) fp32 — Δ·x
    Bm: jax.Array,  # (B, ng, ds) fp32
    Cm: jax.Array,  # (B, ng, ds) fp32
    ssm: jax.Array,  # (L, B, nh, hd, ds) fp32|bf16 — FULL stacked state, donated
    li: jax.Array,  # () int32 — current layer
    interpret: bool = None,
):
    """Returns (y (B, nh, hd) fp32, updated full state (aliased in place)).

    The per-layer decode state update with the state kept in the scan CARRY
    instead of scan xs: slicing the (L, ...) stack through xs materializes
    a per-layer copy of every state byte (models/mamba.py forward notes the
    same for weights), which at Codestral-Mamba B=8 is ~67 MB of extra HBM
    round-trip per layer per step. Here the stack never moves: the kernel's
    index maps select layer ``li`` (scalar prefetch, megablox convention)
    and the output aliases the input buffer."""
    L, B, nh, hd, ds = ssm.shape
    ng = Bm.shape[1]
    rep = nh // ng
    a4 = a[:, :, None, None]
    dtx4 = dtx[:, :, None, :]  # (B, nh, 1, hd) — lane-dense
    b4 = jnp.repeat(Bm, rep, axis=1)[:, :, None, :]
    c4 = jnp.repeat(Cm, rep, axis=1)[:, :, None, :]
    scalars = jnp.reshape(li.astype(jnp.int32), (1,))

    h_new, y4 = pl.pallas_call(
        _ssd_step_stacked_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, nh, 1, 1), lambda b, sref: (b, 0, 0, 0)),
                pl.BlockSpec((1, nh, 1, hd), lambda b, sref: (b, 0, 0, 0)),
                pl.BlockSpec((1, nh, 1, ds), lambda b, sref: (b, 0, 0, 0)),
                pl.BlockSpec((1, nh, 1, ds), lambda b, sref: (b, 0, 0, 0)),
                pl.BlockSpec(
                    (1, 1, nh, hd, ds),
                    lambda b, sref: (sref[0], b, 0, 0, 0),
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, 1, nh, hd, ds),
                    lambda b, sref: (sref[0], b, 0, 0, 0),
                ),
                pl.BlockSpec((1, nh, 1, hd), lambda b, sref: (b, 0, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(ssm.shape, ssm.dtype),
            jax.ShapeDtypeStruct((B, nh, 1, hd), jnp.float32),
        ],
        # flattened operand indices INCLUDE the scalar-prefetch arg:
        # scalars=0, a4=1, dtx4=2, b4=3, c4=4, ssm=5 → out 0
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_resolve_interpret(interpret),
    )(scalars, a4, dtx4, b4, c4, ssm)
    return y4[:, :, 0, :], h_new
