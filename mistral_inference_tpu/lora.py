"""LoRA adapter loading (merge-at-load).

Reference: src/mistral_inference/lora.py — ``LoRALoaderMixin.load_lora``
merges ``W += (lora_B @ lora_A) · scaling`` into every dense linear except
the ``output`` head when the model was built without LoraArgs
(lora.py:118-139); adapter files are safetensors with keys like
``layers.{i}.attention.wq.lora_A.weight``.

TPU-native: the merge is pure functional weight math on the stacked (L, ...)
pytree — one vectorized ``A.T @ B.T`` per weight family instead of a module
walk. Merged inference is numerically identical to live adapters, so this is
the complete inference-parity path; live (unmerged) adapters only matter for
training-time freezing, out of inference scope.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Union

import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# weight-family → (pytree path, checkpoint module path template)
_FAMILIES = {
    "wq": (("attention", "wq"), "layers.{i}.attention.wq"),
    "wk": (("attention", "wk"), "layers.{i}.attention.wk"),
    "wv": (("attention", "wv"), "layers.{i}.attention.wv"),
    "wo": (("attention", "wo"), "layers.{i}.attention.wo"),
    "w1": (("feed_forward", "w1"), "layers.{i}.feed_forward.w1"),
    "w2": (("feed_forward", "w2"), "layers.{i}.feed_forward.w2"),
    "w3": (("feed_forward", "w3"), "layers.{i}.feed_forward.w3"),
    "gate": (("moe", "gate"), "layers.{i}.feed_forward.gate"),
}


def load_lora(model, lora_path: Union[str, Path], scaling: float = 2.0) -> None:
    """Load a LoRA adapter file into ``model.params`` in place.

    Reference dispatch (lora.py:116-155): a model built WITHOUT LoraArgs
    merges ``W += (B@A)·scaling`` into dense weights; a model built WITH
    LoraArgs keeps live adapters and loads A/B tensors in place."""
    lora_path = Path(lora_path)
    assert lora_path.is_file(), f"{lora_path} does not exist or is not a file"
    if not hasattr(model.args, "lora"):
        raise TypeError(
            f"LoRA adapters are not supported for {type(model).__name__} models"
        )
    if getattr(model.args, "quant", "bf16") != "bf16" and model.args.lora is None:
        raise ValueError(
            "cannot merge a LoRA adapter into already-quantized weights — "
            "load the adapter first, then quantize()"
        )
    from safetensors.numpy import load_file

    sd = {k: np.asarray(v) for k, v in load_file(str(lora_path)).items()}
    assert all("lora" in k for k in sd), "non-LoRA keys in adapter file"
    if model.args.lora is not None:
        load_live_lora(model.params, sd, model.args.n_layers)
    else:
        model.params = merge_lora(model.params, sd, model.args.n_layers, scaling)


def load_live_lora(params: Params, lora_sd: Dict[str, np.ndarray], n_layers: int) -> None:
    """Fill the ``*_lora`` leaves (a=(L,in,r), b=(L,r,out)) from torch-layout
    adapter tensors (lora_A (r,in), lora_B (out,r)); layers absent from the
    adapter keep their zero init."""
    layers = params["layers"]
    for fam, ((group, leaf), tmpl) in _FAMILIES.items():
        if group not in layers or leaf + "_lora" not in layers[group]:
            continue
        pair = layers[group][leaf + "_lora"]
        a, b = pair["a"], pair["b"]
        for i in range(n_layers):
            a_key = tmpl.format(i=i) + ".lora_A.weight"
            b_key = tmpl.format(i=i) + ".lora_B.weight"
            if b_key not in lora_sd:
                continue
            a = a.at[i].set(jnp.asarray(lora_sd[a_key].T, a.dtype))
            b = b.at[i].set(jnp.asarray(lora_sd[b_key].T, b.dtype))
        pair["a"], pair["b"] = a, b

    # MoE expert adapters: layers.{i}.feed_forward.experts.{e}.w{1,2,3}
    if "moe" in layers:
        moe = layers["moe"]
        for wname in ("w1", "w2", "w3"):
            if wname + "_lora" not in moe:
                continue
            pair = moe[wname + "_lora"]
            a, b = pair["a"], pair["b"]
            E = a.shape[1]
            for i in range(n_layers):
                for e in range(E):
                    base = f"layers.{i}.feed_forward.experts.{e}.{wname}"
                    if base + ".lora_B.weight" not in lora_sd:
                        continue
                    a = a.at[i, e].set(
                        jnp.asarray(lora_sd[base + ".lora_A.weight"].T, a.dtype)
                    )
                    b = b.at[i, e].set(
                        jnp.asarray(lora_sd[base + ".lora_B.weight"].T, b.dtype)
                    )
            pair["a"], pair["b"] = a, b


def merge_lora(
    params: Params, lora_sd: Dict[str, np.ndarray], n_layers: int, scaling: float
) -> Params:
    """W += (A^T B^T)·scaling in the stacked (L, in, out) layout.

    torch stores lora_A (r, in) and lora_B (out, r) with
    ΔW_torch = B @ A (out, in); our weights are transposed, so
    ΔW = (B @ A)^T = A^T B^T. Only weights whose ``lora_B`` key exists are
    touched (reference: lora.py:131-139). The ``output`` head is never
    merged (reference walks nn.Linear modules excluding "output",
    lora.py:125)."""
    layers = dict(params["layers"])

    for fam, ((group, leaf), tmpl) in _FAMILIES.items():
        if group not in layers:
            continue
        stacked = layers[group][leaf]
        dtype = stacked.dtype
        updated = stacked
        touched = False
        for i in range(n_layers):
            b_key = tmpl.format(i=i) + ".lora_B.weight"
            a_key = tmpl.format(i=i) + ".lora_A.weight"
            if b_key not in lora_sd:
                continue
            a = jnp.asarray(lora_sd[a_key], jnp.float32)  # (r, in)
            b = jnp.asarray(lora_sd[b_key], jnp.float32)  # (out, r)
            delta = (a.T @ b.T) * scaling  # (in, out)
            updated = updated.at[i].add(delta.astype(dtype))
            touched = True
        if touched:
            group_d = dict(layers[group])
            group_d[leaf] = updated
            layers[group] = group_d

    # MoE expert linears: layers.{i}.feed_forward.experts.{e}.w{1,2,3}
    if "moe" in layers and any(".experts." in k for k in lora_sd):
        moe = dict(layers["moe"])
        E = moe["w1"].shape[1]
        for w in ("w1", "w2", "w3"):
            stacked = moe[w]
            dtype = stacked.dtype
            updated = stacked
            touched = False
            for i in range(n_layers):
                for e in range(E):
                    base = f"layers.{i}.feed_forward.experts.{e}.{w}"
                    if base + ".lora_B.weight" not in lora_sd:
                        continue
                    a = jnp.asarray(lora_sd[base + ".lora_A.weight"], jnp.float32)
                    b = jnp.asarray(lora_sd[base + ".lora_B.weight"], jnp.float32)
                    updated = updated.at[i, e].add(((a.T @ b.T) * scaling).astype(dtype))
                    touched = True
            if touched:
                moe[w] = updated
        layers["moe"] = moe

    out = dict(params)
    out["layers"] = layers
    return out
