"""Checkpoint loading: reference weight folders → stacked JAX param pytrees.

Reference contract (transformer.py:297-338): a folder containing
``params.json`` plus exactly one of ``consolidated.safetensors`` or
``consolidated.00.pth``; state-dict keys like
``layers.{i}.attention.wq.weight`` (naming fixed by the reference module
tree, transformer_layers.py:31-121, moe.py:16-22, vision_encoder.py:31-228).

TPU-native differences:
  * Layer weights are **stacked along a leading (L, ...) axis** so the layer
    stack runs as one ``lax.scan`` — the loader gathers the per-layer tensors.
  * torch ``nn.Linear`` stores (out, in); we store (in, out) so application
    is ``x @ w`` (transposed at load).
  * With a mesh, each stacked parameter is placed with its TP/EP
    NamedSharding as it is created — no full replicated copy ever exists.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from mistral_inference_tpu.args import PATCH_MERGE, MambaArgs, TransformerArgs

Params = Dict[str, Any]


def load_raw_state_dict(folder: Union[str, Path]) -> Dict[str, Any]:
    """Load the consolidated checkpoint as a dict of numpy-convertible
    tensors. Exactly one of the two formats must exist
    (reference: transformer.py:321-334)."""
    folder = Path(folder)
    st = folder / "consolidated.safetensors"
    pth = folder / "consolidated.00.pth"
    assert st.is_file() or pth.is_file(), f"no consolidated checkpoint in {folder}"
    assert not (st.is_file() and pth.is_file()), f"both checkpoint formats in {folder}"
    if st.is_file():
        from safetensors import safe_open

        out: Dict[str, Any] = {}
        with safe_open(str(st), framework="np") as f:
            for k in f.keys():
                try:
                    out[k] = f.get_tensor(k)
                except Exception:
                    # bf16 without ml_dtypes-enabled numpy: go through torch
                    import torch
                    from safetensors.torch import load_file

                    return {k: v for k, v in load_file(str(st)).items()}
        return out
    import torch

    return torch.load(str(pth), map_location="cpu", mmap=True, weights_only=True)


def _to_np(t: Any) -> np.ndarray:
    """torch tensor or ndarray → float32/raw numpy."""
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly bf16, which numpy can't represent)
    if t.dtype.__class__.__module__.startswith("torch"):
        import torch

        if t.dtype in (torch.bfloat16, torch.float16):
            t = t.to(torch.float32)
        return t.numpy()
    return np.asarray(t)


class _Placer:
    """Converts host tensors to device arrays, applying the NamedSharding for
    the param's position in the tree when a mesh is given."""

    def __init__(self, dtype: jnp.dtype, mesh, specs: Optional[Params]):
        self.dtype = dtype
        self.mesh = mesh
        self.specs = specs

    def __call__(self, path: tuple, x: np.ndarray) -> jax.Array:
        arr = jnp.asarray(_to_np(x), self.dtype)
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            spec = self.specs
            for k in path:
                spec = spec[k]
            arr = jax.device_put(arr, NamedSharding(self.mesh, spec))
        return arr


STACKED_FORMAT = "mit-stacked-v1"


def _flatten_tree(tree: Params, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten_tree(v, key + "/"))
        else:
            out[key] = v
    return out


def _unflatten_tree(flat: Dict[str, Any]) -> Params:
    tree: Params = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = v
    return tree


def save_stacked(
    folder: Union[str, Path], model, tokenizer_from: Optional[Union[str, Path]] = None
) -> None:
    """Export a (possibly quantized) Transformer to OUR native stacked
    checkpoint format: params.json (with the quant fields, tagged
    ``checkpoint_format``) + consolidated.safetensors holding the stacked
    param pytree under '/'-joined keys — no per-layer gathering, no
    transposes, no quantize pass at load. The reference is load-only
    (SURVEY §5); quantize-once-serve-many is a production need it cannot
    meet: a 7B int4 export loads as 3.6 GB of int8 tensors instead of
    14 GB of bf16 plus an on-device quantization pass."""
    import dataclasses
    import json

    from safetensors.numpy import save_file

    folder = Path(folder)
    folder.mkdir(parents=True, exist_ok=True)
    d = dataclasses.asdict(model.args)
    d["checkpoint_format"] = STACKED_FORMAT
    with open(folder / "params.json", "w") as f:
        json.dump(d, f, indent=1, default=str)

    if tokenizer_from is not None:
        # Self-contained export: carry the tokenizer artifacts over so the
        # folder drops into from_folder/CLI/serving like any checkpoint.
        import shutil

        for name in ("tekken.json",):
            src = Path(tokenizer_from) / name
            if src.exists():
                shutil.copy(src, folder / name)
        for src in Path(tokenizer_from).glob("tokenizer.model*"):
            shutil.copy(src, folder / src.name)

    flat = _flatten_tree(model.params)
    arrays = {}
    for k, v in flat.items():
        a = np.asarray(v)
        if a.dtype == jnp.bfloat16:
            # safetensors.numpy rejects ml_dtypes; store bits, tag via name
            arrays[k + ".bf16bits"] = a.view(np.uint16)
        else:
            arrays[k] = a
    save_file(arrays, str(folder / "consolidated.safetensors"))


def _load_stacked(
    folder: Path, args: TransformerArgs, dtype: jnp.dtype, mesh
) -> Params:
    """Fast path for our native stacked format: keys map 1:1 to the
    pytree, so loading is one flat read + unflatten. Stored dtypes are
    preserved VERBATIM — the export is the exact model state (packed int
    payloads, fp32 scales/SSD params, bf16 weights), so no cast belongs
    here; ``dtype`` only applies when re-exporting a reference checkpoint.
    """
    del dtype, mesh  # mesh placement happens in the model handle
    from safetensors import safe_open

    flat: Dict[str, Any] = {}
    with safe_open(str(folder / "consolidated.safetensors"), framework="np") as f:
        for key in f.keys():
            a = f.get_tensor(key)
            if key.endswith(".bf16bits"):
                key = key[: -len(".bf16bits")]
                a = a.view(jnp.bfloat16)
            flat[key] = jnp.asarray(a)

    return _unflatten_tree(flat)


def load_transformer_params(
    folder: Union[str, Path],
    args: TransformerArgs,
    dtype: jnp.dtype = jnp.bfloat16,
    mesh=None,
) -> Params:
    """Build the params pytree used by models/transformer.py (and the
    ``vision`` subtree used by models/vision.py) from a reference checkpoint
    folder — or from our native stacked export (save_stacked), detected via
    params.json's ``checkpoint_format``."""
    import json as _json

    with open(Path(folder) / "params.json") as f:
        if _json.load(f).get("checkpoint_format") == STACKED_FORMAT:
            # Mesh placement happens in Transformer.__init__ (shard_params),
            # which maps quantized leaves through _match_leaf_specs.
            return _load_stacked(Path(folder), args, dtype, mesh)
    sd = load_raw_state_dict(folder)
    specs = None
    if mesh is not None:
        from mistral_inference_tpu.parallel.sharding import param_specs

        specs = param_specs(moe=args.moe is not None)
        if args.vision_encoder is not None:
            from jax.sharding import PartitionSpec as P

            # Vision runs replicated (it is a tiny fraction of prefill work).
            specs["vision"] = jax.tree_util.tree_map(
                lambda _: P(), _vision_tree_shape(args), is_leaf=lambda x: x is None
            )
    place = _Placer(dtype, mesh, specs)
    L = args.n_layers

    def stack(fmt: str, transpose: bool = True) -> np.ndarray:
        mats = [_to_np(sd[fmt.format(i=i)]) for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats)

    layers: Params = {
        "attention_norm": place(
            ("layers", "attention_norm"),
            np.stack([_to_np(sd[f"layers.{i}.attention_norm.weight"]) for i in range(L)]),
        ),
        "ffn_norm": place(
            ("layers", "ffn_norm"),
            np.stack([_to_np(sd[f"layers.{i}.ffn_norm.weight"]) for i in range(L)]),
        ),
        "attention": {
            w: place(
                ("layers", "attention", w),
                stack(f"layers.{{i}}.attention.{w}.weight"),
            )
            for w in ("wq", "wk", "wv", "wo")
        },
    }

    if args.moe is not None:
        E = args.moe.num_experts
        moe: Params = {
            "gate": place(
                ("layers", "moe", "gate"),
                stack("layers.{i}.feed_forward.gate.weight"),
            )
        }
        for w in ("w1", "w2", "w3"):
            mats = np.stack(
                [
                    np.stack(
                        [
                            _to_np(sd[f"layers.{i}.feed_forward.experts.{e}.{w}.weight"]).T
                            for e in range(E)
                        ]
                    )
                    for i in range(L)
                ]
            )  # (L, E, in, out)
            moe[w] = place(("layers", "moe", w), mats)
        layers["moe"] = moe
    else:
        layers["feed_forward"] = {
            w: place(
                ("layers", "feed_forward", w),
                stack(f"layers.{{i}}.feed_forward.{w}.weight"),
            )
            for w in ("w1", "w2", "w3")
        }

    if args.lora is not None:
        # zero-init live-adapter leaves (reference: lora.py:76-89); adapter
        # tensors load separately via lora.load_lora.
        r = args.lora.rank
        H, Hkv, Dh, D, F = (
            args.n_heads, args.n_kv_heads, args.head_dim, args.dim, args.hidden_dim,
        )

        def zpair(i, o):
            return {
                "a": jnp.zeros((L, i, r), dtype),
                "b": jnp.zeros((L, r, o), dtype),
            }

        layers["attention"]["wq_lora"] = zpair(D, H * Dh)
        layers["attention"]["wk_lora"] = zpair(D, Hkv * Dh)
        layers["attention"]["wv_lora"] = zpair(D, Hkv * Dh)
        layers["attention"]["wo_lora"] = zpair(H * Dh, D)
        if "feed_forward" in layers:
            layers["feed_forward"]["w1_lora"] = zpair(D, F)
            layers["feed_forward"]["w2_lora"] = zpair(F, D)
            layers["feed_forward"]["w3_lora"] = zpair(D, F)

    params: Params = {
        "tok_embeddings": place(("tok_embeddings",), _to_np(sd["tok_embeddings.weight"])),
        "layers": layers,
        "norm": place(("norm",), _to_np(sd["norm.weight"])),
        "output": place(("output",), _to_np(sd["output.weight"]).T),
    }

    if args.vision_encoder is not None:
        params["vision"] = _load_vision(sd, args, place)
    return params


def load_mamba_params(
    folder: Union[str, Path], args: MambaArgs, dtype: jnp.dtype = jnp.bfloat16
) -> Params:
    """mamba_ssm MambaLMHeadModel checkpoint layout → stacked pytree
    (reference: mamba.py:63-83 loads the same file into that module tree).
    SSD parameters (A_log, D, dt_bias) stay float32 — they feed the fp32
    scan regardless of model dtype. Native stacked exports (save_stacked)
    take the flat fast path."""
    import json as _json

    with open(Path(folder) / "params.json") as f:
        if _json.load(f).get("checkpoint_format") == STACKED_FORMAT:
            return _load_stacked(Path(folder), args, dtype, None)
    sd = load_raw_state_dict(folder)
    L = args.n_layers
    pre = "backbone.layers"
    di = args.d_inner
    gd = args.n_groups * args.d_state
    nh = args.n_ssm_heads

    def stack(fmt: str, transpose: bool = False, fp32: bool = False) -> jax.Array:
        mats = [_to_np(sd[fmt.format(i=i)]) for i in range(L)]
        if transpose:
            mats = [m.T for m in mats]
        return jnp.asarray(np.stack(mats), jnp.float32 if fp32 else dtype)

    # mamba_ssm packs in_proj rows as [z | x | B | C | dt] and conv1d
    # channels as [x | B | C]; split into per-segment leaves so TP can shard
    # each on heads/groups (models/mamba.py layout).
    in_proj = np.stack(
        [_to_np(sd[f"{pre}.{i}.mixer.in_proj.weight"]).T for i in range(L)]
    )  # (L, D, d_in_proj)
    conv_w = np.stack(
        [_to_np(sd[f"{pre}.{i}.mixer.conv1d.weight"])[:, 0, :].T for i in range(L)]
    )  # (L, K, conv_dim)
    conv_b = np.stack([_to_np(sd[f"{pre}.{i}.mixer.conv1d.bias"]) for i in range(L)])

    layers: Params = {
        "norm": stack(pre + ".{i}.norm.weight"),
        "z_proj": jnp.asarray(in_proj[..., :di], dtype),
        "x_proj": jnp.asarray(in_proj[..., di : 2 * di], dtype),
        "b_proj": jnp.asarray(in_proj[..., 2 * di : 2 * di + gd], dtype),
        "c_proj": jnp.asarray(in_proj[..., 2 * di + gd : 2 * di + 2 * gd], dtype),
        "dt_proj": jnp.asarray(in_proj[..., 2 * di + 2 * gd :], dtype),
        "conv_w_x": jnp.asarray(conv_w[..., :di], dtype),
        "conv_w_B": jnp.asarray(conv_w[..., di : di + gd], dtype),
        "conv_w_C": jnp.asarray(conv_w[..., di + gd :], dtype),
        "conv_b_x": jnp.asarray(conv_b[..., :di], dtype),
        "conv_b_B": jnp.asarray(conv_b[..., di : di + gd], dtype),
        "conv_b_C": jnp.asarray(conv_b[..., di + gd :], dtype),
        "A_log": stack(pre + ".{i}.mixer.A_log", fp32=True),
        "D": stack(pre + ".{i}.mixer.D", fp32=True),
        "dt_bias": stack(pre + ".{i}.mixer.dt_bias", fp32=True),
        "mixer_norm": stack(pre + ".{i}.mixer.norm.weight"),
        "out_proj": stack(pre + ".{i}.mixer.out_proj.weight", transpose=True),
    }
    assert in_proj.shape[-1] == 2 * di + 2 * gd + nh, (in_proj.shape, di, gd, nh)
    params: Params = {
        "embedding": jnp.asarray(_to_np(sd["backbone.embedding.weight"]), dtype),
        "layers": layers,
        "norm_f": jnp.asarray(_to_np(sd["backbone.norm_f.weight"]), dtype),
    }
    if not args.tie_embeddings:
        params["lm_head"] = jnp.asarray(_to_np(sd["lm_head.weight"]).T, dtype)
    return params


def _vision_tree_shape(args: TransformerArgs) -> Params:
    """Skeleton (None leaves) of the vision subtree, used to build spec
    trees without loading tensors."""
    v = args.vision_encoder
    tree: Params = {
        "patch_conv": None,
        "ln_pre": None,
        "layers": {
            "attention_norm": None,
            "ffn_norm": None,
            "attention": {w: None for w in ("wq", "wk", "wv", "wo")},
            "feed_forward": {w: None for w in ("w1", "w2", "w3")},
        },
        "adapter": {
            "w_in": {"w": None, **({"b": None} if v.adapter_bias else {})},
            "w_out": {"w": None, **({"b": None} if v.adapter_bias else {})},
        },
    }
    if v.mm_projector_id == PATCH_MERGE:
        tree["patch_merger"] = {"w": None}
    if v.add_pre_mm_projector_layer_norm:
        tree["pre_mm_projector_norm"] = None
    return tree


def _load_vision(sd: Dict[str, Any], args: TransformerArgs, place: _Placer) -> Params:
    """Vision keys: ``vision_encoder.*``, ``vision_language_adapter.*``,
    ``patch_merger.*``, ``pre_mm_projector_norm.*``
    (reference: transformer.py:279-283)."""
    v = args.vision_encoder
    Lv = v.num_hidden_layers
    pre = "vision_encoder.transformer.layers"

    def vstack(fmt: str, transpose: bool = True) -> np.ndarray:
        mats = [_to_np(sd[fmt.format(i=i)]) for i in range(Lv)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats)

    vision: Params = {
        # keep torch OIHW conv layout (models/vision.py uses it directly)
        "patch_conv": place(("vision", "patch_conv"), _to_np(sd["vision_encoder.patch_conv.weight"])),
        "ln_pre": place(("vision", "ln_pre"), _to_np(sd["vision_encoder.ln_pre.weight"])),
        "layers": {
            "attention_norm": place(
                ("vision", "layers", "attention_norm"),
                vstack(pre + ".{i}.attention_norm.weight", transpose=False),
            ),
            "ffn_norm": place(
                ("vision", "layers", "ffn_norm"),
                vstack(pre + ".{i}.ffn_norm.weight", transpose=False),
            ),
            "attention": {
                w: place(
                    ("vision", "layers", "attention", w),
                    vstack(pre + ".{i}.attention." + w + ".weight"),
                )
                for w in ("wq", "wk", "wv", "wo")
            },
            "feed_forward": {
                w: place(
                    ("vision", "layers", "feed_forward", w),
                    vstack(pre + ".{i}.feed_forward." + w + ".weight"),
                )
                for w in ("w1", "w2", "w3")
            },
        },
        "adapter": {
            "w_in": {
                "w": place(
                    ("vision", "adapter", "w_in", "w"),
                    _to_np(sd["vision_language_adapter.w_in.weight"]).T,
                )
            },
            "w_out": {
                "w": place(
                    ("vision", "adapter", "w_out", "w"),
                    _to_np(sd["vision_language_adapter.w_out.weight"]).T,
                )
            },
        },
    }
    if v.adapter_bias:
        vision["adapter"]["w_in"]["b"] = place(
            ("vision", "adapter", "w_in", "b"),
            _to_np(sd["vision_language_adapter.w_in.bias"]),
        )
        vision["adapter"]["w_out"]["b"] = place(
            ("vision", "adapter", "w_out", "b"),
            _to_np(sd["vision_language_adapter.w_out.bias"]),
        )
    if v.mm_projector_id == PATCH_MERGE:
        vision["patch_merger"] = {
            "w": place(
                ("vision", "patch_merger", "w"),
                _to_np(sd["patch_merger.merging_layer.weight"]).T,
            )
        }
    if v.add_pre_mm_projector_layer_norm:
        vision["pre_mm_projector_norm"] = place(
            ("vision", "pre_mm_projector_norm"), _to_np(sd["pre_mm_projector_norm.weight"])
        )
    return vision
