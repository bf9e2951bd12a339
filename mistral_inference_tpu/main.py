"""CLI: interactive chat + batch demo (reference: src/mistral_inference/main.py).

    python -m mistral_inference_tpu.main chat <model_path> [--max_tokens N] ...
    python -m mistral_inference_tpu.main demo <model_path> [...]

Differences from the reference CLI:
  * argparse instead of ``fire`` (no extra dependency);
  * no torchrun/rank plumbing — multi-chip runs are single-program GSPMD
    (pass ``--tensor N`` to shard over N devices); the reference's rank-0
    stdin + length-broadcast dance (main.py:161-170) is unnecessary because
    every host runs the same program under ``jax.distributed``;
  * ``--quant int8|int4`` and ``--kv_quant fp8`` expose the quantized
    serving path (new capability).
"""

from __future__ import annotations

import argparse
import logging
import math
from typing import List, Optional

import jax.numpy as jnp

from mistral_inference_tpu.generate import generate, generate_mamba
from mistral_inference_tpu.model import Mamba, Transformer, get_model_cls
from mistral_inference_tpu.tokenizers import ChatRequest, Message, encode_chat, load_tokenizer


def _make_mesh(args, cls):
    """``--tensor N`` → TP-only mesh; ``--tensor auto`` → full
    (data, expert, tensor) mesh over every visible device, factorized by
    auto_factorize from the checkpoint's KV-head / expert counts."""
    if args.tensor == "auto":
        import jax  # noqa: PLC0415

        from mistral_inference_tpu.args import load_args  # noqa: PLC0415
        from mistral_inference_tpu.parallel.mesh import (  # noqa: PLC0415
            auto_factorize,
            make_mesh,
        )

        margs = load_args(args.model_path)
        # TP shards KV heads (transformer) or SSD groups (Mamba —
        # n_ssm_heads and d_inner are group multiples, so a group-divisor
        # tensor degree divides every sharded axis).
        n_kv = margs.n_groups if cls is Mamba else margs.n_kv_heads
        n_exp = margs.moe.num_experts if getattr(margs, "moe", None) else 0
        data, expert, tensor = auto_factorize(
            len(jax.devices()), n_kv_heads=n_kv, n_experts=n_exp
        )
        # data shards the batch: cap it to a divisor of max_batch_size
        # (leftover devices simply go unused — a 3-prompt demo on 8 chips
        # cannot productively data-shard 4 ways).
        data = math.gcd(data, args.max_batch_size)
        return make_mesh(data=data, expert=expert, tensor=tensor)
    tp = int(args.tensor)
    seq = int(getattr(args, "seq", 1))
    if seq > 1:
        assert cls is not Mamba, (
            "--seq applies to transformer models only (Mamba prefill is a "
            "sequential recurrence over tokens — it cannot sequence-shard)"
        )
    if tp > 1 or seq > 1:
        from mistral_inference_tpu.parallel.mesh import make_mesh  # noqa: PLC0415

        return make_mesh(tensor=tp, seq=seq)
    return None


def _load(args):
    cls = get_model_cls(args.model_path)
    mesh = _make_mesh(args, cls)
    kw = dict(max_batch_size=args.max_batch_size, dtype=jnp.bfloat16, mesh=mesh)
    if cls is Transformer:
        # quant applies AFTER LoRA: merging adapters needs dense weights.
        kw.update(kv_quant=args.kv_quant)
    else:
        assert not args.kv_quant, (
            "--kv_quant quantizes the transformer KV cache; Mamba has no KV "
            "cache — its state lever is --ssm_state bf16"
        )
        if getattr(args, "ssm_state", "fp32") == "bf16":
            kw["ssm_dtype"] = jnp.bfloat16
    model = cls.from_folder(args.model_path, **kw)
    if args.lora_path:
        from mistral_inference_tpu.lora import load_lora

        load_lora(model, args.lora_path)
    if args.quant and model.args.quant != args.quant:
        # Same contract as from_folder(quant=...): a pre-quantized native
        # stacked checkpoint is never re-quantized; a MISMATCH errors loud.
        assert model.args.quant == "bf16", (
            f"checkpoint is already {model.args.quant}-quantized; "
            f"cannot re-quantize to {args.quant}"
        )
        model.quantize(args.quant)  # Transformer or Mamba
    if getattr(args, "draft_path", None):
        if args.draft_path in ("lookup", "ngram"):  # draft-free n-gram mode
            model._draft = args.draft_path  # Transformer or Mamba
        else:
            assert cls is Transformer, (
                "draft-model speculation needs a Transformer target; mamba "
                "supports --draft_path lookup (n-gram) only"
            )
            model._draft = Transformer.from_folder(
                args.draft_path, max_batch_size=args.max_batch_size,
                dtype=jnp.bfloat16, mesh=mesh,
            )  # consumed by _generate
    return model


def _generate(model, prompts: List[List[int]], args, eos_id: Optional[int], images=()):
    if isinstance(model, Mamba):
        assert not any(images), "mamba models are text-only"
        return generate_mamba(
            prompts, model, max_tokens=args.max_tokens,
            temperature=args.temperature, eos_id=eos_id,
            draft_model=getattr(model, "_draft", None),
            spec_tokens=getattr(args, "spec_tokens", 8),
        )
    return generate(
        prompts,
        model,
        images=images,
        max_tokens=args.max_tokens,
        temperature=args.temperature,
        eos_id=eos_id,
        draft_model=getattr(model, "_draft", None),
        spec_tokens=getattr(args, "spec_tokens", 4),
    )


def _get_multimodal_input():
    """Text + zero or more image paths → content chunk list
    (reference: main.py:77-99 _get_multimodal_input)."""
    chunks: List = []
    text = input("Text prompt: ")
    if text:
        chunks.append(text)
    print("[You can input zero, one or more images now.]")
    while True:
        path = input("Image path [empty to finish image input]: ")
        if not path:
            break
        from PIL import Image  # noqa: PLC0415

        chunks.append(Image.open(path))
    return chunks


def interactive(args) -> None:
    """Multi-turn chat REPL (reference: main.py:102-200)."""
    tok = load_tokenizer(args.model_path)
    model = _load(args)
    messages: List[Message] = []
    if args.system_prompt:
        messages.append(Message("system", args.system_prompt))

    is_multimodal = (
        isinstance(model, Transformer) and model.args.vision_encoder is not None
    )
    print("Interactive chat. Ctrl-D to exit.")
    while True:
        images: List = []
        try:
            if is_multimodal and args.instruct:
                chunks = _get_multimodal_input()
                if not chunks:
                    continue
                messages.append(Message("user", chunks))
                from mistral_inference_tpu.tokenizers.chat import (  # noqa: PLC0415
                    encode_chat_multimodal,
                )

                ids, images = encode_chat_multimodal(
                    tok, ChatRequest(messages=messages), model.args.vision_encoder
                )
            else:
                user = input("Prompt: ")
                if args.instruct:
                    messages.append(Message("user", user))
                    ids = encode_chat(tok, ChatRequest(messages=messages))
                else:
                    ids = tok.encode(user, bos=True, eos=False)
        except EOFError:
            break
        generated, _ = _generate(
            model, [ids], args, eos_id=tok.eos_id,
            images=[images] if images else (),
        )
        answer = tok.decode(generated[0])
        print(answer)
        print("=" * 40)
        if args.instruct:
            messages.append(Message("assistant", answer))


def demo(args) -> None:
    """Batch demo over three fixed prompts (reference: main.py:203-265)."""
    tok = load_tokenizer(args.model_path)
    model = _load(args)
    prompts = [
        "This is a test",
        "This is another great test",
        "This is a third test, mistral AI is very good at testing. ",
    ]
    encoded = [tok.encode(p, bos=True, eos=False) for p in prompts]
    generated, logprobs = _generate(model, encoded, args, eos_id=None)
    for p, g, lp in zip(prompts, generated, logprobs):
        print(p + tok.decode(g))
        logging.debug("logprobs: %s", lp)
        print("=" * 40)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="mistral_inference_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (("chat", interactive), ("demo", demo)):
        sp = sub.add_parser(name)
        sp.add_argument("model_path")
        sp.add_argument("--max_tokens", type=int, default=35 if name == "demo" else 256)
        sp.add_argument("--temperature", type=float, default=0.0 if name == "demo" else 0.7)
        sp.add_argument("--max_batch_size", type=int, default=3)
        sp.add_argument("--lora_path", default=None)
        sp.add_argument("--quant", choices=["int8", "int4"], default=None)
        sp.add_argument("--kv_quant", choices=["fp8", "int8"], default=None)
        sp.add_argument(
            "--ssm_state", choices=["fp32", "bf16"], default="fp32",
            help="Mamba stored SSD-state dtype; bf16 halves per-slot memory "
            "and state HBM traffic (docs/OPERATIONS.md)",
        )
        sp.add_argument(
            "--draft_path", default=None,
            help="same-vocab draft model folder: enables speculative decoding",
        )
        sp.add_argument("--spec_tokens", type=int, default=4)
        sp.add_argument(
            "--tensor", default="1",
            help="TP degree (GSPMD), or 'auto' to factorize every visible "
            "device into a (data, expert, tensor) mesh from the checkpoint "
            "shape",
        )
        sp.add_argument(
            "--seq", type=int, default=1,
            help="sequence-parallel degree: prefill chunks shard their "
            "token axis over this many devices (long-prompt TTFT; "
            "transformer models only — composes with --tensor N)",
        )
        sp.add_argument("--system_prompt", default=None)
        sp.add_argument("--no-instruct", dest="instruct", action="store_false")
        sp.set_defaults(func=fn, instruct=True)

    qp = sub.add_parser(
        "quantize",
        help="export a quantized native stacked checkpoint "
        "(quantize once, serve many — loads with no bf16 transient)",
    )
    qp.add_argument("model_path")
    qp.add_argument("out_path")
    qp.add_argument("--quant", choices=["int8", "int4"], default="int4")
    qp.add_argument("--group", type=int, default=128)
    qp.add_argument("--kv_quant", choices=["fp8", "int8"], default=None)
    qp.set_defaults(func=quantize_export)
    return p


def quantize_export(args) -> None:
    from mistral_inference_tpu.loading import save_stacked

    cls = get_model_cls(args.model_path)
    kw = dict(dtype=jnp.bfloat16)
    if args.kv_quant:
        assert cls is Transformer, (
            "--kv_quant quantizes the transformer KV cache; Mamba has none"
        )
        kw["kv_quant"] = args.kv_quant
    model = cls.from_folder(args.model_path, **kw)
    model.quantize(args.quant, group=args.group)
    save_stacked(args.out_path, model, tokenizer_from=args.model_path)
    print(f"wrote {args.quant} stacked checkpoint to {args.out_path}")


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    args.func(args)


def mistral_chat() -> None:
    """console script ``mistral-chat <model_path> [...]``
    (reference: pyproject.toml:48-50)."""
    import sys

    main(["chat"] + sys.argv[1:])


def mistral_demo() -> None:
    """console script ``mistral-demo <model_path> [...]``."""
    import sys

    main(["demo"] + sys.argv[1:])


def mistral_quantize() -> None:
    """console script ``mistral-quantize <model_path> <out_path> [...]``."""
    import sys

    main(["quantize"] + sys.argv[1:])


if __name__ == "__main__":
    main()
