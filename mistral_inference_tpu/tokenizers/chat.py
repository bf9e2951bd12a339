"""Chat / FIM / tool-call request encoding.

The reference delegates all templating to ``mistral-common``'s
``ChatCompletionRequest`` encoders (reference: main.py:141-159); this is a
compact in-repo equivalent covering the instruct, FIM, and function-calling
wire formats used by the supported model families.

Instruct layout (v2/v3 control-token style):
    <s>[INST] user_1 [/INST] assistant_1</s>[INST] user_2 [/INST] ...
Tool calling: the last user message is preceded by
    [AVAILABLE_TOOLS]{json}[/AVAILABLE_TOOLS]
FIM (Codestral):
    <s>[SUFFIX]{suffix}[PREFIX] {prefix}   → model generates the middle.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence


@dataclass
class Message:
    role: str  # "system" | "user" | "assistant" | "tool"
    # str for text-only; a list of chunks (str = text, anything else = an
    # image in any form images.decode_image_payload accepts) for multimodal
    # user messages (reference: main.py:77-99 UserMessage(content=chunks)).
    content: Any = ""
    tool_calls: Optional[List[Dict[str, Any]]] = None


@dataclass
class ChatRequest:
    messages: List[Message] = field(default_factory=list)
    tools: Optional[List[Dict[str, Any]]] = None


def _special_ids(tok) -> Dict[str, Optional[int]]:
    def get(name):
        sp = getattr(tok, "special", None)
        try:
            if callable(sp):
                return sp(name)
            if isinstance(sp, dict):
                return sp.get(name)
        except KeyError:
            return None
        return None

    return {name: get(name) for name in (
        "[INST]", "[/INST]", "[AVAILABLE_TOOLS]", "[/AVAILABLE_TOOLS]",
        "[TOOL_RESULTS]", "[/TOOL_RESULTS]", "[TOOL_CALLS]",
        "[PREFIX]", "[SUFFIX]", "[MIDDLE]",
    )}


def encode_chat(tok, request: ChatRequest) -> List[int]:
    """Token ids for a text-only chat request, ending after the final
    ``[/INST]`` so the model generates the assistant reply."""
    ids, images = encode_chat_multimodal(tok, request, vargs=None)
    assert not images
    return ids


def encode_chat_multimodal(tok, request: ChatRequest, vargs=None):
    """(token ids, preprocessed image arrays) for a chat request whose user
    messages may carry image chunks. ``vargs`` (VisionEncoderArgs) is
    required when any images are present — it fixes patch size / resize
    targets and hence the [IMG] grid layout (reference: main.py:150-159
    encode_chat_completion → tokens + images)."""
    sp = _special_ids(tok)
    use_control = sp["[INST]"] is not None
    images: List[Any] = []

    def _as_text(content) -> str:
        assert isinstance(content, str), "chunked content not allowed here"
        return content

    msgs = list(request.messages)
    # fold a leading system prompt into the first user message, newline-joined
    # (mistral-common convention: system + "\n\n" + first user content)
    if msgs and msgs[0].role == "system":
        sys = msgs.pop(0)
        if msgs and msgs[0].role == "user":
            first = msgs[0].content
            if isinstance(first, str):
                msgs[0] = Message("user", _as_text(sys.content) + "\n\n" + first)
            else:
                msgs[0] = Message("user", [_as_text(sys.content) + "\n\n"] + list(first))
        else:
            msgs.insert(0, Message("user", sys.content))

    # find index of last user message (tools are attached in front of it)
    last_user = max(
        (i for i, m in enumerate(msgs) if m.role == "user"), default=-1
    )

    ids: List[int] = [tok.bos_id]

    def text(s: str) -> List[int]:
        # Content is encoded verbatim: SPM's dummy-prefix supplies the
        # word-initial ▁ itself; an explicit leading space would double it.
        return tok.encode(s, bos=False, eos=False)

    def user_content(content) -> List[int]:
        if isinstance(content, str):
            return text(content)
        from mistral_inference_tpu.images import encode_user_content  # noqa: PLC0415

        assert vargs is not None, "image chunks require VisionEncoderArgs"
        cids, cimgs = encode_user_content(tok, vargs, content)
        images.extend(cimgs)
        return cids

    for i, m in enumerate(msgs):
        if m.role == "user":
            if request.tools and i == last_user:
                if use_control:
                    ids += [sp["[AVAILABLE_TOOLS]"]]
                    ids += text(json.dumps(request.tools))
                    ids += [sp["[/AVAILABLE_TOOLS]"]]
                else:
                    ids += text(
                        f"[AVAILABLE_TOOLS]{json.dumps(request.tools)}[/AVAILABLE_TOOLS]"
                    )
            if use_control:
                ids += [sp["[INST]"]] + user_content(m.content) + [sp["[/INST]"]]
            else:
                ids += text(f"[INST] {_as_text(m.content)} [/INST]")
        elif m.role == "assistant":
            if m.tool_calls:
                if use_control:
                    ids += [sp["[TOOL_CALLS]"]] + text(json.dumps(m.tool_calls))
                else:
                    ids += text(f"[TOOL_CALLS]{json.dumps(m.tool_calls)}")
            else:
                ids += text(_as_text(m.content))
            ids += [tok.eos_id]
        elif m.role == "tool":
            payload = json.dumps({"content": m.content})
            if use_control:
                ids += [sp["[TOOL_RESULTS]"]] + text(payload) + [sp["[/TOOL_RESULTS]"]]
            else:
                ids += text(f"[TOOL_RESULTS]{payload}[/TOOL_RESULTS]")
        else:
            raise ValueError(f"unsupported role {m.role}")
    return ids, images


def encode_fim(tok, prefix: str, suffix: str = "") -> List[int]:
    """Fill-in-the-middle prompt (Codestral): generation continues the
    middle after the prefix."""
    sp = _special_ids(tok)
    assert sp["[SUFFIX]"] is not None and sp["[PREFIX]"] is not None, (
        "tokenizer has no FIM control tokens"
    )
    ids = [tok.bos_id, sp["[SUFFIX]"]]
    ids += tok.encode(suffix, bos=False, eos=False)
    ids += [sp["[PREFIX]"]]
    ids += tok.encode(prefix, bos=False, eos=False)
    return ids
