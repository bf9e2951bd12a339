"""Chat / FIM / tool-call request encoding.

The reference delegates all templating to ``mistral-common``'s
``ChatCompletionRequest`` encoders (reference: main.py:141-159); this is a
compact in-repo equivalent covering the instruct, FIM, and function-calling
wire formats used by the supported model families.

Instruct layout (v2/v3 control-token style):
    <s>[INST] user_1 [/INST] assistant_1</s>[INST] user_2 [/INST] ...
Tool calling (v3 wire format, mistral-common InstructTokenizerV3):
    * the last user message is preceded by
      [AVAILABLE_TOOLS]{json list of {"type":"function","function":{...}}}[/AVAILABLE_TOOLS]
    * assistant tool calls carry 9-char alphanumeric ids:
      [TOOL_CALLS][{"name":...,"arguments":{...},"id":"AbCd56789"}]</s>
    * tool results reference the call id:
      [TOOL_RESULTS]{"content":...,"call_id":"AbCd56789"}[/TOOL_RESULTS]
    * tool calls/results from turns BEFORE the last user message are
      dropped (the assistant's final text answer summarizes them).
FIM (Codestral):
    <s>[SUFFIX]{suffix}[PREFIX] {prefix}   → model generates the middle.

Exact token-id goldens for these templates are pinned in
tests/test_chat_golden.py for both SPM-v3 and Tekken specials.
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
    # role == "tool": the id of the call this result answers (v3 wire
    # format requires it in the [TOOL_RESULTS] payload).
    tool_call_id: Optional[str] = None


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
        before_last_user = i < last_user
        if m.role == "user":
            if request.tools and i == last_user:
                tools_json = json.dumps(_wrap_tools(request.tools))
                if use_control:
                    ids += [sp["[AVAILABLE_TOOLS]"]]
                    ids += text(tools_json)
                    ids += [sp["[/AVAILABLE_TOOLS]"]]
                else:
                    ids += text(
                        f"[AVAILABLE_TOOLS]{tools_json}[/AVAILABLE_TOOLS]"
                    )
            if use_control:
                ids += [sp["[INST]"]] + user_content(m.content) + [sp["[/INST]"]]
            else:
                ids += text(f"[INST] {_as_text(m.content)} [/INST]")
        elif m.role == "assistant":
            if m.tool_calls:
                if before_last_user:
                    # v2/v3 convention: tool calls from earlier turns are
                    # not re-tokenized — the assistant's final text answer
                    # already summarizes them.
                    continue
                calls_json = json.dumps(
                    [_prepare_tool_call(c, n) for n, c in enumerate(m.tool_calls)]
                )
                if use_control:
                    ids += [sp["[TOOL_CALLS]"]] + text(calls_json)
                else:
                    ids += text(f"[TOOL_CALLS]{calls_json}")
            else:
                ids += text(_as_text(m.content))
            ids += [tok.eos_id]
        elif m.role == "tool":
            if before_last_user:
                continue
            payload = json.dumps({
                "content": _maybe_json(m.content),
                "call_id": _valid_call_id(m.tool_call_id, 0),
            })
            if use_control:
                ids += [sp["[TOOL_RESULTS]"]] + text(payload) + [sp["[/TOOL_RESULTS]"]]
            else:
                ids += text(f"[TOOL_RESULTS]{payload}[/TOOL_RESULTS]")
        else:
            raise ValueError(f"unsupported role {m.role}")
    return ids, images


_ID_ALPHABET = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def _valid_call_id(call_id: Optional[str], n: int) -> str:
    """v3 tool-call ids are exactly 9 alphanumeric chars. Missing ids get a
    deterministic placeholder (nth call → "call0000n"-style) so encoding is
    reproducible; invalid ids raise rather than silently producing token
    sequences the model never saw."""
    if call_id is None:
        return f"call{n:05d}"
    ok = len(call_id) == 9 and all(c in _ID_ALPHABET for c in call_id)
    if not ok:
        raise ValueError(
            f"tool call id must be 9 alphanumeric chars, got {call_id!r}"
        )
    return call_id


def _maybe_json(x: Any) -> Any:
    """mistral-common parses JSON-looking string payloads into objects
    before re-serializing them inside the wire payload."""
    if isinstance(x, str):
        try:
            return json.loads(x)
        except (ValueError, TypeError):
            return x
    return x


def _prepare_tool_call(call: Dict[str, Any], n: int) -> Dict[str, Any]:
    """Normalize one assistant tool call to the v3 payload shape
    {"name", "arguments" (object), "id" (9-char)}. Accepts both the flat
    form and the OpenAI-style {"function": {...}, "id": ...} nesting."""
    fn = call.get("function", call)
    args = _maybe_json(fn.get("arguments", {}))
    return {
        "name": fn["name"],
        "arguments": args,
        "id": _valid_call_id(call.get("id"), n),
    }


def _wrap_tools(tools: Sequence[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """[AVAILABLE_TOOLS] serializes full Tool objects:
    {"type": "function", "function": {schema}}. Bare function schemas are
    wrapped; already-wrapped tools pass through."""
    out = []
    for t in tools:
        if "function" in t:
            out.append({"type": t.get("type", "function"), "function": t["function"]})
        else:
            out.append({"type": "function", "function": t})
    return out


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
