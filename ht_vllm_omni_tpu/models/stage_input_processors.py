"""Stage-to-stage input conversion hooks.

Counterpart of the reference's custom_process_input_func /
custom_process_next_stage_input_func registry (reference
vllm_omni/model_executor/stage_input_processors/): given the upstream
stage's output, build the downstream stage's prompt.  Functions are
resolved by dotted path or short registry name from pipeline YAML.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable

from ht_vllm_omni_tpu.outputs import OmniRequestOutput
from ht_vllm_omni_tpu.inputs import OmniPrompt

# (output, from_stage_cfg, to_stage_cfg) -> OmniPrompt
ProcessFn = Callable[[OmniRequestOutput, Any, Any], OmniPrompt]

_REGISTRY: dict[str, ProcessFn] = {}


def register(name: str) -> Callable[[ProcessFn], ProcessFn]:
    def deco(fn: ProcessFn) -> ProcessFn:
        _REGISTRY[name] = fn
        return fn

    return deco


def resolve(name: str | None) -> ProcessFn:
    if name is None:
        return default_next_stage_input
    if name in _REGISTRY:
        return _REGISTRY[name]
    module, _, attr = name.rpartition(".")
    fn = getattr(importlib.import_module(module), attr)
    _REGISTRY[name] = fn
    return fn


def resolve_optional(name: str | None) -> Callable | None:
    """Like resolve(), but None stays None (used for the optional CFG
    hooks: prompt_expand_func / cfg_kv_collect_func)."""
    return None if name is None else resolve(name)


@register("default_cfg_kv_collect")
def default_cfg_kv_collect(
    parent_id: str, cfg_request_ids: dict, kv_manager, from_stage: int,
    to_stage: int,
) -> dict:
    """Fetch every CFG companion's KV payload from the transfer manager
    and attach them under additional_information["cfg_kv"] keyed by role
    (reference collect_cfg_kv_caches, stage_input_processors/bagel.py:111
    via receive_multi_kv_cache, kv_transfer_manager.py:488)."""
    out = {}
    for role, cid in cfg_request_ids.items():
        payload = kv_manager.get(from_stage, to_stage, cid)
        if payload is None:
            raise RuntimeError(
                f"CFG KV payload missing for companion {cid} (role {role})"
            )
        out[role] = payload
    return {"cfg_kv": out}


@register("default")
def default_next_stage_input(
    output: OmniRequestOutput, from_cfg, to_cfg
) -> OmniPrompt:
    """Tokens (and hidden states, if captured) of the upstream request
    become the downstream prompt."""
    comp = output.outputs[0] if output.outputs else None
    token_ids = list(comp.token_ids) if comp else []
    embeds = comp.hidden_states if comp else None
    return OmniPrompt(
        token_ids=token_ids or None,
        embeds=embeds,
        additional_information={
            "upstream_stage": output.stage_id,
            "upstream_multimodal": output.multimodal_output,
        },
        text="" if not token_ids and embeds is None else None,
    )


@register("qwen3_omni_talker2code2wav")
def qwen3_omni_talker2code2wav(
    output: OmniRequestOutput, from_cfg, to_cfg
) -> OmniPrompt:
    """Talker chunk -> code2wav chunk with residual-codebook expansion.

    The talker emits group-0 codec tokens plus per-token hidden states;
    the MTP code predictor attached to the talker stage
    (from_cfg.runtime["code_predictor"], built by the stage factory)
    expands each into all num_code_groups residual codes (reference
    qwen3_omni_moe_code_predictor_mtp.py).  Codes travel to the vocoder
    as additional_information["codes"] [G, n]."""
    import numpy as np

    comp = output.outputs[0] if output.outputs else None
    tokens = np.asarray(list(comp.token_ids) if comp else [], np.int32)
    hidden = comp.hidden_states if comp else None
    predictor = from_cfg.runtime.get("code_predictor")
    if predictor is not None and hidden is not None and len(tokens):
        codes = predictor.expand(np.asarray(hidden), tokens)  # [n, G]
        codes = np.asarray(codes).T  # [G, n]
    else:
        codes = tokens[None, :]
    return OmniPrompt(
        token_ids=list(tokens) or None,
        additional_information={"codes": codes},
        text="" if not len(tokens) else None,
    )


@register("fish_speech_slow2dac")
def fish_speech_slow2dac(
    output: OmniRequestOutput, from_cfg, to_cfg
) -> OmniPrompt:
    """Slow-AR chunk -> DAC chunk with Fast-AR residual expansion.

    The slow AR emits vocab-space semantic tokens plus per-token hidden
    states; the Fast AR attached to the stage
    (from_cfg.runtime["fast_ar"], built by the stage factory) expands
    each into all num_codebooks residual codes (reference
    fish_speech_fast_ar.py:384).  Non-semantic tokens (e.g. im_end) are
    dropped before expansion; the vocab-space -> codebook offset comes
    from engine_args["semantic_begin_id"]."""
    import numpy as np

    comp = output.outputs[0] if output.outputs else None
    tokens = np.asarray(list(comp.token_ids) if comp else [], np.int32)
    hidden = comp.hidden_states if comp else None
    begin = int(from_cfg.engine_args.get("semantic_begin_id", 0))
    fast = from_cfg.runtime.get("fast_ar")
    if fast is not None:
        end = begin + fast.cfg.vocab_size - 1
    else:
        end = int(from_cfg.engine_args.get("semantic_end_id", 1 << 30))
    keep = (tokens >= begin) & (tokens <= end)
    sem = tokens[keep] - begin
    if fast is not None and hidden is not None and len(sem):
        h = np.asarray(hidden)[keep[: len(hidden)]]
        codes = fast.expand(h, sem).T  # [n_codebooks, n]
    else:
        codes = sem[None, :]
    return OmniPrompt(
        token_ids=[int(t) for t in sem] or None,
        additional_information={"codes": codes},
        text="" if not len(sem) else None,
    )


@register("voxtral_tts_llm2codec")
def voxtral_tts_llm2codec(
    output: OmniRequestOutput, from_cfg, to_cfg
) -> OmniPrompt:
    """Voxtral talker chunk -> codec chunk.

    The talker's forced token stream is audio placeholders (+ final
    EOS); the real per-frame [semantic, acoustic x N] codes are
    regenerated from the exported hidden states by the stage's step
    adapter (from_cfg.runtime["step_adapter"]) with position-keyed flow
    noise, reproducing exactly the codes that fed back in-loop
    (reference voxtral_tts.py:210 tts_postprocess attaches the same
    per-step multimodal codes)."""
    import numpy as np

    comp = output.outputs[0] if output.outputs else None
    tokens = list(comp.token_ids) if comp else []
    hidden = comp.hidden_states if comp else None
    adapter = from_cfg.runtime.get("step_adapter")
    n_prompt = len(output.prompt_token_ids or [])
    if adapter is not None and hidden is not None and len(hidden):
        codes = adapter.expand(
            np.asarray(hidden, np.float32), n_prompt - 1
        ).T  # [K, n]
    else:
        codes = np.asarray(tokens, np.int32)[None, :]
    return OmniPrompt(
        token_ids=[int(t) for t in tokens] or None,
        additional_information={"codes": codes},
        text="" if not tokens else None,
    )


@register("mimo_audio_llm2codec")
def mimo_audio_llm2codec(
    output: OmniRequestOutput, from_cfg, to_cfg
) -> OmniPrompt:
    """MiMo-Audio fused thinker-talker chunk -> code2wav chunk.

    Speech rides only on <|empty|> steps: each such step's hidden state
    regenerates its group_size x channels RVQ patch via the stage's
    step adapter (greedy local decode is deterministic, so the edge
    recompute equals the in-loop feedback codes).  Patches flatten
    frame-major into the channel-major code matrix the codec stage
    expects (the reference flattens col-major with a pad row,
    stage_input_processors/mimo_audio.py:13-46; our connector carries
    the matrix directly)."""
    import numpy as np

    comp = output.outputs[0] if output.outputs else None
    tokens = np.asarray(list(comp.token_ids) if comp else [], np.int32)
    hidden = comp.hidden_states if comp else None
    adapter = from_cfg.runtime.get("step_adapter")
    if adapter is not None and hidden is not None and len(tokens):
        keep = tokens[: len(hidden)] == adapter.acfg.empty_token_id
        h = np.asarray(hidden, np.float32)[keep]
        patches = adapter.expand(h)  # [n, G, C]
        codes = patches.reshape(-1, patches.shape[-1]).T  # [C, n*G]
    else:
        codes = tokens[None, :]
    return OmniPrompt(
        token_ids=[int(t) for t in tokens] or None,
        additional_information={"codes": codes},
        text="" if not len(tokens) else None,
    )


@register("mammoth_ar2dit")
def mammoth_ar2dit(
    output: OmniRequestOutput, from_cfg, to_cfg
) -> OmniPrompt:
    """MammothModa2 AR -> DiT handoff (reference
    stage_input_processors/mammoth_moda2.py:11 ar2dit): the DiT
    conditions on hidden states, not tokens — text-condition rows are
    the PROMPT positions holding plain text (not visual specials, not
    gen-vocab), image-condition rows are the generated positions
    holding gen-vocab tokens (the AR's t2i grid output, EOL rows
    dropped)."""
    import numpy as np

    comp = output.outputs[0] if output.outputs else None
    gen_ids = np.asarray(list(comp.token_ids) if comp else [], np.int64)
    prompt_ids = np.asarray(output.prompt_token_ids or [], np.int64)
    gen_start = int(from_cfg.engine_args.get("gen_vocab_start", 0))
    visual_ids = np.asarray(
        from_cfg.engine_args.get("visual_special_ids", []), np.int64
    )
    info: dict = {}

    ph = getattr(comp, "prompt_hidden_states", None) if comp else None
    if ph is not None and len(prompt_ids):
        ph = np.asarray(ph, np.float32)[: len(prompt_ids)]
        text_mask = prompt_ids[: len(ph)] < gen_start
        if len(visual_ids):
            text_mask &= ~np.isin(prompt_ids[: len(ph)], visual_ids)
        info["text_prompt_embeds"] = ph[text_mask]

    sh = comp.hidden_states if comp else None
    if sh is not None and len(gen_ids) > 1:
        sh = np.asarray(sh, np.float32)
        # hidden AT generated position i (holding gen_ids[i]) is the
        # producing hidden of token i+1; the last token has none
        n = min(len(gen_ids) - 1, len(sh) - 1)
        pos_h = sh[1 : n + 1]
        keep = gen_ids[:n] >= gen_start
        info["image_prompt_embeds"] = pos_h[keep]

    return OmniPrompt(
        text=getattr(output, "prompt_text", None) or "",
        additional_information=info,
    )


@register("glm_image_ar2dit")
def glm_image_ar2dit(
    output: OmniRequestOutput, from_cfg, to_cfg
) -> OmniPrompt:
    """GLM-Image AR -> DiT handoff: the AR's sampled tokens in the
    image-code region become per-patch VQ prior tokens for the
    diffusion stage (reference pipeline_glm_image.py:246-260 —
    prior_token_ids from the AR stage), offset back into codebook
    space via engine_args["image_code_begin_id"]."""
    import numpy as np

    comp = output.outputs[0] if output.outputs else None
    tokens = np.asarray(list(comp.token_ids) if comp else [], np.int64)
    begin = int(from_cfg.engine_args.get("image_code_begin_id", 0))
    size = int(from_cfg.engine_args.get("image_code_size", 1 << 30))
    keep = (tokens >= begin) & (tokens < begin + size)
    prior = tokens[keep] - begin
    return OmniPrompt(
        text=getattr(output, "prompt_text", None) or "",
        additional_information={"prior_tokens": prior},
    )
