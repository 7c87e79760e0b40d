"""Typed prompt containers.

First-class equivalents of the reference's patched-in prompt types
(reference vllm_omni/inputs/data.py:22-133: OmniTextPrompt /
OmniTokensPrompt / OmniEmbedsPrompt carrying prompt_embeds,
negative_prompt and additional_information).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np


@dataclasses.dataclass
class OmniPrompt:
    """A prompt for any stage.

    Exactly one of ``text`` / ``token_ids`` / ``embeds`` drives the primary
    input; the rest of the fields ride along to whichever stage wants them.
    """

    text: str | None = None
    token_ids: list[int] | None = None
    # [seq, hidden] prompt embeddings, handed between stages (e.g.
    # thinker hidden states consumed by the talker).
    embeds: np.ndarray | None = None
    # Multi-modal raw inputs keyed by modality ("image", "audio", "video").
    multi_modal_data: dict[str, Any] = dataclasses.field(default_factory=dict)
    # Diffusion-style negative prompt.
    negative_text: str | None = None
    negative_token_ids: list[int] | None = None
    # Arbitrary tensor/list payload forwarded between stages.
    additional_information: dict[str, Any] = dataclasses.field(
        default_factory=dict
    )

    def __post_init__(self) -> None:
        if self.text is None and self.token_ids is None and self.embeds is None:
            raise ValueError(
                "OmniPrompt needs one of text / token_ids / embeds"
            )


@dataclasses.dataclass
class ExpandedPrompt:
    """One CFG companion produced by a model's prompt-expansion hook.

    Counterpart of the reference's expanded-prompt records consumed by
    CfgCompanionTracker.expand_prompts (reference
    vllm_omni/entrypoints/cfg_companion_tracker.py:59): the companion runs
    stage 0 as a shadow request whose KV is delivered to the downstream
    stage under ``role`` (e.g. "cfg_text" / "cfg_img" for Bagel).
    """

    prompt: "str | list[int] | OmniPrompt"
    request_id_suffix: str
    role: str


def as_prompt(p: "str | list[int] | OmniPrompt") -> OmniPrompt:
    if isinstance(p, OmniPrompt):
        return p
    if isinstance(p, str):
        return OmniPrompt(text=p)
    if isinstance(p, (list, tuple)):
        return OmniPrompt(token_ids=list(p))
    raise TypeError(f"cannot interpret prompt of type {type(p)}")
