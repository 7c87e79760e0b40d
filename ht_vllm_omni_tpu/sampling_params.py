"""Request sampling parameters.

Counterpart of vLLM's SamplingParams as used by the reference pipeline
(reference vllm_omni/inputs/data.py uses upstream SamplingParams for AR
stages plus OmniDiffusionSamplingParams for DiT stages; the diffusion
variant lives in ht_vllm_omni_tpu/diffusion/data.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any


@dataclasses.dataclass
class SamplingParams:
    """Sampling controls for one AR request.

    temperature == 0 means greedy.  ``top_k <= 0`` disables top-k.
    """

    max_tokens: int = 128
    min_tokens: int = 0
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0
    repetition_penalty: float = 1.0
    seed: int | None = None
    stop_token_ids: list[int] = dataclasses.field(default_factory=list)
    ignore_eos: bool = False
    # OpenAI logit_bias: token id -> additive bias in [-100, 100]
    # (sample/sampler.py applies it before candidate selection; at most
    # MAX_LOGIT_BIAS entries ride to the device)
    logit_bias: dict[int, float] | None = None
    # vLLM-style min_p nucleus floor (0 = off): drop candidates whose
    # probability falls under min_p * max_prob after temperature scaling
    min_p: float = 0.0
    # OpenAI penalties over GENERATED tokens (additive; distinct from
    # the multiplicative HF-style repetition_penalty above).  Combining
    # repetition_penalty with presence_penalty makes presence see the
    # prompt too — they share the device seen-mask.
    presence_penalty: float = 0.0
    # frequency_penalty scales with per-token output counts
    # (single-chip stages only — the count matrix rides the
    # single-mesh decode program)
    frequency_penalty: float = 0.0
    # guided decoding (structured outputs, guided/ package): constrain
    # generation to a regex, or to JSON (True = any object, dict = a
    # JSON schema).  Guided requests decode with a 1-step horizon (the
    # host advances the grammar DFA between tokens).
    guided_regex: str | None = None
    guided_json: Any = None
    # Talker-style stages want the per-token hidden states of selected
    # layers forwarded downstream (reference engine_output_type="latent",
    # vllm_omni/engine/arg_utils.py).
    return_hidden_states: bool = False
    # Also attach the hidden states at PROMPT positions to the final
    # output (MammothModa2 text-condition export; requires
    # return_hidden_states and a non-chunked prefill).
    return_prompt_hidden_states: bool = False
    logprobs: int | None = None
    # Constrain sampling to token ids in [lo, hi) (plus stop tokens) —
    # the reference's constant semantic logit mask for codec-token
    # stages (fish_speech_slow_ar.py:_semantic_allowed_mask).  None or
    # hi <= lo disables the window.
    allowed_token_range: tuple[int, int] | None = None
    # MammothModa2 t2i AR-grid constraint (reference mammoth_moda2.py:589
    # _apply_t2i_token_constraints): every (grid_row_width+1)-th emitted
    # token is forced to grid_eol_token_id; intra-row tokens obey
    # allowed_token_range with the EOL token forbidden.  0 disables.
    grid_row_width: int = 0
    grid_eol_token_id: int = -1
    # Free-form per-request payload forwarded between stages (first-class
    # version of the reference's additional_information plumbing).
    extra_args: dict[str, Any] = dataclasses.field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.max_tokens < 1:
            raise ValueError("max_tokens must be >= 1")
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0
