"""Guided decoding (structured outputs): regex / JSON-schema constrained
generation via byte-DFA token masks — the TPU-native analog of the
xgrammar/outlines FSMs behind vLLM's response_format support."""

from ht_vllm_omni_tpu.guided.regex_dfa import DFA, compile_regex
from ht_vllm_omni_tpu.guided.token_mask import GuidedEngine, GuidedMatcher

__all__ = ["DFA", "compile_regex", "GuidedEngine", "GuidedMatcher"]
