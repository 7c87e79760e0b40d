"""LoRA adapter management for stacked-layer pytrees.

Counterpart of the reference's DiffusionLoRAManager + LoRA-aware linear
layers (reference vllm_omni/diffusion/lora/manager.py:36, lora/layers/)
and the AR-side LoRARequest: adapters are low-rank (A [K, r], B [r, N])
pairs per target weight, stacked across layers like the base params, kept
in an LRU host cache, and activated by merging ``name:lora_a/b/s`` leaves
into the param dict — the model's linear indirection
(models/qwen2._linear) adds ``x @ A @ B * s`` on top of the (possibly
quantized) base matmul, so LoRA composes with INT8/INT4 weights.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

_DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "gate", "up", "down")


@dataclasses.dataclass
class LoRARequest:
    lora_name: str
    lora_path: str | None = None


def init_random_adapter(
    base_params: dict,
    rank: int = 8,
    alpha: float = 16.0,
    targets: tuple[str, ...] = _DEFAULT_TARGETS,
    seed: int = 0,
) -> dict:
    """Random adapter matching a base param dict's stacked shapes."""
    key = jax.random.PRNGKey(seed)
    adapter: dict = {"__scale__": alpha / rank}
    for name in targets:
        w = base_params.get(name)
        if w is None or w.ndim != 3:
            continue
        nl, k, n = w.shape
        key, ka, kb = jax.random.split(key, 3)
        adapter[name + ":lora_a"] = (
            jax.random.normal(ka, (nl, k, rank), jnp.float32) * (k**-0.5)
        ).astype(w.dtype if w.dtype != jnp.int8 else jnp.float32)
        adapter[name + ":lora_b"] = jnp.zeros((nl, rank, n), jnp.float32)
    return adapter


def load_peft_adapter(path: str, num_layers: int) -> dict:
    """Load a HF PEFT-format LoRA checkpoint directory."""
    import glob
    import json
    import os

    from safetensors.numpy import load_file

    cfg_path = os.path.join(path, "adapter_config.json")
    alpha, rank = 16.0, 8
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
        alpha = cfg.get("lora_alpha", alpha)
        rank = cfg.get("r", rank)
    raw: dict[str, np.ndarray] = {}
    for f in glob.glob(os.path.join(path, "*.safetensors")):
        raw.update(load_file(f))

    name_map = {
        "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
        "gate_proj": "gate", "up_proj": "up", "down_proj": "down",
    }
    adapter: dict = {"__scale__": alpha / rank}
    for hf_name, ours in name_map.items():
        a_mats, b_mats = [], []
        for i in range(num_layers):
            a_key = next(
                (
                    k
                    for k in raw
                    if f"layers.{i}." in k
                    and hf_name in k
                    and "lora_A" in k
                ),
                None,
            )
            b_key = (
                a_key.replace("lora_A", "lora_B") if a_key else None
            )
            if a_key is None or b_key not in raw:
                break
            a_mats.append(raw[a_key].T)  # [K, r]
            b_mats.append(raw[b_key].T)  # [r, N]
        if len(a_mats) == num_layers:
            adapter[ours + ":lora_a"] = jnp.asarray(np.stack(a_mats))
            adapter[ours + ":lora_b"] = jnp.asarray(np.stack(b_mats))
    return adapter


class LoRAManager:
    """LRU host cache of adapters + activation onto a param dict."""

    def __init__(self, base_params: dict, max_cached: int = 8) -> None:
        self.base = base_params
        self.max_cached = max_cached
        self._cache: OrderedDict[str, dict] = OrderedDict()
        self.active: str | None = None

    def register(self, name: str, adapter: dict) -> None:
        self._cache[name] = adapter
        self._cache.move_to_end(name)
        while len(self._cache) > self.max_cached:
            evicted, _ = self._cache.popitem(last=False)
            if evicted == self.active:
                self.active = None

    def load(self, request: LoRARequest, num_layers: int) -> None:
        if request.lora_name in self._cache:
            return
        if request.lora_path is None:
            raise ValueError("unknown adapter and no lora_path given")
        self.register(
            request.lora_name,
            load_peft_adapter(request.lora_path, num_layers),
        )

    def params_with(self, name: str | None) -> dict:
        """Base params merged with adapter leaves (None = base only)."""
        if name is None:
            return self.base
        adapter = self._cache[name]
        self._cache.move_to_end(name)
        self.active = name
        merged = dict(self.base)
        scale = adapter.get("__scale__", 1.0)
        for key, val in adapter.items():
            if key == "__scale__":
                continue
            merged[key] = val
        merged["lora_scale"] = jnp.asarray(scale, jnp.float32)
        return merged
