"""Diffusion LoRA manager: adapter load + merge into pipeline params.

Counterpart of the reference DiffusionLoRAManager (reference
vllm_omni/diffusion/lora/manager.py:36 — LRU CPU adapter cache +
LoRA-aware parallel linears).  TPU-first design: pipeline weights are
static inputs to compiled programs, so instead of per-call LoRA matmuls
the manager MERGES deltas into the live param leaves
(W' = W + A @ B * alpha/r) when an adapter activates and subtracts the
same delta on deactivate — zero steady-state overhead, no recompile
(shapes unchanged).

Adapter file format: safetensors with keys
``<component>/<param>:lora_a`` ([in, r]) and ``:lora_b`` ([r, out])
addressing the pipeline's own flat param layout (diffusers-format PEFT
checkpoints are converted offline by the loader utilities); scalar
metadata ``alpha``/``r`` set the scale.
"""

from __future__ import annotations

import logging
from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class DiffusionLoRAManager:
    def __init__(self, pipeline, max_cpu_adapters: int = 4) -> None:
        self.pipeline = pipeline
        self.max_cpu_adapters = max_cpu_adapters
        # name -> {key: (A, B, scale)} host-side (LRU)
        self._cache: OrderedDict[str, dict] = OrderedDict()
        self._active: str | None = None
        self._applied: dict[str, np.ndarray] = {}  # key -> delta

    # --------------------------------------------------------------- load
    def load(self, name: str, path: str) -> None:
        """Load an adapter into the host LRU cache."""
        if name in self._cache:
            self._cache.move_to_end(name)
            return
        from safetensors import safe_open

        pairs: dict[str, dict] = {}
        with safe_open(path, framework="numpy") as f:
            meta = f.metadata() or {}
            alpha = float(meta.get("alpha", 1.0))
            r = float(meta.get("r", 0.0))
            for key in f.keys():
                if ":lora_a" in key:
                    base = key.split(":lora_a")[0]
                    pairs.setdefault(base, {})["a"] = f.get_tensor(key)
                elif ":lora_b" in key:
                    base = key.split(":lora_b")[0]
                    pairs.setdefault(base, {})["b"] = f.get_tensor(key)
        adapter = {}
        for base, ab in pairs.items():
            if "a" not in ab or "b" not in ab:
                raise ValueError(f"LoRA pair incomplete for {base}")
            rank = ab["a"].shape[-1]
            scale = (alpha / (r or rank)) if (alpha or r) else 1.0
            adapter[base] = (ab["a"], ab["b"], float(scale))
        self._cache[name] = adapter
        while len(self._cache) > self.max_cpu_adapters:
            evicted, _ = self._cache.popitem(last=False)
            logger.info("evicted LoRA adapter %s", evicted)

    def register(self, name: str, adapter: dict) -> None:
        """Directly register {key: (A, B, scale)} (tests/in-process)."""
        self._cache[name] = adapter
        self._cache.move_to_end(name)
        while len(self._cache) > self.max_cpu_adapters:
            evicted, _ = self._cache.popitem(last=False)
            logger.info("evicted LoRA adapter %s", evicted)

    # ------------------------------------------------------------ activate
    def activate(self, name: str) -> None:
        if name == self._active:
            return
        self.deactivate()
        adapter = self._cache.get(name)
        if adapter is None:
            raise KeyError(f"LoRA adapter {name!r} not loaded")
        self._cache.move_to_end(name)
        for key, (a, b, scale) in adapter.items():
            leaf = self._resolve(key)
            delta = (
                np.asarray(a, np.float32) @ np.asarray(b, np.float32)
            ) * scale
            if delta.shape != leaf.shape:
                raise ValueError(
                    f"LoRA delta shape {delta.shape} != param "
                    f"{leaf.shape} for {key}"
                )
            self._assign(key, leaf + jnp.asarray(delta, leaf.dtype))
            self._applied[key] = delta
        self._active = name

    def deactivate(self) -> None:
        if self._active is None:
            return
        for key, delta in self._applied.items():
            leaf = self._resolve(key)
            self._assign(key, leaf - jnp.asarray(delta, leaf.dtype))
        self._applied = {}
        self._active = None

    @property
    def active(self) -> str | None:
        return self._active

    # ------------------------------------------------------------ plumbing
    def _container(self, key: str):
        comp, _, pname = key.partition("/")
        params = self.pipeline.params
        if pname and comp in params:
            return params[comp], pname
        return params, key

    def _resolve(self, key: str):
        d, k = self._container(key)
        if k not in d:
            raise KeyError(f"pipeline param {key!r} not found")
        return d[k]

    def _assign(self, key: str, value) -> None:
        d, k = self._container(key)
        d[k] = value
        # invalidate compiled closures that captured the old leaves
        fns = getattr(self.pipeline, "_fns", None)
        if isinstance(fns, dict):
            fns.clear()
