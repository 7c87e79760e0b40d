"""Voice-prompt cache for TTS voice cloning.

Counterpart of the reference VoiceCacheManager (reference vllm_omni/
model_executor/models/qwen3_tts/voice_cache_manager.py:46): per-speaker
conditioning bundles (x-vector speaker embedding, optional reference
codec codes, optional reference mel / text) persisted as safetensors —
deliberately NO pickle on the load path (:119 "no pickle, no RCE") —
with a JSON metadata index tracking cache status per speaker.
"""

from __future__ import annotations

import dataclasses
import json
import os
import threading

import numpy as np


@dataclasses.dataclass
class VoiceClonePromptItem:
    """One conditioning bundle (reference :32)."""

    ref_spk_embedding: np.ndarray          # [enc_emb_dim] x-vector
    ref_code: np.ndarray | None = None     # [T] codec prompt
    ref_mel: np.ndarray | None = None      # [T_mel, mel_dim]
    ref_text: str | None = None
    x_vector_only_mode: bool = False
    icl_mode: bool = False


class VoiceCacheManager:
    def __init__(self, cache_dir: str) -> None:
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        self._meta_path = os.path.join(cache_dir, "metadata.json")
        self._lock = threading.Lock()
        self._meta: dict = {}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self._meta = json.load(f)

    # ------------------------------------------------------------- save
    def save_voice_cache(
        self, speaker: str, items: list[VoiceClonePromptItem]
    ) -> bool:
        from safetensors.numpy import save_file

        tensors: dict[str, np.ndarray] = {
            "__len__": np.asarray(len(items), np.int64)
        }
        metadata: dict[str, str] = {}
        for i, item in enumerate(items):
            pre = f"item_{i}_"
            tensors[pre + "ref_spk_embedding"] = np.asarray(
                item.ref_spk_embedding, np.float32
            )
            if item.ref_code is not None:
                tensors[pre + "ref_code"] = np.asarray(
                    item.ref_code, np.int32
                )
            if item.ref_mel is not None:
                tensors[pre + "ref_mel"] = np.asarray(
                    item.ref_mel, np.float32
                )
            tensors[pre + "flags"] = np.asarray(
                [int(item.x_vector_only_mode), int(item.icl_mode)],
                np.int8,
            )
            if item.ref_text is not None:
                metadata[pre + "ref_text"] = item.ref_text
        path = os.path.join(self.cache_dir, f"{speaker}.safetensors")
        try:
            save_file(tensors, path, metadata=metadata)
        except Exception:
            self._update_meta(speaker, path, "failed")
            return False
        self._update_meta(speaker, path, "ready")
        return True

    # ------------------------------------------------------------- load
    def load_cached_voice_prompt(
        self, speaker: str
    ) -> list[VoiceClonePromptItem] | None:
        info = self._meta.get(speaker)
        if not info or info.get("status") != "ready":
            return None
        path = info["path"]
        if not os.path.exists(path):
            return None
        from safetensors import safe_open

        items: list[VoiceClonePromptItem] = []
        with safe_open(path, framework="numpy") as f:
            meta = f.metadata() or {}
            n = int(f.get_tensor("__len__"))
            keys = set(f.keys())
            for i in range(n):
                pre = f"item_{i}_"
                flags = f.get_tensor(pre + "flags")
                items.append(VoiceClonePromptItem(
                    ref_spk_embedding=f.get_tensor(
                        pre + "ref_spk_embedding"
                    ),
                    ref_code=(
                        f.get_tensor(pre + "ref_code")
                        if pre + "ref_code" in keys else None
                    ),
                    ref_mel=(
                        f.get_tensor(pre + "ref_mel")
                        if pre + "ref_mel" in keys else None
                    ),
                    ref_text=meta.get(pre + "ref_text"),
                    x_vector_only_mode=bool(flags[0]),
                    icl_mode=bool(flags[1]),
                ))
        return items

    # ------------------------------------------------------------ admin
    def list_speakers(self) -> list[str]:
        return sorted(
            s for s, v in self._meta.items() if v.get("status") == "ready"
        )

    def _update_meta(self, speaker: str, path: str, status: str) -> None:
        with self._lock:
            self._meta[speaker] = {"path": path, "status": status}
            tmp = self._meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self._meta, f, indent=1)
            os.replace(tmp, self._meta_path)
