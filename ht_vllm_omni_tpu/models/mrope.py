"""M-RoPE: multimodal rotary positions (Qwen2/3-Omni style).

Counterpart of the upstream MRotaryEmbedding the reference patches in
(reference vllm_omni/patch.py swaps MRotaryEmbedding; the runner builds
omni M-RoPE positions from image/video/audio grids,
vllm_omni/worker/gpu_model_runner.py:121 _init_mrope_positions).

Positions are [3, S] (temporal, height, width); the head_dim/2 rotary
frequencies are split into three sections, each indexed by its own
position row.  Text tokens use identical t/h/w positions; an image's
patches share one temporal index with h/w walking the patch grid; text
after multimodal content resumes at max(position) + 1 (the offset the
decode path must keep adding is ``mrope_delta``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mrope_position_ids(
    token_ids: list[int],
    image_token_id: int,
    image_grids: list[tuple[int, int, int]],
) -> tuple[np.ndarray, int]:
    """Build [3, S] positions for a prompt whose image placeholders have
    been expanded to patch tokens.

    image_grids: per image (t, h, w) patch-grid shape; the prompt must
    contain exactly t*h*w consecutive ``image_token_id`` tokens per image.
    Returns (positions [3, S], mrope_delta) with
    mrope_delta = max_position + 1 - S (add to ordinary token positions
    during decode).
    """
    s = len(token_ids)
    pos = np.zeros((3, s), np.int64)
    cur = 0  # next temporal position
    i = 0
    grid_iter = iter(image_grids)
    while i < s:
        if token_ids[i] == image_token_id:
            t, h, w = next(grid_iter)
            n = t * h * w
            tt, hh, ww = np.meshgrid(
                np.arange(t), np.arange(h), np.arange(w), indexing="ij"
            )
            pos[0, i : i + n] = cur + tt.reshape(-1)
            pos[1, i : i + n] = cur + hh.reshape(-1)
            pos[2, i : i + n] = cur + ww.reshape(-1)
            cur = cur + max(t, h, w)
            i += n
        else:
            pos[:, i] = cur
            cur += 1
            i += 1
    delta = int(pos.max()) + 1 - s
    return pos, delta


def mrope_cos_sin(
    positions: jnp.ndarray,  # [3, S]
    head_dim: int,
    theta: float,
    sections: tuple[int, int, int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [S, head_dim] with per-section position rows.

    ``sections`` are half-dim section sizes (sum == head_dim // 2), the HF
    mrope_section convention.
    """
    half = head_dim // 2
    assert sum(sections) == half, (sections, half)
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    # pick which position row drives each frequency index
    row = jnp.concatenate(
        [
            jnp.full((n,), i, jnp.int32)
            for i, n in enumerate(sections)
        ]
    )  # [half]
    pos_per_freq = positions.astype(jnp.float32)[row, :]  # [half, S] ??
    # positions [3, S] indexed by row [half] -> [half, S]; transpose to
    # [S, half]
    freqs = pos_per_freq.T * inv_freq[None, :]  # [S, half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [S, head_dim]
    return jnp.cos(emb), jnp.sin(emb)
