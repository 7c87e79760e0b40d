"""OmniGen2 transformer (jax).

Follows the reference OmniGen2Transformer2DModel (reference
vllm_omni/diffusion/models/omnigen2/omnigen2_transformer.py): the block
math is the Lumina2 recipe — RMS sandwich norms, shift-free 4-chunk
adaLN with tanh'd gates, per-head-dim RMS q/k norms, interleaved rope —
which this module shares with the Z-Image implementation
(diffusion/models/z_image/transformer.py: _block/_rms/_apply_rope).

OmniGen2-specific pieces implemented here:
- three refiner stages: context (unmodulated), reference-image and
  noise refiners (modulated), then joint blocks over
  [text ; ref images ; noise] (:1012-1100);
- position ids: text at (t, t, t); each image segment at axis-0 offset
  ``pe_shift`` (starting at the caption length, advanced by
  max(H_tokens, W_tokens) per reference image) with (h, w) grids on
  axes 1/2 (:458-512);
- adaLN conditioning is timestep-only (Lumina2 combined embedding,
  min(hidden, 1024) wide), SwiGLU FFN with multiple_of rounding.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.models.z_image import transformer as zt


@dataclass(frozen=True)
class OmniGen2ArchConfig:
    in_channels: int = 16
    patch_size: int = 2
    dim: int = 2520            # hidden_size
    n_layers: int = 32
    n_refiner_layers: int = 2
    n_heads: int = 21
    n_kv_heads: int = 7
    norm_eps: float = 1e-5
    text_feat_dim: int = 2048
    timestep_scale: float = 1000.0
    multiple_of: int = 256
    axes_dims: tuple[int, ...] = (40, 40, 40)
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def adaln_dim(self) -> int:
        return min(self.dim, 1024)

    @property
    def ffn_hidden(self) -> int:
        inner = 4 * self.dim
        m = self.multiple_of
        return m * ((inner + m - 1) // m)

    @classmethod
    def tiny(cls) -> "OmniGen2ArchConfig":
        return cls(
            in_channels=4, dim=24, n_layers=2, n_refiner_layers=1,
            n_heads=4, n_kv_heads=2, text_feat_dim=16, multiple_of=8,
            axes_dims=(2, 2, 2),
        )


def init_params(cfg: OmniGen2ArchConfig, key: jax.Array) -> dict:
    n_blocks = cfg.n_layers + 3 * cfg.n_refiner_layers
    ks = iter(jax.random.split(key, 24 + 12 * n_blocks))

    def w(shape, scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    d = cfg.dim
    pin = cfg.patch_size**2 * cfg.in_channels
    return {
        "x_emb_w": w((pin, d)), "x_emb_b": jnp.zeros((d,)),
        "ref_emb_w": w((pin, d)), "ref_emb_b": jnp.zeros((d,)),
        "cap_norm": jnp.ones((cfg.text_feat_dim,)),
        "cap_w": w((cfg.text_feat_dim, d)), "cap_b": jnp.zeros((d,)),
        "t_w1": w((256, cfg.adaln_dim)),
        "t_b1": jnp.zeros((cfg.adaln_dim,)),
        "t_w2": w((cfg.adaln_dim, cfg.adaln_dim)),
        "t_b2": jnp.zeros((cfg.adaln_dim,)),
        "noise_refiner": [
            zt._block_init(cfg, ks, True)
            for _ in range(cfg.n_refiner_layers)
        ],
        "ref_refiner": [
            zt._block_init(cfg, ks, True)
            for _ in range(cfg.n_refiner_layers)
        ],
        "context_refiner": [
            zt._block_init(cfg, ks, False)
            for _ in range(cfg.n_refiner_layers)
        ],
        "layers": [
            zt._block_init(cfg, ks, True) for _ in range(cfg.n_layers)
        ],
        "final_ada_w": w((cfg.adaln_dim, d)),
        "final_ada_b": jnp.zeros((d,)),
        "final_w": w((d, pin)),
        "final_b": jnp.zeros((pin,)),
    }


def position_ids(
    cfg: OmniGen2ArchConfig,
    cap_len: int,
    ref_grids: tuple[tuple[int, int], ...],
    grid: tuple[int, int],
) -> tuple[np.ndarray, list[np.ndarray], np.ndarray]:
    """(cap_ids, [ref_ids...], img_ids) per the reference scheme."""
    cap = np.tile(np.arange(cap_len, dtype=np.int64)[:, None], (1, 3))
    pe_shift = cap_len
    refs = []
    for ht, wt in ref_grids:
        ids = np.zeros((ht * wt, 3), np.int64)
        gh, gw = np.meshgrid(np.arange(ht), np.arange(wt), indexing="ij")
        ids[:, 0] = pe_shift
        ids[:, 1] = gh.reshape(-1)
        ids[:, 2] = gw.reshape(-1)
        refs.append(ids)
        pe_shift += max(ht, wt)
    ht, wt = grid
    img = np.zeros((ht * wt, 3), np.int64)
    gh, gw = np.meshgrid(np.arange(ht), np.arange(wt), indexing="ij")
    img[:, 0] = pe_shift
    img[:, 1] = gh.reshape(-1)
    img[:, 2] = gw.reshape(-1)
    return cap, refs, img


def _t_embed(cfg: OmniGen2ArchConfig, p, t: jax.Array) -> jax.Array:
    import math

    half = 128
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = (
        cfg.timestep_scale * t.astype(jnp.float32)[:, None] * freqs[None]
    )
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)
    h = jax.nn.silu(emb @ p["t_w1"] + p["t_b1"])
    return h @ p["t_w2"] + p["t_b2"]


def forward(
    cfg: OmniGen2ArchConfig,
    p: dict,
    img_tokens: jax.Array,   # [B, S_img, p*p*C] patchified noise
    cap_feats: jax.Array,    # [B, S_cap, text_feat_dim]
    ref_tokens: jax.Array | None,  # [B, S_ref, p*p*C] or None
    t: jax.Array,            # [B] sigma in [0, 1]
    grid: tuple[int, int],          # static (H_tokens, W_tokens)
    ref_grids: tuple[tuple[int, int], ...] = (),  # static
) -> jax.Array:
    b, s_img, _ = img_tokens.shape
    s_cap = cap_feats.shape[1]
    adaln = _t_embed(cfg, p, t)

    cap_ids, ref_ids, img_ids = position_ids(
        cfg, s_cap, ref_grids, grid
    )
    ccos, csin = zt._rope_tables(cfg, cap_ids)
    icos, isin = zt._rope_tables(cfg, img_ids)

    cap = zt._rms(cap_feats, p["cap_norm"], cfg.norm_eps)
    cap = cap @ p["cap_w"] + p["cap_b"]
    for bp in p["context_refiner"]:
        cap = zt._block(cfg, bp, cap, ccos, csin)

    x = img_tokens @ p["x_emb_w"] + p["x_emb_b"]
    for bp in p["noise_refiner"]:
        x = zt._block(cfg, bp, x, icos, isin, adaln)

    segs = [cap, None, x]
    rope_c = [ccos]
    rope_s = [csin]
    if ref_tokens is not None and ref_grids:
        rids = np.concatenate(ref_ids, axis=0)
        rcos, rsin = zt._rope_tables(cfg, rids)
        r = ref_tokens @ p["ref_emb_w"] + p["ref_emb_b"]
        for bp in p["ref_refiner"]:
            r = zt._block(cfg, bp, r, rcos, rsin, adaln)
        segs[1] = r
        rope_c.append(rcos)
        rope_s.append(rsin)
    rope_c.append(icos)
    rope_s.append(isin)

    uni = jnp.concatenate([s for s in segs if s is not None], axis=1)
    ucos = jnp.concatenate(rope_c, axis=0)
    usin = jnp.concatenate(rope_s, axis=0)
    for bp in p["layers"]:
        uni = zt._block(cfg, bp, uni, ucos, usin, adaln)

    x = uni[:, -s_img:]
    ada = jax.nn.silu(adaln) @ p["final_ada_w"] + p["final_ada_b"]
    scale = 1.0 + ada[:, None]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)) * scale
    return h @ p["final_w"] + p["final_b"]
