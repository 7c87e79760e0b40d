"""NextStep-1.1 model (jax): Llama AR trunk + flow-matching patch head.

Follows the reference NextStepModel (reference vllm_omni/diffusion/
models/nextstep_1_1/modeling_nextstep.py, modeling_nextstep_heads.py):

- a Llama decoder generates the image PATCH BY PATCH: each step's
  hidden state (through ``image_out_projector``) conditions a small
  adaLN-MLP flow head that samples the next patch's CONTINUOUS latent
  via an SDE (velocity + score drift + Brownian noise, :253-310
  of the heads file), which feeds back through
  ``image_in_projector`` (+ 2D sincos generation position embeddings)
  as the next AR input;
- CFG runs cond/uncond trunk streams in one batch and combines
  velocities inside the flow loop (cfg_mult=2);
- the whole AR loop is ONE lax.scan with a dense in-scan KV cache —
  sequential by construction, so the cache is a plain [L, B, S, F]
  buffer rather than the paged engine cache.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class NextStepArchConfig:
    # Llama trunk
    vocab_size: int = 128815
    hidden_size: int = 2048
    intermediate_size: int = 8192
    num_hidden_layers: int = 24
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    rope_theta: float = 500000.0
    rms_norm_eps: float = 1e-5
    # image side
    latent_channels: int = 16
    latent_patch_size: int = 1
    base_image_grid_size: int = 64
    # flow head
    fm_head_dim: int = 1536
    fm_head_layers: int = 12

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def token_dim(self) -> int:
        return self.latent_channels * self.latent_patch_size**2

    @classmethod
    def tiny(cls) -> "NextStepArchConfig":
        return cls(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, latent_channels=4,
            base_image_grid_size=8, fm_head_dim=24, fm_head_layers=2,
        )


def init_params(cfg: NextStepArchConfig, key: jax.Array) -> dict:
    L, h, d = cfg.num_hidden_layers, cfg.hidden_size, cfg.head_dim
    nq, nk = cfg.num_attention_heads, cfg.num_key_value_heads
    ks = iter(jax.random.split(key, 32))

    def w(shape, scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    fd = cfg.fm_head_dim
    td = cfg.token_dim
    return {
        "embed": w((cfg.vocab_size, h)),
        "ln1": jnp.ones((L, h)), "ln2": jnp.ones((L, h)),
        "wq": w((L, h, nq * d)), "wk": w((L, h, nk * d)),
        "wv": w((L, h, nk * d)), "wo": w((L, nq * d, h)),
        "wg": w((L, h, cfg.intermediate_size)),
        "wu": w((L, h, cfg.intermediate_size)),
        "wd": w((L, cfg.intermediate_size, h)),
        "norm_f": jnp.ones((h,)),
        "img_in_w": w((td, h)), "img_in_b": jnp.zeros((h,)),
        "img_out_w": w((h, h)), "img_out_b": jnp.zeros((h,)),
        "gen_pos": jnp.asarray(
            _sincos_2d(h, cfg.base_image_grid_size), jnp.float32
        ),
        # flow head (SimpleMLPAdaLN)
        "fh_in_w": w((td, fd)), "fh_in_b": jnp.zeros((fd,)),
        "fh_t_w1": w((256, fd)), "fh_t_b1": jnp.zeros((fd,)),
        "fh_t_w2": w((fd, fd)), "fh_t_b2": jnp.zeros((fd,)),
        "fh_c_w": w((h, fd)), "fh_c_b": jnp.zeros((fd,)),
        "fh_ln": jnp.ones((cfg.fm_head_layers, fd)),
        "fh_ada_w": w((cfg.fm_head_layers, fd, 3 * fd)),
        "fh_ada_b": jnp.zeros((cfg.fm_head_layers, 3 * fd)),
        "fh_w1": w((cfg.fm_head_layers, fd, fd)),
        "fh_b1": jnp.zeros((cfg.fm_head_layers, fd)),
        "fh_w2": w((cfg.fm_head_layers, fd, fd)),
        "fh_b2": jnp.zeros((cfg.fm_head_layers, fd)),
        "fh_fin_ada_w": w((fd, 2 * fd)),
        "fh_fin_ada_b": jnp.zeros((2 * fd,)),
        "fh_fin_w": w((fd, td)), "fh_fin_b": jnp.zeros((td,)),
    }


def _sincos_2d(dim: int, grid: int) -> np.ndarray:
    """2D sincos position table [grid*grid, dim] (reference
    get_2d_sincos_pos_embed)."""
    half = dim // 2

    def one_d(pos):
        omega = 1.0 / (
            10000.0 ** (np.arange(half // 2, dtype=np.float64)
                        / (half / 2.0))
        )
        out = np.einsum("m,d->md", pos.astype(np.float64), omega)
        return np.concatenate([np.sin(out), np.cos(out)], -1)

    gh, gw = np.meshgrid(
        np.arange(grid), np.arange(grid), indexing="ij"
    )
    emb = np.concatenate(
        [one_d(gh.reshape(-1)), one_d(gw.reshape(-1))], -1
    )
    return emb.astype(np.float32)


def _rms(x, w, eps):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (w * (x * jax.lax.rsqrt(v + eps))).astype(x.dtype)


def _rope(pos, dim, theta):
    half = dim // 2
    inv = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    f = pos[..., None].astype(jnp.float32) * inv
    emb = jnp.concatenate([f, f], -1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(x, cos, sin):
    half = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], -1)
    return (xf * cos + rot * sin).astype(x.dtype)


def flow_head_velocity(cfg, p, x, t, c):
    """One velocity eval of the adaLN-MLP head; x [B, td], t [B],
    c [B, H]."""
    fd = cfg.fm_head_dim
    half = 128
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    targ = t.astype(jnp.float32)[:, None] * freqs[None]
    temb = jnp.concatenate([jnp.cos(targ), jnp.sin(targ)], -1)
    temb = jax.nn.silu(temb @ p["fh_t_w1"] + p["fh_t_b1"])
    temb = temb @ p["fh_t_w2"] + p["fh_t_b2"]
    y = temb + (c @ p["fh_c_w"] + p["fh_c_b"])
    h = x @ p["fh_in_w"] + p["fh_in_b"]
    for li in range(cfg.fm_head_layers):
        ada = jax.nn.silu(y) @ p["fh_ada_w"][li] + p["fh_ada_b"][li]
        sh, sc, gate = jnp.split(ada, 3, -1)
        n = _rms(h, p["fh_ln"][li], 1e-6) * (1 + sc) + sh
        n = jax.nn.silu(n @ p["fh_w1"][li] + p["fh_b1"][li])
        h = h + gate * (n @ p["fh_w2"][li] + p["fh_b2"][li])
    ada = jax.nn.silu(y) @ p["fh_fin_ada_w"] + p["fh_fin_ada_b"]
    sh, sc = jnp.split(ada, 2, -1)
    v = jnp.mean(jnp.square(h.astype(jnp.float32)), -1, keepdims=True)
    n = (h * jax.lax.rsqrt(v + 1e-6)) * (1 + sc) + sh
    return n @ p["fh_fin_w"] + p["fh_fin_b"]


def flow_head_sample(
    cfg, p, c, key, cfg_scale, num_steps: int,
    timesteps_shift: float = 1.0, use_cfg: bool | None = None,
):
    """SDE sampling of ONE patch latent (reference FlowMatchingHead
    .sample): c [2B, H] when CFG is active (cond first).  ``use_cfg``
    is the STATIC branch switch; ``cfg_scale`` may be a traced scalar
    (the pipeline's "linear" cfg_schedule varies it per AR step)."""
    if use_cfg is None:
        use_cfg = float(cfg_scale) > 1.0
    nb = c.shape[0] // (2 if use_cfg else 1)
    td = cfg.token_dim
    key, kn = jax.random.split(key)
    x = jax.random.normal(kn, (nb, td), jnp.float32)

    ts = jnp.linspace(0.0, 1.0, num_steps + 1)[:-1]
    ts = ts / (timesteps_shift - (timesteps_shift - 1) * ts)
    ts = jnp.concatenate([ts, jnp.ones((1,))])

    def step(carry, i):
        x, key = carry
        ti, tj = ts[i], ts[i + 1]
        dt = tj - ti
        comb = jnp.concatenate([x] * (2 if use_cfg else 1), 0)
        v = flow_head_velocity(
            cfg, p, comb, jnp.full((comb.shape[0],), ti), c
        ).astype(jnp.float32)
        if use_cfg:
            vc, vu = v[:nb], v[nb:]
            v = vu + cfg_scale * (vc - vu)
        # score-corrected drift + Brownian noise (:290-305)
        alpha_t, sigma_t = ti, 1.0 - ti
        var = sigma_t**2 + alpha_t * sigma_t
        score = (alpha_t * v - x) / jnp.maximum(var, 1e-8)
        drift = v + (1.0 - ti) * score
        key, kw = jax.random.split(key)
        dw = jax.random.normal(kw, x.shape) * jnp.sqrt(
            jnp.maximum(dt, 0.0)
        )
        x = x + drift * dt + jnp.sqrt(2.0 * (1.0 - ti)) * dw
        return (x, key), None

    (x, _), _ = jax.lax.scan(
        step, (x, key), jnp.arange(num_steps)
    )
    return x


def patchify(cfg, lat):
    """[H, W, c] -> [h*w, c*p*p] with per-patch (c, p, q) token layout
    (reference modeling_nextstep.py:173-179)."""
    ps = cfg.latent_patch_size
    hh, ww, c = lat.shape
    h_, w_ = hh // ps, ww // ps
    x = lat.reshape(h_, ps, w_, ps, c)
    x = jnp.einsum("hpwqc->hwcpq", x)
    return x.reshape(h_ * w_, c * ps * ps)


def unpatchify(cfg, toks, h_, w_):
    """[h*w, c*p*p] -> [H, W, c] (reference :181-196)."""
    ps = cfg.latent_patch_size
    c = cfg.latent_channels
    x = toks.reshape(h_, w_, c, ps, ps)
    x = jnp.einsum("hwcpq->hpwqc", x)
    return x.reshape(h_ * ps, w_ * ps, c)


def trunk_forward(cfg, p, x, pos, kv_k, kv_v, kv_len):
    """One-token (or few-token) forward against the dense cache.

    x [B, T, H]; kv_k/kv_v [L, B, S_max, KV]; writes rows
    [kv_len, kv_len+T) and returns (hidden [B, T, H], kv_k, kv_v)."""
    b, tt, hdim = x.shape
    nq, nk, d = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
    )
    eps = cfg.rms_norm_eps
    s_max = kv_k.shape[2]
    cos, sin = _rope(pos, d, cfg.rope_theta)  # [B, T, d]

    h = x
    new_k, new_v = [], []
    for li in range(cfg.num_hidden_layers):
        n = _rms(h, p["ln1"][li], eps)
        q = (n @ p["wq"][li]).reshape(b, tt, nq, d)
        k = (n @ p["wk"][li]).reshape(b, tt, nk, d)
        v = (n @ p["wv"][li]).reshape(b, tt, nk, d)
        q = _apply_rope(q, cos[:, :, None], sin[:, :, None])
        k = _apply_rope(k, cos[:, :, None], sin[:, :, None])
        kk = jax.lax.dynamic_update_slice(
            kv_k[li], k.reshape(b, tt, nk * d), (0, kv_len, 0)
        )
        vv = jax.lax.dynamic_update_slice(
            kv_v[li], v.reshape(b, tt, nk * d), (0, kv_len, 0)
        )
        new_k.append(kk)
        new_v.append(vv)
        kr = kk.reshape(b, s_max, nk, d)
        vr = vv.reshape(b, s_max, nk, d)
        if nq != nk:
            kr = jnp.repeat(kr, nq // nk, 2)
            vr = jnp.repeat(vr, nq // nk, 2)
        scores = jnp.einsum(
            "bthd,bshd->bhts", q.astype(jnp.float32),
            kr.astype(jnp.float32),
        ) / math.sqrt(d)
        # causal over valid rows
        col = jnp.arange(s_max)[None, None, None, :]
        row = (kv_len + jnp.arange(tt))[None, None, :, None]
        scores = jnp.where(col <= row, scores, -1e30)
        o = jnp.einsum(
            "bhts,bshd->bthd", jax.nn.softmax(scores, -1),
            vr.astype(jnp.float32),
        ).reshape(b, tt, nq * d)
        h = h + (o.astype(h.dtype) @ p["wo"][li])
        n = _rms(h, p["ln2"][li], eps)
        h = h + (jax.nn.silu(n @ p["wg"][li]) * (n @ p["wu"][li])) @ (
            p["wd"][li]
        )
    h = _rms(h, p["norm_f"], eps)
    return h, jnp.stack(new_k), jnp.stack(new_v)


def generate_image_latents(
    cfg: NextStepArchConfig,
    p: dict,
    prompt_ids: jax.Array,   # [S_p] (cond)
    uncond_ids: jax.Array,   # [S_p] (uncond; same padded length)
    grid: tuple[int, int],   # static (h_tokens, w_tokens)
    key: jax.Array,
    cfg_scale: float = 3.0,
    flow_steps: int = 8,
    cfg_schedule: str = "constant",
    timesteps_shift: float = 1.0,
) -> jax.Array:
    """AR-generate the image latents [h*w, token_dim].

    ``cfg_schedule="linear"`` anneals the guidance scale from full at
    the first patch down to 1 at the last (reference
    pipeline_nextstep_1_1.py:472-476)."""
    ht, wt = grid
    n_patches = ht * wt
    s_p = prompt_ids.shape[0]
    s_max = s_p + n_patches + 1
    use_cfg = cfg_scale > 1.0
    b = 2 if use_cfg else 1
    nk, d = cfg.num_key_value_heads, cfg.head_dim

    kv_k = jnp.zeros(
        (cfg.num_hidden_layers, b, s_max, nk * d), jnp.float32
    )
    kv_v = jnp.zeros_like(kv_k)

    ids = (
        jnp.stack([prompt_ids, uncond_ids])
        if use_cfg
        else prompt_ids[None]
    )
    x = p["embed"][ids]
    pos = jnp.broadcast_to(jnp.arange(s_p)[None], (b, s_p))
    h, kv_k, kv_v = trunk_forward(cfg, p, x, pos, kv_k, kv_v, 0)
    last = h[:, -1]

    # generation pos-embed rows for the target grid
    side = cfg.base_image_grid_size
    gp = p["gen_pos"].reshape(side, side, -1)[:ht, :wt].reshape(
        n_patches, -1
    )

    def step(carry, i):
        kv_k, kv_v, cond_h, key = carry
        c = cond_h @ p["img_out_w"] + p["img_out_b"]
        key, ks = jax.random.split(key)
        if cfg_schedule == "linear":
            frac = (n_patches - i).astype(jnp.float32) / n_patches
            scale_i = 1.0 + (cfg_scale - 1.0) * frac
        else:
            scale_i = jnp.float32(cfg_scale)
        patch = flow_head_sample(
            cfg, p, c, ks, scale_i, flow_steps,
            timesteps_shift=timesteps_shift, use_cfg=use_cfg,
        )  # [1, td]
        patch_b = jnp.concatenate([patch] * b, 0)
        emb = patch_b @ p["img_in_w"] + p["img_in_b"] + gp[i][None]
        pos_i = jnp.broadcast_to(
            (s_p + i)[None, None], (b, 1)
        )
        h, kv_k, kv_v = trunk_forward(
            cfg, p, emb[:, None], pos_i, kv_k, kv_v, s_p + i
        )
        return (kv_k, kv_v, h[:, 0], key), patch[0]

    (_, _, _, _), patches = jax.lax.scan(
        step, (kv_k, kv_v, last, key), jnp.arange(n_patches)
    )
    return patches  # [n_patches, token_dim]
