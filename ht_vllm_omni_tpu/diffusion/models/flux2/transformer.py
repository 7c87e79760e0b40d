"""Flux2 transformer (jax).

Follows the reference Flux2Transformer2DModel (reference
vllm_omni/diffusion/models/flux2/flux2_transformer.py):

- GLOBAL modulation: one shared SiLU+linear per stream kind produces
  the (shift, scale, gate) sets used by EVERY block of that kind
  (double img: 2 sets, double txt: 2 sets, single: 1 set) — unlike
  Flux1's per-block adaLN (:531-549);
- dual-stream blocks: joint attention over [txt ; img] with separate
  q/k norms per stream, SwiGLU FFNs, no biases anywhere (:383-462);
- single-stream blocks: parallel attention — one fused projection
  emits qkv AND the SwiGLU mlp input; output = linear([attn ; mlp])
  (:223-321), text PREPENDED to the image sequence;
- 4-axis RoPE (theta 2000): image ids (0, h, w, 0), text ids
  (0, 0, 0, seq) (:465-493, pipeline _prepare_latent_ids);
- AdaLayerNormContinuous output head, timestep (and optional guidance)
  x1000 sinusoidal embeddings (:495-533).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.models.flux2.config import Flux2ArchConfig


# ------------------------------------------------------------------ params
def init_params(cfg: Flux2ArchConfig, key: jax.Array) -> dict:
    L, LS = cfg.num_layers, cfg.num_single_layers
    d = cfg.inner_dim
    hd = cfg.attention_head_dim
    mh = int(d * cfg.mlp_ratio)
    ks = iter(jax.random.split(key, 24 + 14 * L + 4 * LS))

    def w(shape, scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    def stack(n, shape, scale=0.02):
        return jax.random.normal(
            next(ks), (n,) + shape, jnp.float32
        ) * scale

    p = {
        "x_in_w": w((cfg.in_channels, d)),
        "ctx_in_w": w((cfg.joint_attention_dim, d)),
        "t_w1": w((256, d)),
        "t_b1": jnp.zeros((d,)),
        "t_w2": w((d, d)),
        "t_b2": jnp.zeros((d,)),
        "mod_img_w": w((d, 6 * d)),
        "mod_txt_w": w((d, 6 * d)),
        "mod_single_w": w((d, 3 * d)),
        # dual-stream blocks (stacked)
        "d_qkv": stack(L, (d, 3 * d)),
        "d_add_qkv": stack(L, (d, 3 * d)),
        "d_qn": jnp.ones((L, hd)),
        "d_kn": jnp.ones((L, hd)),
        "d_add_qn": jnp.ones((L, hd)),
        "d_add_kn": jnp.ones((L, hd)),
        "d_out": stack(L, (d, d)),
        "d_add_out": stack(L, (d, d)),
        "d_ff_in": stack(L, (d, 2 * mh)),
        "d_ff_out": stack(L, (mh, d)),
        "d_ffc_in": stack(L, (d, 2 * mh)),
        "d_ffc_out": stack(L, (mh, d)),
        # single-stream blocks (stacked): fused qkv+mlp projection
        "s_in": stack(LS, (d, 3 * d + 2 * mh)),
        "s_qn": jnp.ones((LS, hd)),
        "s_kn": jnp.ones((LS, hd)),
        "s_out": stack(LS, (d + mh, d)),
        # AdaLayerNormContinuous + projection out
        "out_ada_w": w((d, 2 * d)),
        "out_w": w((d, cfg.in_channels)),
    }
    if cfg.guidance_embeds:
        p["g_w1"] = w((256, d))
        p["g_b1"] = jnp.zeros((d,))
        p["g_w2"] = w((d, d))
        p["g_b2"] = jnp.zeros((d,))
    return p


def load_hf_state(cfg: Flux2ArchConfig, state: dict) -> dict:
    """Map diffusers Flux2Transformer2DModel names onto the jax layout."""

    def g(name):
        return jnp.asarray(np.asarray(state[name], np.float32))

    def qkv(base):
        if f"{base}.to_qkv.weight" in state:
            return g(f"{base}.to_qkv.weight").T
        return jnp.concatenate(
            [g(f"{base}.to_{n}.weight").T for n in ("q", "k", "v")], 1
        )

    def add_qkv(base):
        if f"{base}.to_added_qkv.weight" in state:
            return g(f"{base}.to_added_qkv.weight").T
        return jnp.concatenate(
            [
                g(f"{base}.add_{n}_proj.weight").T
                for n in ("q", "k", "v")
            ],
            1,
        )

    def ffin(base):
        if f"{base}.linear_in.weight" in state:
            return g(f"{base}.linear_in.weight").T
        raise KeyError(base)

    L, LS = cfg.num_layers, cfg.num_single_layers
    stk = lambda fn: jnp.stack([fn(i) for i in range(L)])
    stks = lambda fn: jnp.stack([fn(i) for i in range(LS)])
    tb = "transformer_blocks.{}"
    sb = "single_transformer_blocks.{}"
    p = {
        "x_in_w": g("x_embedder.weight").T,
        "ctx_in_w": g("context_embedder.weight").T,
        "t_w1": g("time_guidance_embed.timestep_embedder.linear_1.weight").T,
        "t_b1": g("time_guidance_embed.timestep_embedder.linear_1.bias"),
        "t_w2": g("time_guidance_embed.timestep_embedder.linear_2.weight").T,
        "t_b2": g("time_guidance_embed.timestep_embedder.linear_2.bias"),
        "mod_img_w": g("double_stream_modulation_img.linear.weight").T,
        "mod_txt_w": g("double_stream_modulation_txt.linear.weight").T,
        "mod_single_w": g("single_stream_modulation.linear.weight").T,
        "d_qkv": stk(lambda i: qkv(tb.format(i) + ".attn")),
        "d_add_qkv": stk(lambda i: add_qkv(tb.format(i) + ".attn")),
        "d_qn": stk(lambda i: g(tb.format(i) + ".attn.norm_q.weight")),
        "d_kn": stk(lambda i: g(tb.format(i) + ".attn.norm_k.weight")),
        "d_add_qn": stk(
            lambda i: g(tb.format(i) + ".attn.norm_added_q.weight")
        ),
        "d_add_kn": stk(
            lambda i: g(tb.format(i) + ".attn.norm_added_k.weight")
        ),
        "d_out": stk(lambda i: g(tb.format(i) + ".attn.to_out.0.weight").T),
        "d_add_out": stk(
            lambda i: g(tb.format(i) + ".attn.to_add_out.weight").T
        ),
        "d_ff_in": stk(lambda i: ffin(tb.format(i) + ".ff")),
        "d_ff_out": stk(
            lambda i: g(tb.format(i) + ".ff.linear_out.weight").T
        ),
        "d_ffc_in": stk(lambda i: ffin(tb.format(i) + ".ff_context")),
        "d_ffc_out": stk(
            lambda i: g(tb.format(i) + ".ff_context.linear_out.weight").T
        ),
        "s_in": stks(
            lambda i: g(sb.format(i) + ".attn.to_qkv_mlp_proj.weight").T
        ),
        "s_qn": stks(lambda i: g(sb.format(i) + ".attn.norm_q.weight")),
        "s_kn": stks(lambda i: g(sb.format(i) + ".attn.norm_k.weight")),
        "s_out": stks(lambda i: g(sb.format(i) + ".attn.to_out.weight").T),
        "out_ada_w": g("norm_out.linear.weight").T,
        "out_w": g("proj_out.weight").T,
    }
    if cfg.guidance_embeds:
        p.update({
            "g_w1": g(
                "time_guidance_embed.guidance_embedder.linear_1.weight"
            ).T,
            "g_b1": g(
                "time_guidance_embed.guidance_embedder.linear_1.bias"
            ),
            "g_w2": g(
                "time_guidance_embed.guidance_embedder.linear_2.weight"
            ).T,
            "g_b2": g(
                "time_guidance_embed.guidance_embedder.linear_2.bias"
            ),
        })
    return p


# ------------------------------------------------------------------- model
def _rms(x, w, eps=1e-5):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (w * (x * jax.lax.rsqrt(v + eps))).astype(x.dtype)


def _ln(x, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _sinus(t, dim=256):
    """diffusers Timesteps(flip_sin_to_cos=True, shift=0): cos first."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)


def rope_tables(cfg: Flux2ArchConfig, ids: np.ndarray):
    """4-axis rope (interleave-duplicated like FluxPosEmbed); ids
    [S, 4] -> (cos, sin) [S, head_dim]."""
    outs_c, outs_s = [], []
    for ax, d_ax in enumerate(cfg.axes_dims_rope):
        inv = 1.0 / (
            cfg.rope_theta
            ** (np.arange(0, d_ax, 2, dtype=np.float64) / d_ax)
        )
        f = np.asarray(ids[:, ax], np.float64)[:, None] * inv[None]
        # duplicate into interleaved pair slots
        c = np.repeat(np.cos(f), 2, axis=-1)
        s = np.repeat(np.sin(f), 2, axis=-1)
        outs_c.append(c.astype(np.float32))
        outs_s.append(s.astype(np.float32))
    return (
        jnp.asarray(np.concatenate(outs_c, -1)),
        jnp.asarray(np.concatenate(outs_s, -1)),
    )


def _rope_apply(x, cos, sin):
    """Interleaved-pair rotary with duplicated tables; x [B,S,H,D],
    cos/sin [S, D]."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    a, b = xf[..., 0::2], xf[..., 1::2]
    rot = jnp.stack([-b, a], -1).reshape(xf.shape)
    out = xf * cos[None, :, None, :] + rot * sin[None, :, None, :]
    return out.astype(orig)


def _attn(cfg, q, k, v):
    hd = cfg.attention_head_dim
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
    att = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", att, v)


def _swiglu(x):
    a, b = jnp.split(x, 2, -1)
    return jax.nn.silu(a) * b


def forward(
    cfg: Flux2ArchConfig,
    params: dict,
    img_tokens: jax.Array,   # [B, S_img, in_channels]
    txt_embeds: jax.Array,   # [B, S_txt, joint_attention_dim]
    timestep: jax.Array,     # [B] sigma in [0, 1]
    guidance: jax.Array | None,
    img_rope: tuple[jax.Array, jax.Array],  # rope_tables(img ids)
    txt_rope: tuple[jax.Array, jax.Array],  # rope_tables(txt ids)
) -> jax.Array:
    p = params
    b, s_img, _ = img_tokens.shape
    s_txt = txt_embeds.shape[1]
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    d = cfg.inner_dim

    temb = jax.nn.silu(_sinus(timestep * 1000.0) @ p["t_w1"] + p["t_b1"])
    temb = temb @ p["t_w2"] + p["t_b2"]
    if cfg.guidance_embeds and guidance is not None:
        ge = jax.nn.silu(_sinus(guidance * 1000.0) @ p["g_w1"] + p["g_b1"])
        temb = temb + (ge @ p["g_w2"] + p["g_b2"])
    silu_t = jax.nn.silu(temb)

    mod_img = jnp.split((silu_t @ p["mod_img_w"])[:, None], 6, -1)
    mod_txt = jnp.split((silu_t @ p["mod_txt_w"])[:, None], 6, -1)
    mod_s = jnp.split((silu_t @ p["mod_single_w"])[:, None], 3, -1)

    img = img_tokens @ p["x_in_w"]
    txt = txt_embeds @ p["ctx_in_w"]

    icos, isin = img_rope
    tcos, tsin = txt_rope
    jcos = jnp.concatenate([tcos, icos], 0)
    jsin = jnp.concatenate([tsin, isin], 0)

    # ------------------------------------------------- dual-stream blocks
    (sh_m, sc_m, g_m, sh_f, sc_f, g_f) = mod_img
    (csh_m, csc_m, cg_m, csh_f, csc_f, cg_f) = mod_txt
    for li in range(cfg.num_layers):
        ni = (1 + sc_m) * _ln(img, cfg.eps) + sh_m
        nt = (1 + csc_m) * _ln(txt, cfg.eps) + csh_m
        q, k, v = jnp.split(ni @ p["d_qkv"][li], 3, -1)
        aq, ak, av = jnp.split(nt @ p["d_add_qkv"][li], 3, -1)
        q = _rms(q.reshape(b, s_img, nh, hd), p["d_qn"][li], cfg.eps)
        k = _rms(k.reshape(b, s_img, nh, hd), p["d_kn"][li], cfg.eps)
        v = v.reshape(b, s_img, nh, hd)
        aq = _rms(aq.reshape(b, s_txt, nh, hd), p["d_add_qn"][li], cfg.eps)
        ak = _rms(ak.reshape(b, s_txt, nh, hd), p["d_add_kn"][li], cfg.eps)
        av = av.reshape(b, s_txt, nh, hd)
        jq = jnp.concatenate([aq, q], 1)
        jk = jnp.concatenate([ak, k], 1)
        jv = jnp.concatenate([av, v], 1)
        jq = _rope_apply(jq, jcos, jsin)
        jk = _rope_apply(jk, jcos, jsin)
        o = _attn(cfg, jq, jk, jv).reshape(b, s_txt + s_img, nh * hd)
        ot, oi = o[:, :s_txt], o[:, s_txt:]
        img = img + g_m * (oi @ p["d_out"][li])
        txt = txt + cg_m * (ot @ p["d_add_out"][li])

        ni = (1 + sc_f) * _ln(img, cfg.eps) + sh_f
        img = img + g_f * (_swiglu(ni @ p["d_ff_in"][li]) @ p["d_ff_out"][li])
        nt = (1 + csc_f) * _ln(txt, cfg.eps) + csh_f
        txt = txt + cg_f * (
            _swiglu(nt @ p["d_ffc_in"][li]) @ p["d_ffc_out"][li]
        )

    # ------------------------------------------------ single-stream blocks
    h = jnp.concatenate([txt, img], 1)
    s_all = s_txt + s_img
    mh = int(d * cfg.mlp_ratio)
    (ssh, ssc, sg) = mod_s
    for li in range(cfg.num_single_layers):
        n = (1 + ssc) * _ln(h, cfg.eps) + ssh
        fused = n @ p["s_in"][li]
        qkv, mlp_in = fused[..., : 3 * d], fused[..., 3 * d :]
        q, k, v = jnp.split(qkv, 3, -1)
        q = _rms(q.reshape(b, s_all, nh, hd), p["s_qn"][li], cfg.eps)
        k = _rms(k.reshape(b, s_all, nh, hd), p["s_kn"][li], cfg.eps)
        v = v.reshape(b, s_all, nh, hd)
        q = _rope_apply(q, jcos, jsin)
        k = _rope_apply(k, jcos, jsin)
        o = _attn(cfg, q, k, v).reshape(b, s_all, nh * hd)
        out = jnp.concatenate([o, _swiglu(mlp_in)], -1) @ p["s_out"][li]
        h = h + sg * out

    img = h[:, s_txt:]
    ada = silu_t @ p["out_ada_w"]
    scale, shift = jnp.split(ada, 2, -1)
    img = _ln(img, cfg.eps) * (1 + scale)[:, None] + shift[:, None]
    return img @ p["out_w"]
