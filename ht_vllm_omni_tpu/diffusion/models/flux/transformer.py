"""Flux transformer in jax: dual-stream MMDiT blocks + single-stream
blocks.

Semantics follow the reference FluxTransformer2DModel (reference
vllm_omni/diffusion/models/flux/flux_transformer.py:450-700): the
conditioning vector sums sinusoidal timestep, (optional) sinusoidal
guidance, and the pooled CLIP projection — each through its own MLP;
19 dual-stream blocks run joint [txt || img] attention with per-stream
AdaLN-zero modulation (shared structure with the Qwen-Image MMDiT, whose
block helpers this module reuses); 38 single-stream blocks then process
the concatenated sequence with a fused attention+MLP residual; an
AdaLN-continuous head projects the image tokens.

Both block families are stacked on a leading axis and run under
``lax.scan``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.models.flux.config import FluxArchConfig
from ht_vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
    _layer_norm,
    _mlp_gelu,
    _modulate,
    apply_rope_interleaved,
)
from ht_vllm_omni_tpu.models.layers import rms_norm
from ht_vllm_omni_tpu.ops.flash_attention import flash_attention


def _dt(cfg: FluxArchConfig):
    return jnp.dtype(cfg.dtype)


def init_params(cfg: FluxArchConfig, key: jax.Array) -> dict:
    dt = _dt(cfg)
    d = cfg.inner_dim
    nl, ns = cfg.num_layers, cfg.num_single_layers
    hd = cfg.attention_head_dim
    jd = cfg.joint_attention_dim
    mlp = 4 * d
    keys = iter(jax.random.split(key, 48))

    def w(shape, scale=None):
        scale = scale or (1.0 / math.sqrt(shape[-2] if len(shape) > 1 else 1))
        return (
            jax.random.normal(next(keys), shape, jnp.float32) * scale
        ).astype(dt)

    def z(shape):
        return jnp.zeros(shape, dt)

    p = {
        "img_in_w": w((cfg.in_channels, d)), "img_in_b": z((d,)),
        "txt_in_w": w((jd, d)), "txt_in_b": z((d,)),
        "t_emb_w1": w((256, d)), "t_emb_b1": z((d,)),
        "t_emb_w2": w((d, d)), "t_emb_b2": z((d,)),
        "pool_w1": w((cfg.pooled_projection_dim, d)), "pool_b1": z((d,)),
        "pool_w2": w((d, d)), "pool_b2": z((d,)),
        "norm_out_w": w((d, 2 * d)), "norm_out_b": z((2 * d,)),
        "proj_out_w": w((d, cfg.out_channels)),
        "proj_out_b": z((cfg.out_channels,)),
    }
    if cfg.guidance_embeds:
        p["g_emb_w1"] = w((256, d))
        p["g_emb_b1"] = z((d,))
        p["g_emb_w2"] = w((d, d))
        p["g_emb_b2"] = z((d,))
    # dual-stream blocks (same layout as the Qwen-Image MMDiT block)
    for s in ("img", "txt"):
        p[f"{s}_mod_w"] = w((nl, d, 6 * d))
        p[f"{s}_mod_b"] = z((nl, 6 * d))
        p[f"{s}_qkv_w"] = w((nl, d, 3 * d))
        p[f"{s}_qkv_b"] = z((nl, 3 * d))
        p[f"{s}_q_norm"] = jnp.ones((nl, hd), dt)
        p[f"{s}_k_norm"] = jnp.ones((nl, hd), dt)
        p[f"{s}_attn_out_w"] = w((nl, d, d))
        p[f"{s}_attn_out_b"] = z((nl, d))
        p[f"{s}_mlp_w1"] = w((nl, d, mlp))
        p[f"{s}_mlp_b1"] = z((nl, mlp))
        p[f"{s}_mlp_w2"] = w((nl, mlp, d))
        p[f"{s}_mlp_b2"] = z((nl, d))
    # single-stream blocks: AdaLN-zero-single (3 mods), fused qkv+mlp_in,
    # one output projection over [attn || gelu(mlp)]
    p.update(
        {
            "s_mod_w": w((ns, d, 3 * d)),
            "s_mod_b": z((ns, 3 * d)),
            "s_qkv_w": w((ns, d, 3 * d)),
            "s_qkv_b": z((ns, 3 * d)),
            "s_q_norm": jnp.ones((ns, hd), dt),
            "s_k_norm": jnp.ones((ns, hd), dt),
            "s_mlp_w": w((ns, d, 4 * d)),
            "s_mlp_b": z((ns, 4 * d)),
            "s_out_w": w((ns, 5 * d, d)),
            "s_out_b": z((ns, d)),
        }
    )
    return p


_DUAL_PREFIXES = (
    "img_mod", "txt_mod", "img_qkv", "txt_qkv", "img_q_norm", "img_k_norm",
    "txt_q_norm", "txt_k_norm", "img_attn_out", "txt_attn_out",
    "img_mlp", "txt_mlp",
)
_SINGLE_KEYS = (
    "s_mod_w", "s_mod_b", "s_qkv_w", "s_qkv_b", "s_q_norm", "s_k_norm",
    "s_mlp_w", "s_mlp_b", "s_out_w", "s_out_b",
    # sharded layout replaces s_out_w with the two row-parallel halves
    "s_out_attn_w", "s_out_mlp_w",
)


# ------------------------------------------------------------- parallel
def param_pspecs(info, params: dict) -> dict:
    """PartitionSpecs for the Flux MMDiT under a diffusion mesh
    (diffusion/parallel.py ShardInfo) — dual-stream blocks follow the
    qwen-image layout (head-resharded qkv column-parallel, row-parallel
    attn_out / mlp_w2); single-stream blocks shard the fused qkv over
    heads, the mlp branch column-parallel, and the fused output as TWO
    row-parallel halves (s_out_attn_w / s_out_mlp_w — a contiguous
    row-shard of the original [5d, d] leaf would interleave the o and
    mlp segments)."""
    from jax.sharding import PartitionSpec as P

    tp = info.tp_axis
    fs = info.fsdp_axes
    specs: dict = {}
    for s in ("img", "txt"):
        specs[f"{s}_mod_w"] = P(None, fs, None)
        specs[f"{s}_mod_b"] = P()
        specs[f"{s}_qkv_w"] = P(None, fs, None, tp, None)
        specs[f"{s}_qkv_b"] = P(None, None, tp, None)
        specs[f"{s}_q_norm"] = P()
        specs[f"{s}_k_norm"] = P()
        specs[f"{s}_attn_out_w"] = P(None, tp, fs)
        specs[f"{s}_attn_out_b"] = P()
        specs[f"{s}_mlp_w1"] = P(None, fs, tp)
        specs[f"{s}_mlp_b1"] = P(None, tp)
        specs[f"{s}_mlp_w2"] = P(None, tp, fs)
        specs[f"{s}_mlp_b2"] = P()
    specs.update({
        "s_mod_w": P(None, fs, None),
        "s_mod_b": P(),
        "s_qkv_w": P(None, fs, None, tp, None),
        "s_qkv_b": P(None, None, tp, None),
        "s_q_norm": P(),
        "s_k_norm": P(),
        "s_mlp_w": P(None, fs, tp),
        "s_mlp_b": P(None, tp),
        "s_out_attn_w": P(None, tp, fs),
        "s_out_mlp_w": P(None, tp, fs),
        "s_out_b": P(),
    })
    return {k: specs.get(k, P()) for k in params}


def shard_params(cfg: FluxArchConfig, params: dict, ctx) -> dict:
    """device_put over ctx.mesh: packed qkv leaves reshard to
    [L, d, 3, H, hd]; the single-stream fused output [ns, 5d, d] splits
    into its attention ([ns, d, d]) and mlp ([ns, 4d, d]) halves."""
    from jax.sharding import NamedSharding

    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    d = cfg.inner_dim
    out = dict(params)
    for name in ("img_qkv", "txt_qkv", "s_qkv"):
        w = out[f"{name}_w"]
        b = out[f"{name}_b"]
        if w.ndim == 3:
            out[f"{name}_w"] = w.reshape(w.shape[0], w.shape[1], 3, nh, hd)
            out[f"{name}_b"] = b.reshape(b.shape[0], 3, nh, hd)
    if "s_out_w" in out:
        so = out.pop("s_out_w")
        out["s_out_attn_w"] = so[:, :d]
        out["s_out_mlp_w"] = so[:, d:]
    specs = param_pspecs(ctx.info, out)
    return {
        k: jax.device_put(v, NamedSharding(ctx.mesh, specs[k]))
        for k, v in out.items()
    }


_FSDP_GATHER_DIM = {
    "img_mod_w": 0, "txt_mod_w": 0, "img_qkv_w": 0, "txt_qkv_w": 0,
    "img_attn_out_w": 1, "txt_attn_out_w": 1,
    "img_mlp_w1": 0, "txt_mlp_w1": 0, "img_mlp_w2": 1, "txt_mlp_w2": 1,
    "s_mod_w": 0, "s_qkv_w": 0, "s_mlp_w": 0,
    "s_out_attn_w": 1, "s_out_mlp_w": 1,
}


def _gather_fsdp(lp: dict, axes) -> dict:
    if not axes:
        return lp
    out = dict(lp)
    for k, dim in _FSDP_GATHER_DIM.items():
        if k in lp:
            out[k] = jax.lax.all_gather(lp[k], axes, axis=dim, tiled=True)
    return out


def _sin_proj(t, w1, b1, w2, b2, dt):
    half = 128
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = 1000.0 * t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    emb = emb.astype(dt)
    h = jnp.dot(emb, w1) + b1
    h = jax.nn.silu(h.astype(jnp.float32)).astype(dt)
    return jnp.dot(h, w2) + b2


def forward(
    cfg: FluxArchConfig,
    params: dict,
    img_tokens: jax.Array,  # [B, S_img, in_channels] packed 2x2 latents
    txt_embeds: jax.Array,  # [B, S_txt, joint_attention_dim]
    txt_lens: jax.Array,  # [B]
    pooled: jax.Array,  # [B, pooled_projection_dim]
    timestep: jax.Array,  # [B] sigma in [0, 1]
    guidance: jax.Array | None,  # [B] guidance scale (distilled models)
    img_shape: tuple[int, int, int],  # static (1, lat_h//2, lat_w//2)
    *,
    parallel=None,  # diffusion.parallel.ShardInfo inside shard_map
) -> jax.Array:
    dt = _dt(cfg)
    b, s_img, _ = img_tokens.shape
    s_txt = txt_embeds.shape[1]
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    d = cfg.inner_dim
    pl = parallel
    sp_axis = pl.sp_axis if pl else None
    tp_axis = pl.tp_axis if pl else None
    sp_size = pl.sp_size if pl else 1

    img = jnp.dot(img_tokens.astype(dt), params["img_in_w"]) + (
        params["img_in_b"]
    )
    txt = jnp.dot(txt_embeds.astype(dt), params["txt_in_w"]) + (
        params["txt_in_b"]
    )

    # CombinedTimestepGuidanceTextProjEmbeddings: sum of three MLPs
    temb = _sin_proj(
        timestep, params["t_emb_w1"], params["t_emb_b1"],
        params["t_emb_w2"], params["t_emb_b2"], dt,
    )
    if cfg.guidance_embeds and guidance is not None:
        temb = temb + _sin_proj(
            guidance, params["g_emb_w1"], params["g_emb_b1"],
            params["g_emb_w2"], params["g_emb_b2"], dt,
        )
    ph = jax.nn.silu(
        (jnp.dot(pooled.astype(dt), params["pool_w1"]) + params["pool_b1"])
        .astype(jnp.float32)
    ).astype(dt)
    temb = temb + jnp.dot(ph, params["pool_w2"]) + params["pool_b2"]
    temb_act = jax.nn.silu(temb.astype(jnp.float32)).astype(dt)

    icos, isin, tcos, tsin = _flux_rope(cfg, img_shape, s_txt)
    if sp_axis is not None:
        # this shard's rows of the image rope table (s_img is LOCAL)
        sp_idx = jax.lax.axis_index(sp_axis)
        icos = jax.lax.dynamic_slice_in_dim(icos, sp_idx * s_img, s_img, 0)
        isin = jax.lax.dynamic_slice_in_dim(isin, sp_idx * s_img, s_img, 0)
    joint_lens = (s_img + txt_lens).astype(jnp.int32)

    def _row_out(x, w, bias, dtype):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        if tp_axis is not None:
            y = jax.lax.psum(y, tp_axis)
        return (y + bias.astype(jnp.float32)).astype(dtype)

    def _joint_attn(iq, ik, iv, tq, tk, tv, n_loc):
        """[img || txt] attention, sp-aware; returns (o_img, o_txt)."""
        if sp_axis is not None:
            from ht_vllm_omni_tpu.diffusion.distributed.sp_ulysses import (
                ulysses_joint_attention,
            )

            o_imgs, o_txts = [], []
            for i in range(b):
                oi, ot = ulysses_joint_attention(
                    iq[i].transpose(1, 0, 2), ik[i].transpose(1, 0, 2),
                    iv[i].transpose(1, 0, 2), tq[i].transpose(1, 0, 2),
                    tk[i].transpose(1, 0, 2), tv[i].transpose(1, 0, 2),
                    axis=sp_axis, sp_size=sp_size, txt_len=txt_lens[i],
                )
                o_imgs.append(oi.transpose(1, 0, 2))
                o_txts.append(ot.transpose(1, 0, 2))
            return (
                jnp.stack(o_imgs).reshape(b, s_img, n_loc * hd),
                jnp.stack(o_txts).reshape(b, s_txt, n_loc * hd),
            )
        q = jnp.concatenate([iq, tq], axis=1).transpose(0, 2, 1, 3)
        k = jnp.concatenate([ik, tk], axis=1).transpose(0, 2, 1, 3)
        v = jnp.concatenate([iv, tv], axis=1).transpose(0, 2, 1, 3)
        o = flash_attention(q, k, v, joint_lens, causal=False)
        o = o.transpose(0, 2, 1, 3).reshape(b, s_img + s_txt, n_loc * hd)
        return o[:, :s_img], o[:, s_img:]

    def _qkv(x, w, bias, qn, kn, cos, sin):
        if w.ndim == 4:  # sharded layout [d, 3, H_loc, hd]
            n_loc = w.shape[2]
            w = w.reshape(w.shape[0], -1)
            bias = bias.reshape(-1)
        else:
            n_loc = nh
        y = jnp.dot(x, w) + bias
        q, k, v = jnp.split(y, 3, axis=-1)
        q = q.reshape(b, -1, n_loc, hd)
        k = k.reshape(b, -1, n_loc, hd)
        v = v.reshape(b, -1, n_loc, hd)
        q = rms_norm(q, qn, 1e-6)
        k = rms_norm(k, kn, 1e-6)
        q = apply_rope_interleaved(q, cos, sin)
        k = apply_rope_interleaved(k, cos, sin)
        return q, k, v

    fsdp_axes = pl.fsdp_axes if pl else None

    # ------------------------------------------------ dual-stream blocks
    def dual(carry, lp):
        lp = _gather_fsdp(lp, fsdp_axes)
        img, txt = carry
        img_mod = jnp.dot(temb_act, lp["img_mod_w"]) + lp["img_mod_b"]
        txt_mod = jnp.dot(temb_act, lp["txt_mod_w"]) + lp["txt_mod_b"]
        img_mod1, img_mod2 = jnp.split(img_mod, 2, axis=-1)
        txt_mod1, txt_mod2 = jnp.split(txt_mod, 2, axis=-1)

        img_n, img_gate1 = _modulate(_layer_norm(img), img_mod1)
        txt_n, txt_gate1 = _modulate(_layer_norm(txt), txt_mod1)

        iq, ik, iv = _qkv(
            img_n, lp["img_qkv_w"], lp["img_qkv_b"],
            lp["img_q_norm"], lp["img_k_norm"], icos, isin,
        )
        tq, tk, tv = _qkv(
            txt_n, lp["txt_qkv_w"], lp["txt_qkv_b"],
            lp["txt_q_norm"], lp["txt_k_norm"], tcos, tsin,
        )
        o_img, o_txt = _joint_attn(iq, ik, iv, tq, tk, tv, iq.shape[2])

        img = img + img_gate1 * _row_out(
            o_img, lp["img_attn_out_w"], lp["img_attn_out_b"], img.dtype
        )
        txt = txt + txt_gate1 * _row_out(
            o_txt, lp["txt_attn_out_w"], lp["txt_attn_out_b"], txt.dtype
        )

        def mlp(x, w1, b1, w2, b2):
            h = jnp.dot(
                x, w1, preferred_element_type=jnp.float32
            ) + b1.astype(jnp.float32)
            h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
            return _row_out(h, w2, b2, x.dtype)

        img_n2, img_gate2 = _modulate(_layer_norm(img), img_mod2)
        img = img + img_gate2 * mlp(
            img_n2, lp["img_mlp_w1"], lp["img_mlp_b1"],
            lp["img_mlp_w2"], lp["img_mlp_b2"],
        )
        txt_n2, txt_gate2 = _modulate(_layer_norm(txt), txt_mod2)
        txt = txt + txt_gate2 * mlp(
            txt_n2, lp["txt_mlp_w1"], lp["txt_mlp_b1"],
            lp["txt_mlp_w2"], lp["txt_mlp_b2"],
        )
        return (img, txt), None

    dual_tree = {
        k: v
        for k, v in params.items()
        if any(
            k == pfx or k.startswith(pfx + "_") for pfx in _DUAL_PREFIXES
        )
    }
    (img, txt), _ = jax.lax.scan(dual, (img, txt), dual_tree)

    # ------------------------------------------------ single-stream blocks
    x = jnp.concatenate([img, txt], axis=1)  # [B, S_img(_loc) + S_txt, D]
    cos = jnp.concatenate([icos, tcos], axis=0)
    sin = jnp.concatenate([isin, tsin], axis=0)

    def single(x, lp):
        lp = _gather_fsdp(lp, fsdp_axes)
        mod = jnp.dot(temb_act, lp["s_mod_w"]) + lp["s_mod_b"]
        xn, gate = _modulate(_layer_norm(x), mod)
        qw, qb = lp["s_qkv_w"], lp["s_qkv_b"]
        if qw.ndim == 4:
            n_loc = qw.shape[2]
            qw = qw.reshape(qw.shape[0], -1)
            qb = qb.reshape(-1)
        else:
            n_loc = nh
        qkv_y = jnp.dot(xn, qw) + qb
        q, k, v = jnp.split(qkv_y, 3, axis=-1)
        q = rms_norm(q.reshape(b, -1, n_loc, hd), lp["s_q_norm"], 1e-6)
        k = rms_norm(k.reshape(b, -1, n_loc, hd), lp["s_k_norm"], 1e-6)
        v = v.reshape(b, -1, n_loc, hd)
        q = apply_rope_interleaved(q, cos, sin)
        k = apply_rope_interleaved(k, cos, sin)
        o_img, o_txt = _joint_attn(
            q[:, :s_img], k[:, :s_img], v[:, :s_img],
            q[:, s_img:], k[:, s_img:], v[:, s_img:], n_loc,
        )
        o = jnp.concatenate([o_img, o_txt], axis=1)
        mlp = jax.nn.gelu(
            (jnp.dot(xn, lp["s_mlp_w"]) + lp["s_mlp_b"]).astype(
                jnp.float32
            ),
            approximate=True,
        ).astype(x.dtype)
        if "s_out_attn_w" in lp:
            # sharded layout: the fused [o || mlp] output runs as two
            # row-parallel halves (a contiguous row-shard of the packed
            # [5d, d] leaf would interleave the segments)
            y = jnp.dot(
                o, lp["s_out_attn_w"], preferred_element_type=jnp.float32
            ) + jnp.dot(
                mlp, lp["s_out_mlp_w"],
                preferred_element_type=jnp.float32,
            )
            if tp_axis is not None:
                y = jax.lax.psum(y, tp_axis)
            y = y + lp["s_out_b"].astype(jnp.float32)
            return x + gate * y.astype(x.dtype), None
        fused = jnp.concatenate([o, mlp], axis=-1)  # [B, S, 5D]
        y = jnp.dot(fused, lp["s_out_w"]) + lp["s_out_b"]
        return x + gate * y.astype(x.dtype), None

    single_tree = {
        k: params[k] for k in _SINGLE_KEYS if k in params
    }
    x, _ = jax.lax.scan(single, x, single_tree)
    img = x[:, :s_img]

    head = jnp.dot(temb_act, params["norm_out_w"]) + params["norm_out_b"]
    scale, shift = jnp.split(head, 2, axis=-1)
    img = _layer_norm(img) * (1.0 + scale[:, None, :]) + shift[:, None, :]
    out = (
        jnp.dot(
            img, params["proj_out_w"], preferred_element_type=jnp.float32
        )
        + params["proj_out_b"].astype(jnp.float32)
    )
    return out


def _flux_rope(cfg: FluxArchConfig, img_shape, txt_len: int):
    """FluxPosEmbed tables (reference flux_transformer.py:420-447):
    image ids are (idx, y, x) from the origin — segment idx is 0 for the
    target grid and i for the i-th conditioning-image segment (Kontext
    sets image_ids[..., 0] = 1, pipeline_flux_kontext.py:421); text ids
    are all-zero, so text tokens rotate by identity on every axis."""
    from ht_vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
        normalize_shapes,
    )

    shapes = normalize_shapes(img_shape)
    theta = cfg.rope_theta

    def axis_freqs(positions, dim):
        half = dim // 2
        inv = 1.0 / (
            theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
        )
        return positions[:, None].astype(jnp.float32) * inv

    d_f, d_h, d_w = cfg.axes_dims_rope
    grids = []
    for idx, (f, h, wd) in enumerate(shapes):
        ff = axis_freqs(idx + jnp.arange(f, dtype=jnp.float32), d_f)
        fh = axis_freqs(jnp.arange(h, dtype=jnp.float32), d_h)
        fw = axis_freqs(jnp.arange(wd, dtype=jnp.float32), d_w)
        grids.append(
            jnp.concatenate(
                [
                    jnp.broadcast_to(
                        ff[:, None, None, :], (f, h, wd, d_f // 2)
                    ),
                    jnp.broadcast_to(
                        fh[None, :, None, :], (f, h, wd, d_h // 2)
                    ),
                    jnp.broadcast_to(
                        fw[None, None, :, :], (f, h, wd, d_w // 2)
                    ),
                ],
                axis=-1,
            ).reshape(f * h * wd, -1)
        )
    grid = jnp.concatenate(grids, axis=0)
    txt = jnp.zeros(
        (txt_len, sum(cfg.axes_dims_rope) // 2), jnp.float32
    )
    return jnp.cos(grid), jnp.sin(grid), jnp.cos(txt), jnp.sin(txt)
