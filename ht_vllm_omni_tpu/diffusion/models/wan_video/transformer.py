"""Wan2.2 3D video diffusion transformer in jax.

Semantics follow the reference WanTransformer3DModel (reference
vllm_omni/diffusion/models/wan2_2/wan2_2_transformer.py:687-951):
Conv3d patch embedding, 3-axis (t/h/w) interleaved rotary embeddings,
blocks of [fp32-LN scale/shift-modulated self-attention with qk RMSNorm,
cross-attention to text, gelu-tanh FFN] with a per-block 6-way
scale_shift_table, and a modulated output projection + unpatchify.

TPU shape: blocks are stacked on a leading axis and run under lax.scan;
self-attention over the flattened [F*H*W] patch sequence uses the repo's
Pallas flash kernel (full, non-causal); timesteps may be per-sample
[B] or per-token [B, S] (the TI2V first-frame-conditioning mode,
reference pipeline_wan2_2.py:600-614).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.models.wan_video.config import (
    WanVideoArchConfig,
)
from ht_vllm_omni_tpu.models.layers import rms_norm
from ht_vllm_omni_tpu.ops.flash_attention import flash_attention


def _layer_norm(x, eps, gamma=None, beta=None):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        out = out * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out


def _gelu_tanh(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True)


def rope_3d(
    cfg: WanVideoArchConfig, f: int, h: int, w: int
) -> tuple[jax.Array, jax.Array]:
    """Interleaved-pair cos/sin for the [F*H*W] patch grid, one rotation
    stream per axis concatenated over head_dim pairs (reference
    WanRotaryPosEmbed, wan2_2_transformer.py:149-224).  Returns
    (cos, sin) [S, head_dim/2] fp32."""
    dims = cfg.rope_dims
    parts_cos, parts_sin = [], []
    grids = jnp.meshgrid(
        jnp.arange(f), jnp.arange(h), jnp.arange(w), indexing="ij"
    )
    for axis, d in enumerate(dims):
        pos = grids[axis].reshape(-1).astype(jnp.float64)  # [S]
        freqs = 1.0 / (
            cfg.rope_theta
            ** (jnp.arange(0, d, 2, dtype=jnp.float64) / d)
        )
        ang = pos[:, None] * freqs[None, :]  # [S, d/2]
        parts_cos.append(jnp.cos(ang))
        parts_sin.append(jnp.sin(ang))
    cos = jnp.concatenate(parts_cos, axis=-1).astype(jnp.float32)
    sin = jnp.concatenate(parts_sin, axis=-1).astype(jnp.float32)
    return cos, sin


def apply_rope_interleaved(x, cos, sin):
    """x [..., S, H, D] with D as interleaved pairs; cos/sin [S, D/2]
    (reference apply_rotary_emb_wan, wan2_2_transformer.py:36-58)."""
    shape = x.shape
    xf = x.astype(jnp.float32).reshape(*shape[:-1], shape[-1] // 2, 2)
    x1, x2 = xf[..., 0], xf[..., 1]
    c = cos[:, None, :]
    s = sin[:, None, :]
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.reshape(shape).astype(x.dtype)


def init_params(cfg: WanVideoArchConfig, key: jax.Array) -> dict:
    dt = jnp.dtype(cfg.dtype)
    d = cfg.inner_dim
    nl = cfg.num_layers
    hd = cfg.attention_head_dim
    keys = iter(jax.random.split(key, 32))

    def w(k, shape, fan_in=None):
        fan_in = fan_in or shape[-2]
        return (
            jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan_in)
        ).astype(dt)

    pt, ph, pw = cfg.patch_size
    params = {
        # Conv3d patch embed, kernel == stride == patch
        "patch_w": w(
            next(keys), (pt, ph, pw, cfg.in_channels, d),
            fan_in=pt * ph * pw * cfg.in_channels,
        ),
        "patch_b": jnp.zeros((d,), dt),
        # condition embedder
        "time_w1": w(next(keys), (cfg.freq_dim, d)),
        "time_b1": jnp.zeros((d,), dt),
        "time_w2": w(next(keys), (d, d)),
        "time_b2": jnp.zeros((d,), dt),
        "time_proj_w": w(next(keys), (d, 6 * d)),
        "time_proj_b": jnp.zeros((6 * d,), dt),
        "text_w1": w(next(keys), (cfg.text_dim, d)),
        "text_b1": jnp.zeros((d,), dt),
        "text_w2": w(next(keys), (d, d)),
        "text_b2": jnp.zeros((d,), dt),
        # blocks (stacked [L, ...])
        "qkv_w": w(next(keys), (nl, d, 3 * d)),
        "qkv_b": jnp.zeros((nl, 3 * d), dt),
        "q_norm": jnp.ones((nl, d), dt),
        "k_norm": jnp.ones((nl, d), dt),
        "attn_out_w": w(next(keys), (nl, d, d)),
        "attn_out_b": jnp.zeros((nl, d), dt),
        "xq_w": w(next(keys), (nl, d, d)),
        "xq_b": jnp.zeros((nl, d), dt),
        "xk_w": w(next(keys), (nl, d, d)),
        "xk_b": jnp.zeros((nl, d), dt),
        "xv_w": w(next(keys), (nl, d, d)),
        "xv_b": jnp.zeros((nl, d), dt),
        "xq_norm": jnp.ones((nl, d), dt),
        "xk_norm": jnp.ones((nl, d), dt),
        "xattn_out_w": w(next(keys), (nl, d, d)),
        "xattn_out_b": jnp.zeros((nl, d), dt),
        "ffn_w1": w(next(keys), (nl, d, cfg.ffn_dim)),
        "ffn_b1": jnp.zeros((nl, cfg.ffn_dim), dt),
        "ffn_w2": w(next(keys), (nl, cfg.ffn_dim, d)),
        "ffn_b2": jnp.zeros((nl, d), dt),
        "mod_table": (
            jax.random.normal(next(keys), (nl, 6, d), jnp.float32)
            / math.sqrt(d)
        ).astype(dt),
        # output head
        "out_table": (
            jax.random.normal(next(keys), (2, d), jnp.float32)
            / math.sqrt(d)
        ).astype(dt),
        "proj_out_w": w(next(keys), (d, cfg.out_channels * pt * ph * pw)),
        "proj_out_b": jnp.zeros((cfg.out_channels * pt * ph * pw,), dt),
    }
    if cfg.cross_attn_norm:
        params["norm2_g"] = jnp.ones((nl, d), dt)
        params["norm2_b"] = jnp.zeros((nl, d), dt)
    # head-grouped rope norm shapes: qk RMSNorm runs over the FULL inner
    # dim (reference DistributedRMSNorm over tp_inner_dim)
    return params


_BLOCK_KEYS = (
    "qkv_w", "qkv_b", "q_norm", "k_norm", "attn_out_w", "attn_out_b",
    "xq_w", "xq_b", "xk_w", "xk_b", "xv_w", "xv_b", "xq_norm", "xk_norm",
    "xattn_out_w", "xattn_out_b", "ffn_w1", "ffn_b1", "ffn_w2", "ffn_b2",
    "mod_table", "norm2_g", "norm2_b",
)


# ------------------------------------------------------------- parallel
def param_pspecs(info, params: dict) -> dict:
    """PartitionSpecs for the Wan DiT under a diffusion mesh
    (diffusion/parallel.py ShardInfo) — the HSDP/TP story for the
    14B-class video DiTs the reference shards with FSDP2
    (reference vllm_omni/diffusion/distributed/hsdp.py:88,177).

    Megatron layout per block: qkv / xq / xk / xv column-parallel over
    heads (qkv resharded [L, d, 3, H, hd] by shard_params), attn_out /
    xattn_out / ffn_w2 row-parallel with in-layer psums, ffn_w1
    column-parallel; q/k RMSNorm runs DISTRIBUTED over the full inner
    dim (the reference's DistributedRMSNorm over tp_inner_dim) with its
    scale sharded.  fsdp_axes additionally shard the remaining big dim
    of every stacked leaf, gathered just-in-time per layer."""
    from jax.sharding import PartitionSpec as P

    tp = info.tp_axis
    fs = info.fsdp_axes
    specs = {
        "qkv_w": P(None, fs, None, tp, None),  # [L, d, 3, H, hd]
        "qkv_b": P(None, None, tp, None),  # [L, 3, H, hd]
        "q_norm": P(None, tp),
        "k_norm": P(None, tp),
        "attn_out_w": P(None, tp, fs),
        "attn_out_b": P(),
        "xq_w": P(None, fs, tp),
        "xq_b": P(None, tp),
        "xk_w": P(None, fs, tp),
        "xk_b": P(None, tp),
        "xv_w": P(None, fs, tp),
        "xv_b": P(None, tp),
        "xq_norm": P(None, tp),
        "xk_norm": P(None, tp),
        "xattn_out_w": P(None, tp, fs),
        "xattn_out_b": P(),
        "ffn_w1": P(None, fs, tp),
        "ffn_b1": P(None, tp),
        "ffn_w2": P(None, tp, fs),
        "ffn_b2": P(),
        "mod_table": P(),
        "norm2_g": P(),
        "norm2_b": P(),
    }
    return {k: specs.get(k, P()) for k in params}


def shard_params(cfg: WanVideoArchConfig, params: dict, ctx) -> dict:
    """device_put the DiT weights over ctx.mesh; the packed qkv leaf is
    resharded to [L, d, 3, H, hd] so tp can shard the head dim (forward
    flattens the LOCAL slice back — split(3) stays correct per shard)."""
    from jax.sharding import NamedSharding

    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    out = dict(params)
    w, b = out["qkv_w"], out["qkv_b"]
    if w.ndim == 3:
        out["qkv_w"] = w.reshape(w.shape[0], w.shape[1], 3, nh, hd)
        out["qkv_b"] = b.reshape(b.shape[0], 3, nh, hd)
    specs = param_pspecs(ctx.info, out)
    return {
        k: jax.device_put(v, NamedSharding(ctx.mesh, specs[k]))
        for k, v in out.items()
    }


_FSDP_GATHER_DIM = {
    "qkv_w": 0, "attn_out_w": 1, "xq_w": 0, "xk_w": 0, "xv_w": 0,
    "xattn_out_w": 1, "ffn_w1": 0, "ffn_w2": 1,
}


def _gather_fsdp(lp: dict, axes) -> dict:
    if not axes:
        return lp
    out = dict(lp)
    for name, dim in _FSDP_GATHER_DIM.items():
        out[name] = jax.lax.all_gather(lp[name], axes, axis=dim, tiled=True)
    return out


def _rms_norm_dist(x, scale, eps, tp_axis, tp_size):
    """RMSNorm over the FULL inner dim when x carries only the tp-local
    slice: the mean of squares psums across tp (reference
    DistributedRMSNorm).  Bit-matches models/layers.rms_norm when
    tp_axis is None."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    ss = jnp.sum(xf * xf, axis=-1, keepdims=True)
    if tp_axis is not None:
        ss = jax.lax.psum(ss, tp_axis)
    var = ss / (x.shape[-1] * tp_size)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * scale.astype(jnp.float32)).astype(dtype)


def _timestep_embed(cfg, t):
    """Sinusoidal timestep features [..., freq_dim] (diffusers Timesteps,
    flip_sin_to_cos=True): t is the train-scale timestep (sigma*1000)."""
    half = cfg.freq_dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
    freqs = jnp.exp(exponent / half)
    ang = t[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def forward(
    cfg: WanVideoArchConfig,
    params: dict,
    latents: jax.Array,  # [B, C, F, H, W]
    timestep: jax.Array,  # [B] or [B, S_tokens] (train scale, 0..1000)
    text_embeds: jax.Array,  # [B, S_txt, text_dim]
    text_lens: jax.Array,  # [B]
    *,
    parallel=None,  # diffusion.parallel.ShardInfo inside shard_map
) -> jax.Array:
    """Velocity prediction [B, C, F, H, W].

    With ``parallel`` set this runs INSIDE shard_map over the diffusion
    mesh: the patch-token stream shards over sp (Ulysses self-attention;
    cross-attention to the replicated text needs no collective), weights
    arrive tp/fsdp-sharded per param_pspecs, q/k norms run distributed
    over the full inner dim, and the output gathers over sp before
    unpatchify so every shard returns the full velocity."""
    b, c, f, h, w_ = latents.shape
    pt, ph, pw = cfg.patch_size
    pf, phh, pww = f // pt, h // ph, w_ // pw
    s = pf * phh * pww
    d = cfg.inner_dim
    nh = cfg.num_attention_heads
    hd = cfg.attention_head_dim
    dt = params["patch_w"].dtype
    pl_ = parallel
    sp_axis = pl_.sp_axis if pl_ else None
    tp_axis = pl_.tp_axis if pl_ else None
    sp_size = pl_.sp_size if pl_ else 1
    tp_size = pl_.tp_size if pl_ else 1

    # patch embedding: stride==kernel Conv3d == patch-reshape + matmul
    x = latents.astype(dt).transpose(0, 2, 3, 4, 1)  # [B, F, H, W, C]
    x = x.reshape(b, pf, pt, phh, ph, pww, pw, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, s, pt * ph * pw * c
    )
    pw_flat = params["patch_w"].reshape(pt * ph * pw * c, d)
    x = (
        jnp.dot(x, pw_flat, preferred_element_type=jnp.float32)
        + params["patch_b"].astype(jnp.float32)
    ).astype(dt)

    # condition embedder
    tfeat = _timestep_embed(cfg, timestep)  # [B(, S), freq]
    temb = jnp.dot(tfeat, params["time_w1"]) + params["time_b1"]
    temb = jnp.dot(jax.nn.silu(temb), params["time_w2"]) + params["time_b2"]
    tproj = (
        jnp.dot(jax.nn.silu(temb), params["time_proj_w"])
        + params["time_proj_b"]
    )
    per_token = timestep.ndim == 2
    if per_token:
        mod_base = tproj.reshape(b, -1, 6, d)  # [B, S, 6, D]
    else:
        mod_base = tproj.reshape(b, 1, 6, d)  # broadcast over S

    txt = _gelu_tanh(
        jnp.dot(text_embeds.astype(jnp.float32), params["text_w1"])
        + params["text_b1"]
    )
    txt = (jnp.dot(txt, params["text_w2"]) + params["text_b2"]).astype(dt)
    s_txt = txt.shape[1]
    txt_mask = (
        jnp.arange(s_txt)[None, :] < text_lens[:, None]
    )  # [B, S_txt]

    cos, sin = rope_3d(cfg, pf, phh, pww)
    eps = cfg.eps

    if sp_axis is not None:
        # every shard computed the (cheap, replicated) patch embed on
        # the full grid; keep only this shard's token range
        s_loc = s // sp_size
        idx = jax.lax.axis_index(sp_axis)
        x = jax.lax.dynamic_slice_in_dim(x, idx * s_loc, s_loc, 1)
        cos = jax.lax.dynamic_slice_in_dim(cos, idx * s_loc, s_loc, 0)
        sin = jax.lax.dynamic_slice_in_dim(sin, idx * s_loc, s_loc, 0)
        if per_token:
            mod_base = jax.lax.dynamic_slice_in_dim(
                mod_base, idx * s_loc, s_loc, 1
            )
        s = s_loc

    def block(hidden, lp):
        lp = _gather_fsdp(lp, pl_.fsdp_axes if pl_ else None)
        mod = mod_base.astype(jnp.float32) + lp["mod_table"].astype(
            jnp.float32
        )[None, None]
        (sh_msa, sc_msa, g_msa, sh_ff, sc_ff, g_ff) = [
            mod[:, :, i] for i in range(6)
        ]

        def row_out(o, w, bias):
            y = jnp.dot(o, w, preferred_element_type=jnp.float32)
            if tp_axis is not None:
                y = jax.lax.psum(y, tp_axis)
            return (y + bias.astype(jnp.float32)).astype(dt)

        # 1. modulated self-attention
        nx = _layer_norm(hidden, eps) * (1 + sc_msa) + sh_msa
        nx = nx.astype(dt)
        qkv_w = lp["qkv_w"]
        qkv_b = lp["qkv_b"]
        if qkv_w.ndim == 4:  # sharded layout [d, 3, H_loc, hd]
            nh_loc = qkv_w.shape[2]
            qkv_w = qkv_w.reshape(qkv_w.shape[0], -1)
            qkv_b = qkv_b.reshape(-1)
        else:
            nh_loc = nh
        d_loc = nh_loc * hd
        qkv = jnp.dot(nx, qkv_w) + qkv_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _rms_norm_dist(q, lp["q_norm"], eps, tp_axis, tp_size)
        k = _rms_norm_dist(k, lp["k_norm"], eps, tp_axis, tp_size)
        q = q.reshape(b, s, nh_loc, hd)
        k = k.reshape(b, s, nh_loc, hd)
        v = v.reshape(b, s, nh_loc, hd)
        q = apply_rope_interleaved(q, cos, sin)
        k = apply_rope_interleaved(k, cos, sin)
        if sp_axis is not None:
            from ht_vllm_omni_tpu.diffusion.distributed.sp_ulysses import (
                ulysses_attention,
                ulysses_attention_uneven,
            )

            fn = (
                ulysses_attention
                if nh_loc % sp_size == 0
                else ulysses_attention_uneven
            )
            outs = []
            for i in range(b):  # b is 1 or 2; static
                outs.append(
                    fn(
                        q[i].transpose(1, 0, 2), k[i].transpose(1, 0, 2),
                        v[i].transpose(1, 0, 2),
                        axis=sp_axis, sp_size=sp_size,
                    ).transpose(1, 0, 2)
                )
            o = jnp.stack(outs).reshape(b, s, d_loc)
        else:
            o = flash_attention(
                q.transpose(0, 2, 1, 3),
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                causal=False,
            ).transpose(0, 2, 1, 3).reshape(b, s, d_loc)
        o = row_out(o, lp["attn_out_w"], lp["attn_out_b"])
        hidden = (
            hidden.astype(jnp.float32) + o.astype(jnp.float32) * g_msa
        ).astype(dt)

        # 2. cross-attention to text (text replicated over sp: local)
        if "norm2_g" in lp:
            nx = _layer_norm(
                hidden, eps, lp["norm2_g"], lp["norm2_b"]
            ).astype(dt)
        else:
            nx = hidden
        q = _rms_norm_dist(
            jnp.dot(nx, lp["xq_w"]) + lp["xq_b"], lp["xq_norm"], eps,
            tp_axis, tp_size,
        )
        k = _rms_norm_dist(
            jnp.dot(txt, lp["xk_w"]) + lp["xk_b"], lp["xk_norm"], eps,
            tp_axis, tp_size,
        )
        v = jnp.dot(txt, lp["xv_w"]) + lp["xv_b"]
        q = q.reshape(b, s, nh_loc, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s_txt, nh_loc, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s_txt, nh_loc, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(jnp.float32),
            k.astype(jnp.float32),
        ) / math.sqrt(hd)
        logits = jnp.where(
            txt_mask[:, None, None, :], logits, -1e30
        )
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d_loc).astype(dt)
        o = row_out(o, lp["xattn_out_w"], lp["xattn_out_b"])
        hidden = hidden + o.astype(hidden.dtype)

        # 3. modulated FFN
        nx = (_layer_norm(hidden, eps) * (1 + sc_ff) + sh_ff).astype(dt)
        ff = _gelu_tanh(jnp.dot(nx, lp["ffn_w1"]) + lp["ffn_b1"])
        ff = jnp.dot(
            ff.astype(dt), lp["ffn_w2"],
            preferred_element_type=jnp.float32,
        )
        if tp_axis is not None:
            ff = jax.lax.psum(ff, tp_axis)
        ff = ff + lp["ffn_b2"].astype(jnp.float32)
        hidden = (
            hidden.astype(jnp.float32) + ff * g_ff
        ).astype(dt)
        return hidden, None

    lp_stack = {k: v for k, v in params.items() if k in _BLOCK_KEYS}
    hidden, _ = jax.lax.scan(block, x, lp_stack)

    # output: scale/shift from temb + out_table
    if per_token:
        te = temb.astype(jnp.float32)  # [B, S, D]
        if sp_axis is not None:
            te = jax.lax.dynamic_slice_in_dim(te, idx * s, s, 1)
    else:
        te = temb.astype(jnp.float32)[:, None, :]  # [B, 1, D]
    ot = params["out_table"].astype(jnp.float32)
    shift = ot[0][None, None] + te
    scale = ot[1][None, None] + te
    hidden = (_layer_norm(hidden, eps) * (1 + scale) + shift).astype(dt)
    out = (
        jnp.dot(hidden, params["proj_out_w"]) + params["proj_out_b"]
    )  # [B, S(_loc), C*pt*ph*pw]

    if sp_axis is not None:
        # gather the token stream so every shard unpatchifies the full
        # grid (the velocity is small next to the weights)
        out = jax.lax.all_gather(out, sp_axis, axis=1, tiled=True)
        s = s * sp_size

    # unpatchify -> [B, C, F, H, W]
    co = cfg.out_channels
    out = out.reshape(b, pf, phh, pww, pt, ph, pw, co)
    out = out.transpose(0, 7, 1, 4, 2, 5, 3, 6)
    return out.reshape(b, co, f, h, w_).astype(jnp.float32)
