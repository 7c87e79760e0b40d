"""QwenImage MMDiT transformer in pure jax over stacked-layer pytrees.

Semantics follow the reference QwenImageTransformer2DModel (reference
vllm_omni/diffusion/models/qwen_image/qwen_image_transformer.py:854):
dual-stream (image + text) blocks with one joint attention, per-stream
AdaLN modulation from the timestep embedding, 3-axis (frame/height/width)
rotary embeddings in the interleaved ("non-neox") convention, gelu-tanh
FFNs, and an AdaLN-continuous output head.

TPU-first design: all ``num_layers`` blocks are stacked on a leading axis
and executed with ``lax.scan`` (flat compile time); the joint attention
is the repo's Pallas flash kernel over the [img || txt] sequence with
per-batch valid lengths (text padding sits at the end, so the kernel's
``kv_lens`` masking covers it — full attention is permutation
invariant, so the [txt || img] order of the reference is numerically
identical).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
    QwenImageArchConfig,
)
from ht_vllm_omni_tpu.models.layers import rms_norm
from ht_vllm_omni_tpu.ops.flash_attention import flash_attention


def _dtype(cfg: QwenImageArchConfig):
    return jnp.dtype(cfg.dtype)


# --------------------------------------------------------------------- init
def init_params(cfg: QwenImageArchConfig, key: jax.Array) -> dict:
    dt = _dtype(cfg)
    d = cfg.inner_dim
    nl = cfg.num_layers
    hd = cfg.attention_head_dim
    jd = cfg.joint_attention_dim
    mlp = 4 * d
    keys = iter(jax.random.split(key, 32))

    def w(shape, scale=None):
        scale = scale or (1.0 / math.sqrt(shape[-2] if len(shape) > 1 else 1))
        return (
            jax.random.normal(next(keys), shape, jnp.float32) * scale
        ).astype(dt)

    def z(shape):
        return jnp.zeros(shape, dt)

    p = {
        "img_in_w": w((cfg.in_channels, d)), "img_in_b": z((d,)),
        "txt_norm": jnp.ones((jd,), dt),
        "txt_in_w": w((jd, d)), "txt_in_b": z((d,)),
        "t_emb_w1": w((256, d)), "t_emb_b1": z((d,)),
        "t_emb_w2": w((d, d)), "t_emb_b2": z((d,)),
        "norm_out_w": w((d, 2 * d)), "norm_out_b": z((2 * d,)),
        "proj_out_w": w((d, cfg.patch_size**2 * cfg.out_channels)),
        "proj_out_b": z((cfg.patch_size**2 * cfg.out_channels,)),
    }
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
    return p


_LAYER_PREFIXES = (
    "img_mod", "txt_mod", "img_qkv", "txt_qkv", "img_q_norm", "img_k_norm",
    "txt_q_norm", "txt_k_norm", "img_attn_out", "txt_attn_out",
    "img_mlp", "txt_mlp",
)


def _layer_params(params: dict) -> dict:
    return {
        k: v
        for k, v in params.items()
        if any(
            k == pfx or k.startswith(pfx + "_") for pfx in _LAYER_PREFIXES
        )
    }


# ------------------------------------------------------------- parallel
def param_pspecs(info) -> dict:
    """PartitionSpecs for the MMDiT weights under a diffusion mesh
    (diffusion/parallel.py ShardInfo) — the DiT analog of
    parallel/mesh.py param_pspecs.

    Megatron layout per dual-stream block: qkv column-parallel over
    heads (the packed [L, d, 3d] leaf is resharded to [L, d, 3, H, hd]
    by shard_params so head sharding is a clean dim), attn_out / mlp_w2
    row-parallel with an in-layer psum, mlp_w1 column-parallel.  With
    fsdp_axes set, the remaining big dim of every stacked per-layer leaf
    shards over those axes and is all-gathered just-in-time at layer
    entry (reference hsdp.py:88,177; idiom of models/qwen2._gather_fsdp).
    """
    from jax.sharding import PartitionSpec as P

    tp = info.tp_axis
    fs = info.fsdp_axes  # tuple of axis names or None
    specs: dict = {}
    for s in ("img", "txt"):
        specs[f"{s}_mod_w"] = P(None, fs, None)
        specs[f"{s}_mod_b"] = P()
        specs[f"{s}_qkv_w"] = P(None, fs, None, tp, None)  # [L,d,3,H,hd]
        specs[f"{s}_qkv_b"] = P(None, None, tp, None)  # [L,3,H,hd]
        specs[f"{s}_q_norm"] = P()
        specs[f"{s}_k_norm"] = P()
        specs[f"{s}_attn_out_w"] = P(None, tp, fs)
        specs[f"{s}_attn_out_b"] = P()
        specs[f"{s}_mlp_w1"] = P(None, fs, tp)
        specs[f"{s}_mlp_b1"] = P(None, tp)
        specs[f"{s}_mlp_w2"] = P(None, tp, fs)
        specs[f"{s}_mlp_b2"] = P()
    for k in ("img_in_w", "img_in_b", "txt_norm", "txt_in_w", "txt_in_b",
              "t_emb_w1", "t_emb_b1", "t_emb_w2", "t_emb_b2",
              "norm_out_w", "norm_out_b", "proj_out_w", "proj_out_b"):
        specs[k] = P()
    return specs


def shard_params(cfg: QwenImageArchConfig, params: dict, ctx) -> dict:
    """device_put the transformer weights over ctx.mesh with the specs
    above.  The packed qkv leaves [L, d, 3*H*hd] are reshaped to
    [L, d, 3, H, hd] (memory order unchanged — the flattened columns are
    already (q|k|v) x head-major) so tp can shard the head dim; forward
    detects the 5-D layout and flattens the LOCAL slice back, which
    keeps the downstream split(3) correct per shard."""
    import jax as _jax
    from jax.sharding import NamedSharding

    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    out = dict(params)
    for s in ("img", "txt"):
        w = out[f"{s}_qkv_w"]
        b = out[f"{s}_qkv_b"]
        if w.ndim == 3:
            out[f"{s}_qkv_w"] = w.reshape(w.shape[0], w.shape[1], 3, nh, hd)
            out[f"{s}_qkv_b"] = b.reshape(b.shape[0], 3, nh, hd)
    specs = param_pspecs(ctx.info)
    return {
        k: _jax.device_put(v, NamedSharding(ctx.mesh, specs[k]))
        for k, v in out.items()
    }


# per-layer gather dim of each fsdp-sharded leaf (post-scan slicing)
_FSDP_GATHER_DIM = {
    "mod_w": 0, "qkv_w": 0, "attn_out_w": 1, "mlp_w1": 0, "mlp_w2": 1,
}


def _gather_fsdp(lp: dict, axes) -> dict:
    if not axes:
        return lp
    out = dict(lp)
    for s in ("img", "txt"):
        for name, dim in _FSDP_GATHER_DIM.items():
            k = f"{s}_{name}"
            out[k] = jax.lax.all_gather(lp[k], axes, axis=dim, tiled=True)
    return out


# --------------------------------------------------------------------- rope
def normalize_shapes(img_shape) -> tuple[tuple[int, int, int], ...]:
    """Accept one (f, h, w) tuple or a tuple of them (multi-segment
    sequences: target grid + conditioning-image grids, reference
    pipeline_qwen_image_edit.py img_shapes)."""
    if isinstance(img_shape[0], (tuple, list)):
        return tuple(tuple(s) for s in img_shape)
    return (tuple(img_shape),)


def rope_cos_sin_3d(
    cfg: QwenImageArchConfig,
    img_shape,  # (frames, lat_h//2, lat_w//2) or a tuple of such shapes
    txt_len: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """3-axis rotary tables: (img_cos, img_sin, txt_cos, txt_sin), each
    [S, head_dim//2] fp32.

    Matches reference QwenEmbedRope with scale_rope=True
    (qwen_image_transformer.py:320,396-418): height/width positions are
    centred (negative freqs fill the first half), segment i's frame axis
    starts at position i (edit pipelines append conditioning-image
    segments, each offset by its index — _compute_video_freqs(idx)), and
    text tokens sit at position max over segments of (h//2, w//2) + j on
    all three axes.
    """
    shapes = normalize_shapes(img_shape)
    theta = cfg.rope_theta

    def axis_freqs(positions: jnp.ndarray, dim: int) -> jnp.ndarray:
        half = dim // 2
        inv = 1.0 / (
            theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
        )
        return positions[:, None].astype(jnp.float32) * inv  # [n, half]

    d_f, d_h, d_w = cfg.axes_dims_rope
    grids = []
    max_vid = 0
    for idx, (f, h, wd) in enumerate(shapes):
        pos_f = idx + jnp.arange(f, dtype=jnp.float32)
        pos_h = jnp.arange(h, dtype=jnp.float32) - (h - h // 2)
        pos_w = jnp.arange(wd, dtype=jnp.float32) - (wd - wd // 2)

        ff = axis_freqs(pos_f, d_f)  # [f, d_f//2]
        fh = axis_freqs(pos_h, d_h)  # [h, d_h//2]
        fw = axis_freqs(pos_w, d_w)  # [w, d_w//2]

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
        max_vid = max(max_vid, h // 2, wd // 2)
    grid = jnp.concatenate(grids, axis=0)

    pos_t = max_vid + jnp.arange(txt_len, dtype=jnp.float32)
    txt = jnp.concatenate(
        [axis_freqs(pos_t, d) for d in cfg.axes_dims_rope], axis=-1
    )
    return jnp.cos(grid), jnp.sin(grid), jnp.cos(txt), jnp.sin(txt)


def apply_rope_interleaved(
    x: jax.Array,  # [B, S, H, D]
    cos: jax.Array,  # [S, D//2]
    sin: jax.Array,
) -> jax.Array:
    """Rotary in the interleaved-pair convention (reference
    RotaryEmbedding(is_neox_style=False), complex multiply per pair)."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    a = xf[..., 0::2]
    b = xf[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([a * c - b * s, a * s + b * c], axis=-1)
    return out.reshape(x.shape).astype(orig)


# ----------------------------------------------------------------- forward
def timestep_embedding(
    cfg: QwenImageArchConfig, params: dict, t: jax.Array  # [B] in [0, 1]
) -> jax.Array:
    """Sinusoidal(256, flip_sin_to_cos, scale=1000) -> MLP -> [B, D]
    (reference QwenTimestepProjEmbeddings, qwen_image_transformer.py:160;
    the pipeline passes sigma and the x1000 scale restores the trained
    range)."""
    half = 128
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = 1000.0 * t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    emb = emb.astype(_dtype(cfg))
    h = jnp.dot(emb, params["t_emb_w1"]) + params["t_emb_b1"]
    h = jax.nn.silu(h.astype(jnp.float32)).astype(emb.dtype)
    return jnp.dot(h, params["t_emb_w2"]) + params["t_emb_b2"]


def _modulate(x: jax.Array, mod: jax.Array):
    """LayerNorm(no affine) already applied to x; mod [B, 3D] ->
    (x * (1+scale) + shift, gate)."""
    shift, scale, gate = jnp.split(mod, 3, axis=-1)
    return (
        x * (1.0 + scale[:, None, :]) + shift[:, None, :],
        gate[:, None, :],
    )


def _layer_norm(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


def _mlp_gelu(x, w1, b1, w2, b2):
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1.astype(
        jnp.float32
    )
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    return jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2.astype(
        jnp.float32
    )


def forward(
    cfg: QwenImageArchConfig,
    params: dict,
    img_tokens: jax.Array,  # [B, S_img, in_channels] packed latents
    txt_embeds: jax.Array,  # [B, S_txt, joint_attention_dim] (padded)
    txt_lens: jax.Array,  # [B] int32 valid text lengths
    timestep: jax.Array,  # [B] fp, sigma in [0, 1]
    img_shape: tuple[int, int, int],  # static (frames, lat_h//2, lat_w//2)
    *,
    parallel=None,  # diffusion.parallel.ShardInfo inside shard_map
) -> jax.Array:
    """Velocity prediction [B, S_img, patch**2 * out_channels].

    With ``parallel`` set this runs INSIDE shard_map over the diffusion
    mesh (the reference's Attention layer consulting the active parallel
    strategy, attention/layer.py:94): img_tokens arrive sequence-sharded
    over sp (the S_img here is the LOCAL token count), weights arrive
    tp/fsdp-sharded per param_pspecs, attention routes through
    ulysses_joint_attention, and row-parallel projections psum over tp.
    """
    b, s_img, _ = img_tokens.shape
    s_txt = txt_embeds.shape[1]
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    pl = parallel
    sp_axis = pl.sp_axis if pl else None
    tp_axis = pl.tp_axis if pl else None
    sp_size = pl.sp_size if pl else 1

    img = (
        jnp.dot(img_tokens.astype(_dtype(cfg)), params["img_in_w"])
        + params["img_in_b"]
    )
    txt = rms_norm(
        txt_embeds.astype(_dtype(cfg)), params["txt_norm"], 1e-6
    )
    txt = jnp.dot(txt, params["txt_in_w"]) + params["txt_in_b"]

    temb = timestep_embedding(cfg, params, timestep)  # [B, D]
    temb_act = jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype)

    icos, isin, tcos, tsin = rope_cos_sin_3d(cfg, img_shape, s_txt)
    if sp_axis is not None:
        # this shard's rows of the (full, statically-shaped) image table
        sp_idx = jax.lax.axis_index(sp_axis)
        icos = jax.lax.dynamic_slice_in_dim(icos, sp_idx * s_img, s_img, 0)
        isin = jax.lax.dynamic_slice_in_dim(isin, sp_idx * s_img, s_img, 0)
    joint_lens = (s_img + txt_lens).astype(jnp.int32)

    def _row_out(x, w, bias, dtype):
        """Row-parallel projection: dot -> psum over tp -> + bias."""
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        if tp_axis is not None:
            y = jax.lax.psum(y, tp_axis)
        return (y + bias.astype(jnp.float32)).astype(dtype)

    def block(carry, lp):
        img, txt = carry
        img_mod = (
            jnp.dot(temb_act, lp["img_mod_w"]) + lp["img_mod_b"]
        )  # [B, 6D]
        txt_mod = jnp.dot(temb_act, lp["txt_mod_w"]) + lp["txt_mod_b"]
        img_mod1, img_mod2 = jnp.split(img_mod, 2, axis=-1)
        txt_mod1, txt_mod2 = jnp.split(txt_mod, 2, axis=-1)

        # ---- joint attention
        img_n, img_gate1 = _modulate(_layer_norm(img), img_mod1)
        txt_n, txt_gate1 = _modulate(_layer_norm(txt), txt_mod1)

        def qkv(x, w, bias, qn, kn, cos, sin):
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

        iq, ik, iv = qkv(
            img_n, lp["img_qkv_w"], lp["img_qkv_b"],
            lp["img_q_norm"], lp["img_k_norm"], icos, isin,
        )
        tq, tk, tv = qkv(
            txt_n, lp["txt_qkv_w"], lp["txt_qkv_b"],
            lp["txt_q_norm"], lp["txt_k_norm"], tcos, tsin,
        )
        n_loc = iq.shape[2]
        if sp_axis is not None:
            from ht_vllm_omni_tpu.diffusion.distributed.sp_ulysses import (
                ulysses_joint_attention,
            )

            o_imgs, o_txts = [], []
            for i in range(b):  # b is 1 (cfg-parallel) or 2; static
                oi, ot = ulysses_joint_attention(
                    iq[i].transpose(1, 0, 2), ik[i].transpose(1, 0, 2),
                    iv[i].transpose(1, 0, 2), tq[i].transpose(1, 0, 2),
                    tk[i].transpose(1, 0, 2), tv[i].transpose(1, 0, 2),
                    axis=sp_axis, sp_size=sp_size, txt_len=txt_lens[i],
                )
                o_imgs.append(oi.transpose(1, 0, 2))
                o_txts.append(ot.transpose(1, 0, 2))
            o_img = jnp.stack(o_imgs).reshape(b, s_img, n_loc * hd)
            o_txt = jnp.stack(o_txts).reshape(b, s_txt, n_loc * hd)
        else:
            # [img || txt]: text padding is a tail the kernel masks via
            # lens
            q = jnp.concatenate([iq, tq], axis=1).transpose(0, 2, 1, 3)
            k = jnp.concatenate([ik, tk], axis=1).transpose(0, 2, 1, 3)
            v = jnp.concatenate([iv, tv], axis=1).transpose(0, 2, 1, 3)
            o = flash_attention(q, k, v, joint_lens, causal=False)
            o = o.transpose(0, 2, 1, 3).reshape(
                b, s_img + s_txt, n_loc * hd
            )
            o_img, o_txt = o[:, :s_img], o[:, s_img:]

        img = img + img_gate1 * _row_out(
            o_img, lp["img_attn_out_w"], lp["img_attn_out_b"], img.dtype
        )
        txt = txt + txt_gate1 * _row_out(
            o_txt, lp["txt_attn_out_w"], lp["txt_attn_out_b"], txt.dtype
        )

        # ---- MLPs (column -> row parallel; psum folded into _row_out)
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

    fsdp_axes = pl.fsdp_axes if pl else None

    def block_fsdp(carry, lp):
        return block(carry, _gather_fsdp(lp, fsdp_axes))

    (img, txt), _ = jax.lax.scan(
        block_fsdp if fsdp_axes else block, (img, txt),
        _layer_params(params),
    )

    # AdaLN-continuous head: linear(silu(temb)) -> (scale, shift)
    # (diffusers AdaLayerNormContinuous order: scale first)
    head = jnp.dot(temb_act, params["norm_out_w"]) + params["norm_out_b"]
    scale, shift = jnp.split(head, 2, axis=-1)
    img = _layer_norm(img) * (1.0 + scale[:, None, :]) + shift[:, None, :]
    out = (
        jnp.dot(img, params["proj_out_w"], preferred_element_type=jnp.float32)
        + params["proj_out_b"].astype(jnp.float32)
    )
    return out
