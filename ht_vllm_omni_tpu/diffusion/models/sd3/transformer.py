"""SD3 / SD3.5 MMDiT transformer in jax.

Semantics follow the reference SD3Transformer2DModel (reference
vllm_omni/diffusion/models/sd3/sd3_transformer.py:264-547):

- Conv patch embed (p=2) + a *learned* positional grid cropped centered
  from ``pos_embed_max_size`` (no RoPE — unlike Flux/Qwen-Image);
- CombinedTimestepTextProjEmbeddings: sinusoidal-timestep MLP + pooled
  CLIP-projection MLP, summed;
- N-1 homogeneous MMDiT blocks (AdaLN-zero per stream, one joint
  attention over [txt || img], gelu-tanh FFN) run under ``lax.scan``;
  SD3.5's dual-attention layers add a second image-only attention
  (masked per layer so the scan stays homogeneous), and qk RMS-norm;
- a final context_pre_only block (reference sd3_transformer.py:437:
  ``context_pre_only=i == num_layers - 1``) run unrolled: the text
  stream gets AdaLN-continuous normalization, contributes K/V but takes
  no residual update;
- AdaLN-continuous head + unpatchify.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.models.flux.transformer import _sin_proj
from ht_vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
    _layer_norm,
    _mlp_gelu,
)
from ht_vllm_omni_tpu.diffusion.models.sd3.config import SD3ArchConfig
from ht_vllm_omni_tpu.models.layers import rms_norm
from ht_vllm_omni_tpu.ops.flash_attention import flash_attention


def _dt(cfg: SD3ArchConfig):
    return jnp.dtype(cfg.dtype)


# --------------------------------------------------------------------- init
def init_params(cfg: SD3ArchConfig, key: jax.Array) -> dict:
    dt = _dt(cfg)
    d = cfg.inner_dim
    nl = cfg.num_layers - 1  # scanned blocks; final block separate
    hd = cfg.attention_head_dim
    p_in = cfg.patch_size**2 * cfg.in_channels
    mlp = 4 * d
    keys = iter(jax.random.split(key, 64))

    def w(shape, scale=None):
        scale = scale or (1.0 / math.sqrt(shape[-2] if len(shape) > 1 else 1))
        return (
            jax.random.normal(next(keys), shape, jnp.float32) * scale
        ).astype(dt)

    def z(shape):
        return jnp.zeros(shape, dt)

    p = {
        "patch_w": w((p_in, d)), "patch_b": z((d,)),
        "pos_embed": w((cfg.pos_embed_max_size**2, d), scale=0.02),
        "t_emb_w1": w((256, d)), "t_emb_b1": z((d,)),
        "t_emb_w2": w((d, d)), "t_emb_b2": z((d,)),
        "pool_w1": w((cfg.pooled_projection_dim, d)), "pool_b1": z((d,)),
        "pool_w2": w((d, d)), "pool_b2": z((d,)),
        "ctx_w": w((cfg.joint_attention_dim, cfg.caption_projection_dim)),
        "ctx_b": z((cfg.caption_projection_dim,)),
        "norm_out_w": w((d, 2 * d)), "norm_out_b": z((2 * d,)),
        "proj_out_w": w((d, cfg.patch_size**2 * cfg.out_channels)),
        "proj_out_b": z((cfg.patch_size**2 * cfg.out_channels,)),
    }

    def block(n):
        bp = {
            "img_mod_w": w((n, d, 6 * d)), "img_mod_b": z((n, 6 * d)),
            "img_qkv_w": w((n, d, 3 * d)), "img_qkv_b": z((n, 3 * d)),
            "img_attn_out_w": w((n, d, d)), "img_attn_out_b": z((n, d)),
            "txt_qkv_w": w((n, d, 3 * d)), "txt_qkv_b": z((n, 3 * d)),
            "img_mlp_w1": w((n, d, mlp)), "img_mlp_b1": z((n, mlp)),
            "img_mlp_w2": w((n, mlp, d)), "img_mlp_b2": z((n, d)),
        }
        if cfg.qk_norm == "rms_norm":
            for s in ("img", "txt"):
                bp[f"{s}_q_norm"] = jnp.ones((n, hd), dt)
                bp[f"{s}_k_norm"] = jnp.ones((n, hd), dt)
        return bp

    scanned = block(nl)
    # standard blocks also update the text stream
    scanned.update(
        {
            "txt_mod_w": w((nl, d, 6 * d)), "txt_mod_b": z((nl, 6 * d)),
            "txt_attn_out_w": w((nl, d, d)), "txt_attn_out_b": z((nl, d)),
            "txt_mlp_w1": w((nl, d, mlp)), "txt_mlp_b1": z((nl, mlp)),
            "txt_mlp_w2": w((nl, mlp, d)), "txt_mlp_b2": z((nl, d)),
        }
    )
    if cfg.dual_attention_layers:
        scanned.update(
            {
                # SD35AdaLayerNormZeroX emits 9 mods (3 extra for attn2)
                "img_mod2_w": w((nl, d, 3 * d)),
                "img_mod2_b": z((nl, 3 * d)),
                "dual_qkv_w": w((nl, d, 3 * d)),
                "dual_qkv_b": z((nl, 3 * d)),
                "dual_out_w": w((nl, d, d)),
                "dual_out_b": z((nl, d)),
                "dual_q_norm": jnp.ones((nl, hd), dt),
                "dual_k_norm": jnp.ones((nl, hd), dt),
                "dual_mask": jnp.asarray(
                    [
                        1.0 if i in cfg.dual_attention_layers else 0.0
                        for i in range(nl)
                    ],
                    dt,
                ),
            }
        )
    p["blocks"] = scanned

    # final context_pre_only block
    fin = {k: v[0] for k, v in block(1).items()}
    fin.update(
        {
            "txt_norm_w": w((d, 2 * d)),  # AdaLayerNormContinuous
            "txt_norm_b": z((2 * d,)),
        }
    )
    p["final"] = fin
    return p


def _ada_zero(x, temb_act, mod_w, mod_b):
    """AdaLayerNormZero: chunk order shift/scale/gate msa, shift/scale/
    gate mlp (diffusers semantics, cited in the reference block)."""
    mod = jnp.dot(temb_act, mod_w) + mod_b
    s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = jnp.split(mod, 6, axis=-1)
    xn = _layer_norm(x) * (1.0 + sc_msa[:, None]) + s_msa[:, None]
    return xn, g_msa[:, None], s_mlp, sc_mlp, g_mlp[:, None]


def _heads(x, b, nh, hd):
    return x.reshape(b, -1, nh, hd).transpose(0, 2, 1, 3)


def forward(
    cfg: SD3ArchConfig,
    params: dict,
    latents: jax.Array,  # [B, C, H, W]
    txt_embeds: jax.Array,  # [B, S_txt, joint_attention_dim]
    pooled: jax.Array,  # [B, pooled_projection_dim]
    timestep: jax.Array,  # [B] in [0, 1] (scaled x1000 like the ref)
    *,
    parallel=None,  # diffusion.parallel.ShardInfo inside shard_map
) -> jax.Array:
    """Velocity prediction [B, C, H, W].

    With ``parallel`` set (shard_map over the diffusion mesh), the
    image token stream shards over sp after the (cheap, replicated)
    patch embed; joint attention routes through
    sp_ulysses.ulysses_joint_attention (the txt-first concat reorders to
    [img || txt] — full attention is permutation-invariant) and the
    output gathers over sp before unpatchify.  Weights stay replicated
    (cfg x sp only; SD3's per-stream qk norms and dual-attention layers
    make a TP plan a separate project)."""
    dt = _dt(cfg)
    b, c, hpx, wpx = latents.shape
    ps = cfg.patch_size
    h, w = hpx // ps, wpx // ps
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    d = cfg.inner_dim
    s_txt = txt_embeds.shape[1]
    s_img = h * w
    pl = parallel
    sp_axis = pl.sp_axis if pl else None
    sp_size = pl.sp_size if pl else 1
    if pl is not None and pl.tp_size > 1:
        raise ValueError("sd3 supports cfg x sp parallelism (no tp plan)")

    # patchify: [B,C,H,W] -> [B, h*w, C*ps*ps] with (c, kh, kw) order
    x = latents.astype(dt).reshape(b, c, h, ps, w, ps)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, s_img, c * ps * ps)
    img = jnp.dot(x, params["patch_w"]) + params["patch_b"]

    # centered crop of the learned positional grid
    m = cfg.pos_embed_max_size
    top, left = (m - h) // 2, (m - w) // 2
    pos = params["pos_embed"].reshape(m, m, d)[
        top : top + h, left : left + w
    ].reshape(s_img, d)
    img = img + pos[None]

    if sp_axis is not None:
        # keep only this shard's token range (patch embed was replicated)
        s_loc = s_img // sp_size
        sp_idx = jax.lax.axis_index(sp_axis)
        img = jax.lax.dynamic_slice_in_dim(img, sp_idx * s_loc, s_loc, 1)
        s_img = s_loc

    txt = jnp.dot(txt_embeds.astype(dt), params["ctx_w"]) + params["ctx_b"]
    # caption_projection_dim == inner_dim in all SD3 variants
    assert txt.shape[-1] == d

    # CombinedTimestepTextProjEmbeddings: sinusoid(256, cos-first, x1000)
    # -> MLP, plus pooled-projection MLP, summed
    temb = _sin_proj(
        timestep, params["t_emb_w1"], params["t_emb_b1"],
        params["t_emb_w2"], params["t_emb_b2"], dt,
    )
    ph = jnp.dot(pooled.astype(dt), params["pool_w1"]) + params["pool_b1"]
    ph = jax.nn.silu(ph.astype(jnp.float32)).astype(dt)
    temb = temb + jnp.dot(ph, params["pool_w2"]) + params["pool_b2"]
    temb_act = jax.nn.silu(temb.astype(jnp.float32)).astype(dt)

    use_qknorm = cfg.qk_norm == "rms_norm"
    joint_lens = jnp.full((b,), s_txt + s_img, jnp.int32)

    def attn_io(img_n, txt_n, lp, prefix_img="img", prefix_txt="txt"):
        iy = jnp.dot(img_n, lp[f"{prefix_img}_qkv_w"]) + (
            lp[f"{prefix_img}_qkv_b"]
        )
        ty = jnp.dot(txt_n, lp[f"{prefix_txt}_qkv_w"]) + (
            lp[f"{prefix_txt}_qkv_b"]
        )
        iq, ik, iv = (
            _heads(t, b, nh, hd) for t in jnp.split(iy, 3, axis=-1)
        )
        tq, tk, tv = (
            _heads(t, b, nh, hd) for t in jnp.split(ty, 3, axis=-1)
        )
        if use_qknorm:
            # the per-position norm tables are stream-wise constants:
            # applying them per stream before the concat is identical
            iq = rms_norm(iq, lp[f"{prefix_img}_q_norm"], 1e-6)
            ik = rms_norm(ik, lp[f"{prefix_img}_k_norm"], 1e-6)
            tq = rms_norm(tq, lp[f"{prefix_txt}_q_norm"], 1e-6)
            tk = rms_norm(tk, lp[f"{prefix_txt}_k_norm"], 1e-6)
        if sp_axis is not None:
            from ht_vllm_omni_tpu.diffusion.distributed.sp_ulysses import (
                ulysses_joint_attention,
            )

            o_imgs, o_txts = [], []
            for i in range(b):  # [B, H, S, D] -> per-sample [H, S, D]
                oi, ot = ulysses_joint_attention(
                    iq[i], ik[i], iv[i], tq[i], tk[i], tv[i],
                    axis=sp_axis, sp_size=sp_size, txt_len=s_txt,
                )
                o_imgs.append(oi)
                o_txts.append(ot)
            o_img = jnp.stack(o_imgs).transpose(0, 2, 1, 3).reshape(
                b, s_img, d
            )
            o_txt = jnp.stack(o_txts).transpose(0, 2, 1, 3).reshape(
                b, s_txt, d
            )
            return o_txt, o_img
        q = jnp.concatenate([tq, iq], axis=2)
        k = jnp.concatenate([tk, ik], axis=2)
        v = jnp.concatenate([tv, iv], axis=2)
        o = flash_attention(q, k, v, joint_lens, causal=False)
        o = o.transpose(0, 2, 1, 3).reshape(b, s_txt + s_img, d)
        return o[:, :s_txt], o[:, s_txt:]

    def block(carry, lp):
        img, txt = carry
        img_n, ig, i_smlp, i_scmlp, igm = _ada_zero(
            img, temb_act, lp["img_mod_w"], lp["img_mod_b"]
        )
        txt_n, tg, t_smlp, t_scmlp, tgm = _ada_zero(
            txt, temb_act, lp["txt_mod_w"], lp["txt_mod_b"]
        )
        o_txt, o_img = attn_io(img_n, txt_n, lp)
        img = img + ig * (
            jnp.dot(o_img, lp["img_attn_out_w"]) + lp["img_attn_out_b"]
        ).astype(img.dtype)
        txt = txt + tg * (
            jnp.dot(o_txt, lp["txt_attn_out_w"]) + lp["txt_attn_out_b"]
        ).astype(txt.dtype)

        if cfg.dual_attention_layers:
            mod2 = jnp.dot(temb_act, lp["img_mod2_w"]) + lp["img_mod2_b"]
            s2, sc2, g2 = jnp.split(mod2, 3, axis=-1)
            xn2 = _layer_norm(img) * (1.0 + sc2[:, None]) + s2[:, None]
            y = jnp.dot(xn2, lp["dual_qkv_w"]) + lp["dual_qkv_b"]
            q, k, v = jnp.split(y, 3, axis=-1)
            q = rms_norm(
                _heads(q, b, nh, hd), lp["dual_q_norm"][None, None], 1e-6
            )
            k = rms_norm(
                _heads(k, b, nh, hd), lp["dual_k_norm"][None, None], 1e-6
            )
            vh = _heads(v, b, nh, hd)
            if sp_axis is not None:
                from ht_vllm_omni_tpu.diffusion.distributed.sp_ulysses import (
                    ulysses_attention,
                    ulysses_attention_uneven,
                )

                fn2 = (
                    ulysses_attention
                    if nh % sp_size == 0
                    else ulysses_attention_uneven
                )
                o2 = jnp.stack([
                    fn2(q[i], k[i], vh[i], axis=sp_axis, sp_size=sp_size)
                    for i in range(b)
                ]).transpose(0, 2, 1, 3).reshape(b, s_img, d)
            else:
                o2 = flash_attention(
                    q, k, vh,
                    jnp.full((b,), s_img, jnp.int32), causal=False,
                ).transpose(0, 2, 1, 3).reshape(b, s_img, d)
            o2 = (
                jnp.dot(o2, lp["dual_out_w"]) + lp["dual_out_b"]
            ).astype(img.dtype)
            img = img + lp["dual_mask"] * g2[:, None] * o2

        img_n2 = _layer_norm(img) * (1.0 + i_scmlp[:, None]) + (
            i_smlp[:, None]
        )
        img = img + igm * _mlp_gelu(
            img_n2, lp["img_mlp_w1"], lp["img_mlp_b1"],
            lp["img_mlp_w2"], lp["img_mlp_b2"],
        ).astype(img.dtype)
        txt_n2 = _layer_norm(txt) * (1.0 + t_scmlp[:, None]) + (
            t_smlp[:, None]
        )
        txt = txt + tgm * _mlp_gelu(
            txt_n2, lp["txt_mlp_w1"], lp["txt_mlp_b1"],
            lp["txt_mlp_w2"], lp["txt_mlp_b2"],
        ).astype(txt.dtype)
        return (img, txt), None

    (img, txt), _ = jax.lax.scan(block, (img, txt), params["blocks"])

    # final context_pre_only block: text normalized by AdaLN-continuous,
    # supplies K/V only (reference sd3_transformer.py:337-344,371-376)
    fp = params["final"]
    img_n, ig, i_smlp, i_scmlp, igm = _ada_zero(
        img, temb_act, fp["img_mod_w"], fp["img_mod_b"]
    )
    fmod = jnp.dot(temb_act, fp["txt_norm_w"]) + fp["txt_norm_b"]
    fsc, fsh = jnp.split(fmod, 2, axis=-1)
    txt_n = _layer_norm(txt) * (1.0 + fsc[:, None]) + fsh[:, None]
    _, o_img = attn_io(img_n, txt_n, fp)
    img = img + ig * (
        jnp.dot(o_img, fp["img_attn_out_w"]) + fp["img_attn_out_b"]
    ).astype(img.dtype)
    img_n2 = _layer_norm(img) * (1.0 + i_scmlp[:, None]) + i_smlp[:, None]
    img = img + igm * _mlp_gelu(
        img_n2, fp["img_mlp_w1"], fp["img_mlp_b1"],
        fp["img_mlp_w2"], fp["img_mlp_b2"],
    ).astype(img.dtype)

    # AdaLN-continuous head (scale/shift chunk order)
    hmod = jnp.dot(temb_act, params["norm_out_w"]) + params["norm_out_b"]
    hsc, hsh = jnp.split(hmod, 2, axis=-1)
    img = _layer_norm(img) * (1.0 + hsc[:, None]) + hsh[:, None]
    out = jnp.dot(
        img, params["proj_out_w"], preferred_element_type=jnp.float32
    ) + params["proj_out_b"].astype(jnp.float32)

    if sp_axis is not None:
        # gather so every shard unpatchifies the full grid
        out = jax.lax.all_gather(out, sp_axis, axis=1, tiled=True)

    # unpatchify -> [B, C_out, H, W]
    co = cfg.out_channels
    out = out.reshape(b, h, w, ps, ps, co)
    out = out.transpose(0, 5, 1, 3, 2, 4).reshape(b, co, h * ps, w * ps)
    return out


# ------------------------------------------------------------------ loading
def load_diffusers(
    cfg: SD3ArchConfig, tensors: dict[str, np.ndarray] | str, dtype=None
) -> dict:
    """diffusers `SD3Transformer2DModel` state dict -> stacked pytree.

    Fuses to_q/k/v (and add_*_proj) into one qkv matrix — the packing the
    reference does via QKVParallelLinear + stacked_params_mapping
    (reference sd3_transformer.py:513-524).
    """
    if isinstance(tensors, str):
        import glob as g
        import os as o

        from safetensors.numpy import load_file

        merged: dict[str, np.ndarray] = {}
        for f in sorted(g.glob(o.path.join(tensors, "*.safetensors"))):
            merged.update(load_file(f))
        tensors = merged
    dt = jnp.dtype(dtype or cfg.dtype)

    def f32(t):
        if t.dtype == np.uint16:
            return np.asarray(
                jnp.asarray(t).view(jnp.bfloat16), dtype=np.float32
            )
        return t.astype(np.float32)

    g_ = lambda k: f32(tensors[k])  # noqa: E731
    L = cfg.num_layers
    d = cfg.inner_dim
    ps, ci = cfg.patch_size, cfg.in_channels

    conv = g_("pos_embed.proj.weight")  # [d, C, p, p]
    patch_w = conv.reshape(d, ci * ps * ps).T
    pos = g_("pos_embed.pos_embed")[0]  # [1, m*m, d]

    def mlp2(prefix):
        return (
            jnp.asarray(g_(f"{prefix}.linear_1.weight").T, dt),
            jnp.asarray(g_(f"{prefix}.linear_1.bias"), dt),
            jnp.asarray(g_(f"{prefix}.linear_2.weight").T, dt),
            jnp.asarray(g_(f"{prefix}.linear_2.bias"), dt),
        )

    t1, tb1, t2, tb2 = mlp2("time_text_embed.timestep_embedder")
    p1, pb1, p2, pb2 = mlp2("time_text_embed.text_embedder")

    p = {
        "patch_w": jnp.asarray(patch_w, dt),
        "patch_b": jnp.asarray(g_("pos_embed.proj.bias"), dt),
        "pos_embed": jnp.asarray(pos, dt),
        "t_emb_w1": t1, "t_emb_b1": tb1, "t_emb_w2": t2, "t_emb_b2": tb2,
        "pool_w1": p1, "pool_b1": pb1, "pool_w2": p2, "pool_b2": pb2,
        "ctx_w": jnp.asarray(g_("context_embedder.weight").T, dt),
        "ctx_b": jnp.asarray(g_("context_embedder.bias"), dt),
        "norm_out_w": jnp.asarray(g_("norm_out.linear.weight").T, dt),
        "norm_out_b": jnp.asarray(g_("norm_out.linear.bias"), dt),
        "proj_out_w": jnp.asarray(g_("proj_out.weight").T, dt),
        "proj_out_b": jnp.asarray(g_("proj_out.bias"), dt),
    }

    def qkv(i, names):
        pre = f"transformer_blocks.{i}.attn."
        ws = np.concatenate([g_(pre + n + ".weight").T for n in names], 1)
        bs = np.concatenate([g_(pre + n + ".bias") for n in names])
        return ws, bs

    def blocks(idx):
        n = len(idx)
        out = {}

        def st(fn):
            return jnp.asarray(np.stack([fn(i) for i in idx]), dt)

        pre = "transformer_blocks.{i}."
        out["img_qkv_w"] = st(
            lambda i: qkv(i, ("to_q", "to_k", "to_v"))[0]
        )
        out["img_qkv_b"] = st(
            lambda i: qkv(i, ("to_q", "to_k", "to_v"))[1]
        )
        out["txt_qkv_w"] = st(
            lambda i: qkv(i, ("add_q_proj", "add_k_proj", "add_v_proj"))[0]
        )
        out["txt_qkv_b"] = st(
            lambda i: qkv(i, ("add_q_proj", "add_k_proj", "add_v_proj"))[1]
        )
        out["img_mod_w"] = st(
            lambda i: g_(pre.format(i=i) + "norm1.linear.weight").T[:, :6 * d]
        )
        out["img_mod_b"] = st(
            lambda i: g_(pre.format(i=i) + "norm1.linear.bias")[: 6 * d]
        )
        out["img_attn_out_w"] = st(
            lambda i: g_(pre.format(i=i) + "attn.to_out.0.weight").T
        )
        out["img_attn_out_b"] = st(
            lambda i: g_(pre.format(i=i) + "attn.to_out.0.bias")
        )
        out["img_mlp_w1"] = st(
            lambda i: g_(pre.format(i=i) + "ff.net.0.proj.weight").T
        )
        out["img_mlp_b1"] = st(
            lambda i: g_(pre.format(i=i) + "ff.net.0.proj.bias")
        )
        out["img_mlp_w2"] = st(
            lambda i: g_(pre.format(i=i) + "ff.net.2.weight").T
        )
        out["img_mlp_b2"] = st(
            lambda i: g_(pre.format(i=i) + "ff.net.2.bias")
        )
        if cfg.qk_norm == "rms_norm":
            for s, hf in (("img", ""), ("txt", "added_")):
                out[f"{s}_q_norm"] = st(
                    lambda i, hf=hf: g_(
                        pre.format(i=i) + f"attn.norm_{hf}q.weight"
                    )
                )
                out[f"{s}_k_norm"] = st(
                    lambda i, hf=hf: g_(
                        pre.format(i=i) + f"attn.norm_{hf}k.weight"
                    )
                )
        return out

    scanned = blocks(list(range(L - 1)))
    scanned.update(
        {
            "txt_mod_w": jnp.asarray(
                np.stack(
                    [
                        g_(f"transformer_blocks.{i}.norm1_context.linear.weight").T
                        for i in range(L - 1)
                    ]
                ),
                dt,
            ),
            "txt_mod_b": jnp.asarray(
                np.stack(
                    [
                        g_(f"transformer_blocks.{i}.norm1_context.linear.bias")
                        for i in range(L - 1)
                    ]
                ),
                dt,
            ),
            "txt_attn_out_w": jnp.asarray(
                np.stack(
                    [
                        g_(f"transformer_blocks.{i}.attn.to_add_out.weight").T
                        for i in range(L - 1)
                    ]
                ),
                dt,
            ),
            "txt_attn_out_b": jnp.asarray(
                np.stack(
                    [
                        g_(f"transformer_blocks.{i}.attn.to_add_out.bias")
                        for i in range(L - 1)
                    ]
                ),
                dt,
            ),
        }
    )
    for nm, hf in (
        ("txt_mlp_w1", "ff_context.net.0.proj.weight"),
        ("txt_mlp_b1", "ff_context.net.0.proj.bias"),
        ("txt_mlp_w2", "ff_context.net.2.weight"),
        ("txt_mlp_b2", "ff_context.net.2.bias"),
    ):
        scanned[nm] = jnp.asarray(
            np.stack(
                [
                    g_(f"transformer_blocks.{i}.{hf}").T
                    if nm.endswith("_w1") or nm.endswith("_w2")
                    else g_(f"transformer_blocks.{i}.{hf}")
                    for i in range(L - 1)
                ]
            ),
            dt,
        )
    if cfg.dual_attention_layers:
        nl = L - 1
        zeros_w = np.zeros((cfg.inner_dim, 3 * d), np.float32)
        zeros_b = np.zeros((3 * d,), np.float32)
        zeros_o = np.zeros((d, d), np.float32)
        ones_n = np.ones((cfg.attention_head_dim,), np.float32)

        def dual(i, key_, fallback):
            k = f"transformer_blocks.{i}.{key_}"
            return g_(k) if k in tensors else fallback

        scanned["img_mod2_w"] = jnp.asarray(
            np.stack(
                [
                    g_(f"transformer_blocks.{i}.norm1.linear.weight").T[
                        :, 6 * d :
                    ]
                    if i in cfg.dual_attention_layers
                    else zeros_w
                    for i in range(nl)
                ]
            ),
            dt,
        )
        scanned["img_mod2_b"] = jnp.asarray(
            np.stack(
                [
                    g_(f"transformer_blocks.{i}.norm1.linear.bias")[6 * d :]
                    if i in cfg.dual_attention_layers
                    else zeros_b
                    for i in range(nl)
                ]
            ),
            dt,
        )
        scanned["dual_qkv_w"] = jnp.asarray(
            np.stack(
                [
                    np.concatenate(
                        [
                            dual(i, f"attn2.to_{n}.weight", None).T
                            for n in "qkv"
                        ],
                        1,
                    )
                    if i in cfg.dual_attention_layers
                    else zeros_w
                    for i in range(nl)
                ]
            ),
            dt,
        )
        scanned["dual_qkv_b"] = jnp.asarray(
            np.stack(
                [
                    np.concatenate(
                        [dual(i, f"attn2.to_{n}.bias", None) for n in "qkv"]
                    )
                    if i in cfg.dual_attention_layers
                    else zeros_b
                    for i in range(nl)
                ]
            ),
            dt,
        )
        scanned["dual_out_w"] = jnp.asarray(
            np.stack(
                [
                    dual(i, "attn2.to_out.0.weight", zeros_o.T).T
                    if i in cfg.dual_attention_layers
                    else zeros_o
                    for i in range(nl)
                ]
            ),
            dt,
        )
        scanned["dual_out_b"] = jnp.asarray(
            np.stack(
                [
                    dual(i, "attn2.to_out.0.bias", None)
                    if i in cfg.dual_attention_layers
                    else np.zeros((d,), np.float32)
                    for i in range(nl)
                ]
            ),
            dt,
        )
        scanned["dual_q_norm"] = jnp.asarray(
            np.stack(
                [
                    dual(i, "attn2.norm_q.weight", ones_n)
                    if i in cfg.dual_attention_layers
                    else ones_n
                    for i in range(nl)
                ]
            ),
            dt,
        )
        scanned["dual_k_norm"] = jnp.asarray(
            np.stack(
                [
                    dual(i, "attn2.norm_k.weight", ones_n)
                    if i in cfg.dual_attention_layers
                    else ones_n
                    for i in range(nl)
                ]
            ),
            dt,
        )
        scanned["dual_mask"] = jnp.asarray(
            [
                1.0 if i in cfg.dual_attention_layers else 0.0
                for i in range(nl)
            ],
            dt,
        )

    p["blocks"] = scanned

    i = L - 1
    fin = {
        "img_qkv_w": jnp.asarray(qkv(i, ("to_q", "to_k", "to_v"))[0], dt),
        "img_qkv_b": jnp.asarray(qkv(i, ("to_q", "to_k", "to_v"))[1], dt),
        "txt_qkv_w": jnp.asarray(
            qkv(i, ("add_q_proj", "add_k_proj", "add_v_proj"))[0], dt
        ),
        "txt_qkv_b": jnp.asarray(
            qkv(i, ("add_q_proj", "add_k_proj", "add_v_proj"))[1], dt
        ),
        "img_mod_w": jnp.asarray(
            g_(f"transformer_blocks.{i}.norm1.linear.weight").T[:, : 6 * d],
            dt,
        ),
        "img_mod_b": jnp.asarray(
            g_(f"transformer_blocks.{i}.norm1.linear.bias")[: 6 * d], dt
        ),
        "img_attn_out_w": jnp.asarray(
            g_(f"transformer_blocks.{i}.attn.to_out.0.weight").T, dt
        ),
        "img_attn_out_b": jnp.asarray(
            g_(f"transformer_blocks.{i}.attn.to_out.0.bias"), dt
        ),
        "img_mlp_w1": jnp.asarray(
            g_(f"transformer_blocks.{i}.ff.net.0.proj.weight").T, dt
        ),
        "img_mlp_b1": jnp.asarray(
            g_(f"transformer_blocks.{i}.ff.net.0.proj.bias"), dt
        ),
        "img_mlp_w2": jnp.asarray(
            g_(f"transformer_blocks.{i}.ff.net.2.weight").T, dt
        ),
        "img_mlp_b2": jnp.asarray(
            g_(f"transformer_blocks.{i}.ff.net.2.bias"), dt
        ),
        "txt_norm_w": jnp.asarray(
            g_(f"transformer_blocks.{i}.norm1_context.linear.weight").T, dt
        ),
        "txt_norm_b": jnp.asarray(
            g_(f"transformer_blocks.{i}.norm1_context.linear.bias"), dt
        ),
    }
    if cfg.qk_norm == "rms_norm":
        for s, hf in (("img", ""), ("txt", "added_")):
            fin[f"{s}_q_norm"] = jnp.asarray(
                g_(f"transformer_blocks.{i}.attn.norm_{hf}q.weight"), dt
            )
            fin[f"{s}_k_norm"] = jnp.asarray(
                g_(f"transformer_blocks.{i}.attn.norm_{hf}k.weight"), dt
            )
    p["final"] = fin
    return p
