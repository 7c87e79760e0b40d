"""Diffusers-format checkpoint loading for the Qwen-Image family.

Maps diffusers safetensors key layouts into this repo's stacked-layer
pytrees (counterpart of the reference's diffusers loader +
per-model ``load_weights``, reference
vllm_omni/diffusion/models/qwen_image/qwen_image_transformer.py:1140 and
vllm_omni/diffusion/model_loader/diffusers_loader.py):

- transformer:  ``transformer_blocks.{i}.attn.to_q/k/v`` fuse into one
  [in, 3D] qkv matrix per stream (the reference's QKVParallelLinear
  packing), linears transpose to [in, out], per-layer tensors stack on
  a leading axis.
- vae: torch Conv3d [out, in, kt, kh, kw] -> [kt, kh, kw, in, out];
  Conv2d gains a singleton kt; RMS-norm gammas squeeze to [C].
"""

from __future__ import annotations

import glob
import os

import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
    QwenImageArchConfig,
    QwenImageVAEConfig,
)


def _read_all(path: str) -> dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    out: dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {path}")
    for f in files:
        out.update(load_file(f))
    return out


def _f32(t: np.ndarray) -> np.ndarray:
    if t.dtype == np.uint16:  # bf16 via safetensors.numpy
        return np.asarray(
            jnp.asarray(t).view(jnp.bfloat16), dtype=np.float32
        )
    return t.astype(np.float32)


# ------------------------------------------------------------ transformer
def load_transformer(
    cfg: QwenImageArchConfig,
    tensors: dict[str, np.ndarray] | str,
    dtype=None,
) -> dict:
    """``tensors`` is a state-dict (diffusers names) or a directory."""
    if isinstance(tensors, str):
        tensors = _read_all(tensors)
    dt = jnp.dtype(dtype or cfg.dtype)
    nl = cfg.num_layers

    def g(name):
        return _f32(tensors[name])

    def lin(name):  # [out, in] -> [in, out]
        return g(name + ".weight").T

    p = {
        "img_in_w": lin("img_in"), "img_in_b": g("img_in.bias"),
        "txt_norm": g("txt_norm.weight"),
        "txt_in_w": lin("txt_in"), "txt_in_b": g("txt_in.bias"),
        "t_emb_w1": lin("time_text_embed.timestep_embedder.linear_1"),
        "t_emb_b1": g("time_text_embed.timestep_embedder.linear_1.bias"),
        "t_emb_w2": lin("time_text_embed.timestep_embedder.linear_2"),
        "t_emb_b2": g("time_text_embed.timestep_embedder.linear_2.bias"),
        "norm_out_w": lin("norm_out.linear"),
        "norm_out_b": g("norm_out.linear.bias"),
        "proj_out_w": lin("proj_out"), "proj_out_b": g("proj_out.bias"),
    }

    def stack(fn):
        return np.stack([fn(f"transformer_blocks.{i}.") for i in range(nl)])

    def qkv_w(pre, names):
        return lambda b: np.concatenate(
            [g(b + pre + n + ".weight").T for n in names], axis=1
        )

    def qkv_b(pre, names):
        return lambda b: np.concatenate(
            [g(b + pre + n + ".bias") for n in names]
        )

    layer_map = {
        "img_mod_w": lambda b: g(b + "img_mod.1.weight").T,
        "img_mod_b": lambda b: g(b + "img_mod.1.bias"),
        "txt_mod_w": lambda b: g(b + "txt_mod.1.weight").T,
        "txt_mod_b": lambda b: g(b + "txt_mod.1.bias"),
        "img_qkv_w": qkv_w("attn.", ("to_q", "to_k", "to_v")),
        "img_qkv_b": qkv_b("attn.", ("to_q", "to_k", "to_v")),
        "txt_qkv_w": qkv_w(
            "attn.", ("add_q_proj", "add_k_proj", "add_v_proj")
        ),
        "txt_qkv_b": qkv_b(
            "attn.", ("add_q_proj", "add_k_proj", "add_v_proj")
        ),
        "img_q_norm": lambda b: g(b + "attn.norm_q.weight"),
        "img_k_norm": lambda b: g(b + "attn.norm_k.weight"),
        "txt_q_norm": lambda b: g(b + "attn.norm_added_q.weight"),
        "txt_k_norm": lambda b: g(b + "attn.norm_added_k.weight"),
        "img_attn_out_w": lambda b: g(b + "attn.to_out.0.weight").T,
        "img_attn_out_b": lambda b: g(b + "attn.to_out.0.bias"),
        "txt_attn_out_w": lambda b: g(b + "attn.to_add_out.weight").T,
        "txt_attn_out_b": lambda b: g(b + "attn.to_add_out.bias"),
        "img_mlp_w1": lambda b: g(b + "img_mlp.net.0.proj.weight").T,
        "img_mlp_b1": lambda b: g(b + "img_mlp.net.0.proj.bias"),
        "img_mlp_w2": lambda b: g(b + "img_mlp.net.2.weight").T,
        "img_mlp_b2": lambda b: g(b + "img_mlp.net.2.bias"),
        "txt_mlp_w1": lambda b: g(b + "txt_mlp.net.0.proj.weight").T,
        "txt_mlp_b1": lambda b: g(b + "txt_mlp.net.0.proj.bias"),
        "txt_mlp_w2": lambda b: g(b + "txt_mlp.net.2.weight").T,
        "txt_mlp_b2": lambda b: g(b + "txt_mlp.net.2.bias"),
    }
    for k, fn in layer_map.items():
        p[k] = stack(fn)
    return {k: jnp.asarray(v, dt) for k, v in p.items()}


# -------------------------------------------------------------------- vae
def _conv3(tensors, name) -> dict:
    w = _f32(tensors[name + ".weight"])
    if w.ndim == 4:  # Conv2d [out, in, kh, kw]
        w = w[:, :, None]
    # [out, in, kt, kh, kw] -> [kt, kh, kw, in, out]
    return {
        "w": w.transpose(2, 3, 4, 1, 0),
        "b": _f32(tensors[name + ".bias"]),
    }


def _gamma(tensors, name) -> np.ndarray:
    return _f32(tensors[name + ".gamma"]).reshape(-1)


def _res(tensors, base) -> dict:
    p = {
        "norm1": _gamma(tensors, base + ".norm1"),
        "conv1": _conv3(tensors, base + ".conv1"),
        "norm2": _gamma(tensors, base + ".norm2"),
        "conv2": _conv3(tensors, base + ".conv2"),
    }
    if base + ".conv_shortcut.weight" in tensors:
        p["shortcut"] = _conv3(tensors, base + ".conv_shortcut")
    return p


def _mid(tensors, base) -> dict:
    return {
        "res0": _res(tensors, base + ".resnets.0"),
        "attn": {
            "norm": _gamma(tensors, base + ".attentions.0.norm"),
            "qkv": _conv3(tensors, base + ".attentions.0.to_qkv"),
            "proj": _conv3(tensors, base + ".attentions.0.proj"),
        },
        "res1": _res(tensors, base + ".resnets.1"),
    }


def load_vae(
    cfg: QwenImageVAEConfig,
    tensors: dict[str, np.ndarray] | str,
    dtype=None,
) -> dict:
    if isinstance(tensors, str):
        tensors = _read_all(tensors)
    dt = jnp.dtype(dtype or cfg.dtype)
    mult = list(cfg.dim_mult)

    dec = {
        "conv_in": _conv3(tensors, "decoder.conv_in"),
        "mid": _mid(tensors, "decoder.mid_block"),
        "up": [],
        "norm_out": _gamma(tensors, "decoder.norm_out"),
        "conv_out": _conv3(tensors, "decoder.conv_out"),
    }
    for i in range(len(mult)):
        blk = {"res": [], "upsample": None}
        for j in range(cfg.num_res_blocks + 1):
            blk["res"].append(
                _res(tensors, f"decoder.up_blocks.{i}.resnets.{j}")
            )
        up_key = f"decoder.up_blocks.{i}.upsamplers.0.resample.1.weight"
        if up_key in tensors:
            blk["upsample"] = _conv3(
                tensors, f"decoder.up_blocks.{i}.upsamplers.0.resample.1"
            )
        dec["up"].append(blk)

    # encoder down_blocks is a FLAT list: per stage num_res_blocks
    # residuals then (if not last) one resample (reference
    # autoencoder_kl_qwenimage.py:416-429)
    enc = {
        "conv_in": _conv3(tensors, "encoder.conv_in"),
        "down": [],
        "mid": _mid(tensors, "encoder.mid_block"),
        "norm_out": _gamma(tensors, "encoder.norm_out"),
        "conv_out": _conv3(tensors, "encoder.conv_out"),
    }
    flat = 0
    for i in range(len(mult)):
        blk = {"res": [], "downsample": None}
        for _ in range(cfg.num_res_blocks):
            blk["res"].append(
                _res(tensors, f"encoder.down_blocks.{flat}")
            )
            flat += 1
        if i != len(mult) - 1:
            blk["downsample"] = _conv3(
                tensors, f"encoder.down_blocks.{flat}.resample.1"
            )
            flat += 1
        enc["down"].append(blk)

    out = {
        "decoder": dec,
        "encoder": enc,
        "quant_conv": _conv3(tensors, "quant_conv"),
        "post_quant_conv": _conv3(tensors, "post_quant_conv"),
    }
    import jax

    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dt), out)
