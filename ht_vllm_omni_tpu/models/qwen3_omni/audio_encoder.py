"""Qwen3-Omni audio encoder (mel -> thinker embedding space) in jax.

Architecture (reference vllm_omni/model_executor/models/qwen3_omni/
qwen3_omni_moe_thinker.py:318 `Qwen3OmniMoeAudioEncoder`; numerics pinned
to transformers' Qwen3OmniMoeAudioEncoder):

  mel [M, T] -> split into chunks of 2*n_window frames
      -> 3x Conv2d(k=3, s=2, p=1) + GELU over (freq, time)
      -> linear conv_out to d_model, + per-chunk sinusoid positions
      -> N pre-LN transformer layers, bidirectional attention restricted
         to windows of n_window_infer input frames (block-diagonal mask)
      -> ln_post -> proj1 -> GELU -> proj2 (output_dim = thinker hidden)

TPU shaping: one utterance per call, mel padded to a whole number of
chunks (host buckets T), everything static-shape.  Because every
non-final chunk contributes exactly t_conv tokens, the "compact valid
tokens" step of the torch code is the identity on the valid prefix, so
we keep the padded layout and mask instead of gathering.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AudioEncoderConfig:
    num_mel_bins: int = 128
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    downsample_hidden_size: int = 480
    output_dim: int = 2048
    n_window: int = 50
    n_window_infer: int = 800
    max_source_positions: int = 1500
    dtype: str = "float32"

    @property
    def chunk_frames(self) -> int:
        return 2 * self.n_window

    def conv_out_len(self, t: int) -> int:
        """Output length of the 3 stride-2 convs for input length t."""
        for _ in range(3):
            t = (t - 1) // 2 + 1
        return t

    @property
    def freq_after_conv(self) -> int:
        f = self.num_mel_bins
        for _ in range(3):
            f = (f - 1) // 2 + 1
        return f


def sinusoid_positions(length: int, channels: int) -> np.ndarray:
    log_inc = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2, dtype=np.float32))
    t = np.arange(length, dtype=np.float32)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1)


def init_params(cfg: AudioEncoderConfig, key: jax.Array) -> dict:
    dt = jnp.dtype(cfg.dtype)
    d, ff, dh = cfg.d_model, cfg.encoder_ffn_dim, cfg.downsample_hidden_size
    nl = cfg.encoder_layers
    ks = iter(jax.random.split(key, 24))

    def w(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    conv_in = dh * cfg.freq_after_conv
    p = {
        "conv1_w": w(next(ks), (dh, 1, 3, 3)),
        "conv1_b": jnp.zeros((dh,), dt),
        "conv2_w": w(next(ks), (dh, dh, 3, 3)),
        "conv2_b": jnp.zeros((dh,), dt),
        "conv3_w": w(next(ks), (dh, dh, 3, 3)),
        "conv3_b": jnp.zeros((dh,), dt),
        "conv_out": w(next(ks), (conv_in, d)),
        "ln1": jnp.ones((nl, d), dt),
        "ln1_b": jnp.zeros((nl, d), dt),
        "wq": w(next(ks), (nl, d, d)),
        "bq": jnp.zeros((nl, d), dt),
        "wk": w(next(ks), (nl, d, d)),
        "bk": jnp.zeros((nl, d), dt),
        "wv": w(next(ks), (nl, d, d)),
        "bv": jnp.zeros((nl, d), dt),
        "wo": w(next(ks), (nl, d, d)),
        "bo": jnp.zeros((nl, d), dt),
        "ln2": jnp.ones((nl, d), dt),
        "ln2_b": jnp.zeros((nl, d), dt),
        "fc1": w(next(ks), (nl, d, ff)),
        "fc1_b": jnp.zeros((nl, ff), dt),
        "fc2": w(next(ks), (nl, ff, d)),
        "fc2_b": jnp.zeros((nl, d), dt),
        "ln_post": jnp.ones((d,), dt),
        "ln_post_b": jnp.zeros((d,), dt),
        "proj1": w(next(ks), (d, d)),
        "proj1_b": jnp.zeros((d,), dt),
        "proj2": w(next(ks), (d, cfg.output_dim)),
        "proj2_b": jnp.zeros((cfg.output_dim,), dt),
        "pos": jnp.asarray(
            sinusoid_positions(cfg.max_source_positions, d), dt
        ),
    }
    return p


def load_hf_state(cfg: AudioEncoderConfig, state: dict) -> dict:
    """Map a transformers Qwen3OmniMoeAudioEncoder state_dict to params."""
    dt = jnp.dtype(cfg.dtype)

    def g(name):
        return jnp.asarray(np.asarray(state[name].float()), dt)

    def stack(fmt, transpose=False):
        arrs = []
        for i in range(cfg.encoder_layers):
            a = np.asarray(state[fmt.format(i)].float())
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs), dt)

    p = {
        "conv1_w": g("conv2d1.weight"), "conv1_b": g("conv2d1.bias"),
        "conv2_w": g("conv2d2.weight"), "conv2_b": g("conv2d2.bias"),
        "conv3_w": g("conv2d3.weight"), "conv3_b": g("conv2d3.bias"),
        "conv_out": g("conv_out.weight").T,
        "ln1": stack("layers.{}.self_attn_layer_norm.weight"),
        "ln1_b": stack("layers.{}.self_attn_layer_norm.bias"),
        "wq": stack("layers.{}.self_attn.q_proj.weight", transpose=True),
        "bq": stack("layers.{}.self_attn.q_proj.bias"),
        "wk": stack("layers.{}.self_attn.k_proj.weight", transpose=True),
        "bk": stack("layers.{}.self_attn.k_proj.bias"),
        "wv": stack("layers.{}.self_attn.v_proj.weight", transpose=True),
        "bv": stack("layers.{}.self_attn.v_proj.bias"),
        "wo": stack("layers.{}.self_attn.out_proj.weight", transpose=True),
        "bo": stack("layers.{}.self_attn.out_proj.bias"),
        "ln2": stack("layers.{}.final_layer_norm.weight"),
        "ln2_b": stack("layers.{}.final_layer_norm.bias"),
        "fc1": stack("layers.{}.fc1.weight", transpose=True),
        "fc1_b": stack("layers.{}.fc1.bias"),
        "fc2": stack("layers.{}.fc2.weight", transpose=True),
        "fc2_b": stack("layers.{}.fc2.bias"),
        "ln_post": g("ln_post.weight"), "ln_post_b": g("ln_post.bias"),
        "proj1": g("proj1.weight").T, "proj1_b": g("proj1.bias"),
        "proj2": g("proj2.weight").T, "proj2_b": g("proj2.bias"),
        "pos": jnp.asarray(
            sinusoid_positions(cfg.max_source_positions, cfg.d_model), dt
        ),
    }
    return p


def _gelu(x):
    # torch F.gelu default = exact erf formulation (jax defaults to tanh)
    return jax.nn.gelu(x, approximate=False)


def _layer_norm(x, w, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def _conv2d(x, w, b, stride=2):
    # x [N, C, H, W], w [O, C, 3, 3], padding 1
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(stride, stride), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b.astype(jnp.float32)[None, :, None, None]


def forward(
    cfg: AudioEncoderConfig,
    params: dict,
    mel: jax.Array,  # [M, T_pad] — host ZERO-pads T to a chunk multiple
    mel_len: jax.Array,  # scalar int32: real frames (<= T_pad)
) -> tuple[jax.Array, jax.Array]:
    """Encode one utterance.  Returns (embeddings [T_out_pad, output_dim],
    out_len scalar) — rows past out_len are padding garbage.  The pad
    region of ``mel`` must be zeros (the torch code pads chunks with
    zeros before the convs; matching bytes requires matching padding)."""
    m, t_pad = mel.shape
    chunk = cfg.chunk_frames
    assert t_pad % chunk == 0, (t_pad, chunk)
    nc = t_pad // chunk
    t_conv = cfg.conv_out_len(chunk)

    # [nc, 1, M, chunk] -> convs over (freq, time)
    x = mel.reshape(m, nc, chunk).transpose(1, 0, 2)[:, None]
    x = _gelu(_conv2d(x, params["conv1_w"], params["conv1_b"]))
    x = _gelu(_conv2d(x, params["conv2_w"], params["conv2_b"]))
    x = _gelu(_conv2d(x, params["conv3_w"], params["conv3_b"]))
    # [nc, C, F, t_conv] -> [nc, t_conv, C*F]
    nc_, c, f, tt = x.shape
    x = x.transpose(0, 3, 1, 2).reshape(nc, tt, c * f)
    x = jnp.dot(x, params["conv_out"].astype(jnp.float32))
    x = x + params["pos"][:tt].astype(jnp.float32)[None]
    h = x.reshape(nc * tt, -1).astype(params["ln_post"].dtype)

    # token (c, t) has flat/valid index c*t_conv + t: only the final
    # chunk is partial, so the padded layout IS the compacted one up to
    # the total valid length (full chunks contribute t_conv each, the
    # tail contributes conv_out_len(tail))
    full_chunks = mel_len // chunk
    tail = mel_len % chunk
    tail_l = tail
    for _ in range(3):
        tail_l = (tail_l - 1) // 2 + 1
    total = full_chunks * t_conv + jnp.where(tail > 0, tail_l, 0)

    seq = jnp.arange(nc * tt)
    valid = seq < total
    win = t_conv * (cfg.n_window_infer // chunk)
    seg = seq // win
    mask = (
        valid[None, :]
        & valid[:, None]
        & (seg[None, :] == seg[:, None])
    )

    nh = cfg.encoder_attention_heads
    hd = cfg.d_model // nh
    scale = hd**-0.5

    def layer(h, lp):
        x = _layer_norm(h, lp["ln1"], lp["ln1_b"])
        q = (jnp.dot(x, lp["wq"]) + lp["bq"]).reshape(-1, nh, hd)
        k = (jnp.dot(x, lp["wk"]) + lp["bk"]).reshape(-1, nh, hd)
        v = (jnp.dot(x, lp["wv"]) + lp["bv"]).reshape(-1, nh, hd)
        s = jnp.einsum(
            "qhd,khd->hqk", q.astype(jnp.float32), k.astype(jnp.float32)
        ) * scale
        # finite mask value: fully-masked (padding) rows softmax to
        # uniform then zero out, instead of NaN-ing
        s = jnp.where(mask[None], s, -1e30)
        p_attn = jax.nn.softmax(s, axis=-1)
        p_attn = jnp.where(mask[None], p_attn, 0.0)
        o = jnp.einsum(
            "hqk,khd->qhd", p_attn, v.astype(jnp.float32)
        ).reshape(-1, cfg.d_model).astype(h.dtype)
        o = jnp.dot(o, lp["wo"]) + lp["bo"]
        h = h + o
        x = _layer_norm(h, lp["ln2"], lp["ln2_b"])
        x = _gelu(jnp.dot(x, lp["fc1"]) + lp["fc1_b"])
        x = jnp.dot(x, lp["fc2"]) + lp["fc2_b"]
        return h + x, None

    layer_keys = (
        "ln1", "ln1_b", "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
        "ln2", "ln2_b", "fc1", "fc1_b", "fc2", "fc2_b",
    )
    lp = {k: params[k] for k in layer_keys}
    h, _ = jax.lax.scan(layer, h, lp)

    h = _layer_norm(h, params["ln_post"], params["ln_post_b"])
    h = _gelu(jnp.dot(h, params["proj1"]) + params["proj1_b"])
    h = jnp.dot(h, params["proj2"]) + params["proj2_b"]
    return h, total
