"""MiMo-Audio code2wav: RVQ codes -> waveform (jax).

Follows the reference MiMoAudioTokenizer decode path (reference
vllm_omni/model_executor/models/mimo_audio/modeling_audio_tokenizer.py):

- ``decode_vq`` (:685): sum of per-quantizer codebook embeddings;
- CausalConvTranspose1d upsample by ``avg_pooler`` + GroupNorm(1)
  (:692-729);
- AudioDecoder transformer (:731-815): pre-LN layers, rope, GELU FFN;
- second causal conv-transpose to coarse mel (kernel/stride trim);
- TransformerVocos (:458-511): linear mel embed, transformer, and an
  ISTFT head (:247-293) predicting log-magnitude + phase, synthesised
  with "same"-padded overlap-add (:163-245).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.models.mimo_audio.config import MiMoCode2WavConfig


# ------------------------------------------------------------------ init
def _layer_params(d, ffn, key):
    ks = iter(jax.random.split(key, 10))

    def w(shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * 0.02

    return {
        "ln1_g": jnp.ones((d,)), "ln1_b": jnp.zeros((d,)),
        "wq": w((d, d)), "bq": jnp.zeros((d,)),
        "wk": w((d, d)),                      # k_proj has no bias
        "wv": w((d, d)), "bv": jnp.zeros((d,)),
        "wo": w((d, d)), "bo": jnp.zeros((d,)),
        "ln2_g": jnp.ones((d,)), "ln2_b": jnp.zeros((d,)),
        "fc1": w((d, ffn)), "fc1_b": jnp.zeros((ffn,)),
        "fc2": w((ffn, d)), "fc2_b": jnp.zeros((d,)),
    }


def init_params(cfg: MiMoCode2WavConfig, key: jax.Array) -> dict:
    ks = iter(jax.random.split(key, 24))

    def w(shape):
        return jax.random.normal(next(ks), shape, jnp.float32) * 0.02

    d = cfg.d_model
    return {
        "codebooks": w((cfg.num_quantizers, cfg.codebook_size, d)),
        "up1_w": w((cfg.avg_pooler, d, d)), "up1_b": jnp.zeros((d,)),
        "up1_g": jnp.ones((d,)), "up1_gb": jnp.zeros((d,)),
        "dec": [
            _layer_params(d, cfg.decoder_ffn, next(ks))
            for _ in range(cfg.decoder_layers)
        ],
        "dec_ln_g": jnp.ones((d,)), "dec_ln_b": jnp.zeros((d,)),
        "up2_w": w((cfg.decoder_kernel_size, d, cfg.n_mels)),
        "up2_b": jnp.zeros((cfg.n_mels,)),
        "up2_g": jnp.ones((cfg.n_mels,)), "up2_gb": jnp.zeros(
            (cfg.n_mels,)
        ),
        "voc_embed": w((cfg.n_mels, d)),
        "voc": [
            _layer_params(d, cfg.vocos_ffn, next(ks))
            for _ in range(cfg.vocos_layers)
        ],
        "voc_ln_g": jnp.ones((d,)), "voc_ln_b": jnp.zeros((d,)),
        "head_w": w((d, cfg.n_fft + 2)),
        "head_b": jnp.zeros((cfg.n_fft + 2,)),
    }


# ------------------------------------------------------------ primitives
def _ln(x, g, b):
    m = x.mean(-1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-5) * g + b


def _gn1(x, g, b):
    """GroupNorm(1, C) on [T, C]: stats over T and C."""
    m = x.mean()
    v = jnp.var(x)
    return (x - m) * jax.lax.rsqrt(v + 1e-5) * g + b


def _rope(dim, t, theta):
    half = dim // 2
    inv = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    f = jnp.arange(t, dtype=jnp.float32)[:, None] * inv
    emb = jnp.concatenate([f, f], -1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(x, cos, sin):
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], -1)
    return x * cos[:, None] + rot * sin[:, None]


def _layer(p, x, heads, cos, sin):
    """Pre-LN transformer layer on [T, D] (reference TransformerLayer
    :411-457)."""
    t, d = x.shape
    hd = d // heads
    n = _ln(x, p["ln1_g"], p["ln1_b"])
    q = _apply_rope((n @ p["wq"] + p["bq"]).reshape(t, heads, hd),
                    cos, sin)
    k = _apply_rope((n @ p["wk"]).reshape(t, heads, hd), cos, sin)
    v = (n @ p["wv"] + p["bv"]).reshape(t, heads, hd)
    s = jnp.einsum("thd,shd->hts", q, k) / math.sqrt(hd)
    o = jnp.einsum("hts,shd->thd", jax.nn.softmax(s, -1), v)
    x = x + (o.reshape(t, d) @ p["wo"] + p["bo"])
    n = _ln(x, p["ln2_g"], p["ln2_b"])
    return x + jax.nn.gelu(n @ p["fc1"] + p["fc1_b"]) @ p["fc2"] + (
        p["fc2_b"]
    )


def _conv_transpose(x, w, b, stride):
    """Causal ConvTranspose1d on [T, Cin] -> [T', Cout] with the
    reference's right-trim (:700-729)."""
    y = jax.lax.conv_transpose(
        x[None], w, (stride,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )[0] + b
    k = w.shape[0]
    trim = max(0, k - stride)
    return y[: y.shape[0] - trim if trim else y.shape[0]]


def _istft(spec_re, spec_im, n_fft, hop):
    """"same"-padded ISTFT via overlap-add (reference ISTFT :163-245).
    spec [F, T] -> wav [T*hop]."""
    win = 0.5 - 0.5 * jnp.cos(
        2 * jnp.pi * jnp.arange(n_fft) / n_fft
    )  # periodic hann
    spec = spec_re + 1j * spec_im  # [F, T]
    frames = jnp.fft.irfft(spec, n_fft, axis=0).T  # [T, n_fft]
    frames = frames * win[None]
    t = frames.shape[0]
    out_size = (t - 1) * hop + n_fft
    idx = (jnp.arange(t) * hop)[:, None] + jnp.arange(n_fft)[None]
    y = jnp.zeros((out_size,)).at[idx.reshape(-1)].add(
        frames.reshape(-1)
    )
    env = jnp.zeros((out_size,)).at[idx.reshape(-1)].add(
        jnp.broadcast_to(win[None] ** 2, (t, n_fft)).reshape(-1)
    )
    pad = (n_fft - hop) // 2
    y = y[pad:out_size - pad]
    env = env[pad:out_size - pad]
    return y / jnp.maximum(env, 1e-11)


# ---------------------------------------------------------------- decode
def vq_decode(cfg: MiMoCode2WavConfig, p, codes):
    """codes [T, nq] -> embeddings [T, D] (sum over quantizers)."""
    out = 0.0
    for qi in range(cfg.num_quantizers):
        out = out + p["codebooks"][qi][codes[:, qi]]
    return out


def decode(cfg: MiMoCode2WavConfig, p, codes):
    """codes [T, nq] int32 -> waveform [samples] f32."""
    h = vq_decode(cfg, p, codes)
    h = _conv_transpose(h, p["up1_w"], p["up1_b"], cfg.avg_pooler)
    h = _gn1(h, p["up1_g"], p["up1_gb"])
    cos, sin = _rope(
        cfg.d_model // cfg.decoder_heads, h.shape[0], cfg.rope_theta
    )
    for lp in p["dec"]:
        h = _layer(lp, h, cfg.decoder_heads, cos, sin)
    h = _ln(h, p["dec_ln_g"], p["dec_ln_b"])
    mel = _conv_transpose(h, p["up2_w"], p["up2_b"],
                          cfg.decoder_stride_size)
    mel = _gn1(mel, p["up2_g"], p["up2_gb"])
    x = mel @ p["voc_embed"]
    cos, sin = _rope(
        cfg.d_model // cfg.vocos_heads, x.shape[0], cfg.rope_theta
    )
    for lp in p["voc"]:
        x = _layer(lp, x, cfg.vocos_heads, cos, sin)
    x = _ln(x, p["voc_ln_g"], p["voc_ln_b"])
    out = x @ p["head_w"] + p["head_b"]  # [T, n_fft + 2]
    mag, phase = jnp.split(out, 2, -1)
    mag = jnp.exp(jnp.clip(mag, max=math.log(1e2)))
    re = (mag * jnp.cos(phase)).T  # [F, T]
    im = (mag * jnp.sin(phase)).T
    return _istft(re, im, cfg.n_fft, cfg.hop_length)
