"""Oobleck VAE decoder (jax): audio latents -> waveform.

Compact port of diffusers' AutoencoderOobleck decoder (consumed by the
reference pipeline, pipeline_stable_audio.py:117): snake-gated residual
units (dilations 1/3/9) around strided transposed convs, snake1d
activation x + (1/a) sin^2(a x) with per-channel log-alpha/beta."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.models.stable_audio.config import (
    OobleckConfig,
)


def _snake(x, alpha, beta):
    a = jnp.exp(alpha)[None, None, :]
    b = jnp.exp(beta)[None, None, :]
    return x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(x * a))


def _conv(x, w, dilation=1, stride=1):
    k = w.shape[0]
    pad = ((k - 1) * dilation) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


def _conv_t(x, w, stride):
    k = w.shape[0]
    pad = (k - stride) // 2
    y = jax.lax.conv_general_dilated(
        x, jnp.flip(w, 0), (1,), [(k - 1, k - 1)], lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y[:, pad: y.shape[1] - pad]


def init_params(cfg: OobleckConfig, key: jax.Array) -> dict:
    ratios = cfg.upsampling_ratios
    c0 = cfg.decoder_channels * (2 ** len(ratios))
    ks = iter(jax.random.split(key, 8 + 16 * len(ratios)))

    def w(shape, scale=0.05):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    blocks = []
    cin = c0
    for r in ratios:
        cout = cin // 2
        units = []
        for _dil in (1, 3, 9):
            units.append({
                "a1": jnp.zeros((cout,)), "b1": jnp.zeros((cout,)),
                "w1": w((7, cout, cout)),
                "a2": jnp.zeros((cout,)), "b2": jnp.zeros((cout,)),
                "w2": w((1, cout, cout)),
            })
        blocks.append({
            "a_up": jnp.zeros((cin,)), "b_up": jnp.zeros((cin,)),
            "w_up": w((2 * r, cin, cout)),
            "units": units,
        })
        cin = cout
    return {
        "conv_in": w((7, cfg.latent_dim, c0)),
        "blocks": blocks,
        "a_out": jnp.zeros((cin,)), "b_out": jnp.zeros((cin,)),
        "conv_out": w((7, cin, cfg.audio_channels)),
    }


def decode(cfg: OobleckConfig, p: dict, z: jax.Array) -> jax.Array:
    """z [B, L_lat, latent_dim] -> waveform [B, L_lat * hop, channels]."""
    x = _conv(z, p["conv_in"])
    for blk, r in zip(p["blocks"], cfg.upsampling_ratios):
        x = _snake(x, blk["a_up"], blk["b_up"])
        x = _conv_t(x, blk["w_up"], r)
        for u, dil in zip(blk["units"], (1, 3, 9)):
            res = x
            h = _snake(x, u["a1"], u["b1"])
            h = _conv(h, u["w1"], dilation=dil)
            h = _snake(h, u["a2"], u["b2"])
            x = res + _conv(h, u["w2"])
    x = _snake(x, p["a_out"], p["b_out"])
    x = _conv(x, p["conv_out"])
    return jnp.tanh(x)
