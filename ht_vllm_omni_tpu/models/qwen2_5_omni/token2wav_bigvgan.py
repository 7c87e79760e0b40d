"""Qwen2.5-Omni BigVGAN vocoder (jax): mel -> waveform.

Anti-aliased BigVGAN following the reference
Qwen2_5OmniToken2WavBigVGANModel (reference vllm_omni/model_executor/
models/qwen2_5_omni/qwen2_5_omni_token2wav.py:666-1085):

- mel pre-processing: exp -> amplitude_to_db(min -115 dB) - 20 ->
  clamp-normalize to [-1, 1];
- conv_pre (k=7) -> per upsample layer: ConvTranspose1d + mean of 3 AMP
  (multi-receptive-field) residual blocks -> filtered SnakeBeta
  activation -> conv_post (k=7, no bias) -> clamp;
- every SnakeBeta runs between a 2x kaiser-sinc upsample and a 2x
  kaiser-sinc downsample (alias-free activation, :709-898); the filters
  are fixed buffers computed at init.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.models.qwen2_5_omni.config import BigVGANConfig


# ------------------------------------------------------------- filters
def kaiser_sinc_filter1d(
    cutoff: float, half_width: float, kernel_size: int
) -> np.ndarray:
    """[kernel_size] kaiser-windowed sinc low-pass (token2wav.py:709)."""
    is_even = kernel_size % 2 == 0
    half_size = kernel_size // 2

    delta_f = 4 * half_width
    attenuation = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if attenuation > 50.0:
        beta = 0.1102 * (attenuation - 8.7)
    elif attenuation >= 21.0:
        beta = 0.5842 * (attenuation - 21) ** 0.4 + 0.07886 * (
            attenuation - 21.0
        )
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if is_even:
        time_idx = np.arange(-half_size, half_size) + 0.5
    else:
        time_idx = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time_idx)
    return (filt / filt.sum()).astype(np.float32)


def _grouped_conv(x, filt, stride):
    """Depthwise conv; x [B, T, C], filt [k]."""
    c = x.shape[-1]
    w = jnp.broadcast_to(filt[:, None, None], (filt.shape[0], 1, c))
    return jax.lax.conv_general_dilated(
        x, w, (stride,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c,
    )


def _upsample2(x, filt, ratio):
    """UpSample1d (token2wav.py:788): replicate pad, grouped
    conv-transpose by the sinc filter, trim, scale by ratio."""
    k = filt.shape[0]
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    c = x.shape[-1]
    w = jnp.broadcast_to(
        jnp.flip(filt)[:, None, None], (k, 1, c)
    )
    y = jax.lax.conv_general_dilated(
        x, w, (1,), [(k - 1, k - 1)], lhs_dilation=(ratio,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c,
    )
    y = ratio * y
    return y[:, pad_left: y.shape[1] - pad_right]


def _downsample2(x, filt, ratio):
    """DownSample1d (token2wav.py:830): replicate pad, grouped strided
    conv by the sinc filter."""
    k = filt.shape[0]
    even = k % 2 == 0
    pad_left = k // 2 - int(even)
    pad_right = k // 2
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return _grouped_conv(x, filt, ratio)


_UP_FILTER = jnp.asarray(kaiser_sinc_filter1d(0.5 / 2, 0.6 / 2, 12))
_DOWN_FILTER = jnp.asarray(kaiser_sinc_filter1d(0.5 / 2, 0.6 / 2, 12))


def _snake_filtered(x, alpha, beta):
    """2x upsample -> SnakeBeta -> 2x downsample (TorchActivation1d)."""
    x = _upsample2(x, _UP_FILTER, 2)
    a = jnp.exp(alpha)[None, None, :]
    b = jnp.exp(beta)[None, None, :]
    x = x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(x * a))
    return _downsample2(x, _DOWN_FILTER, 2)


# --------------------------------------------------------------- params
def init_params(cfg: BigVGANConfig, key: jax.Array) -> dict:
    n_up = len(cfg.upsample_rates)
    n_res = len(cfg.resblock_kernel_sizes)
    total = 4 + n_up * (1 + n_res * 16)
    ks = iter(jax.random.split(key, total + 8))

    def w(shape, scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    c0 = cfg.upsample_initial_channel
    p = {
        "conv_pre_w": w((7, cfg.mel_dim, c0)),
        "conv_pre_b": jnp.zeros((c0,)),
        "ups": [],
        "resblocks": [],
        "post_alpha": jnp.zeros((c0 // (2 ** n_up),)),
        "post_beta": jnp.zeros((c0 // (2 ** n_up),)),
        "conv_post_w": w((7, c0 // (2 ** n_up), 1)),
    }
    for li, (rate, ksz) in enumerate(
        zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
    ):
        cin = c0 // (2 ** li)
        cout = c0 // (2 ** (li + 1))
        p["ups"].append({
            "w": w((ksz, cin, cout)),
            "b": jnp.zeros((cout,)),
        })
        for rk, dil in zip(
            cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes
        ):
            blk = {"c1": [], "c2": [], "a": [], "b_": []}
            for d in dil:
                blk["c1"].append({
                    "w": w((rk, cout, cout)), "b": jnp.zeros((cout,)),
                })
                blk["c2"].append({
                    "w": w((rk, cout, cout)), "b": jnp.zeros((cout,)),
                })
                blk["a"].extend(
                    [jnp.zeros((cout,)), jnp.zeros((cout,))]
                )
            # alpha/beta per activation (2 per dilation step)
            blk["alpha"] = [jnp.zeros((cout,)) for _ in range(2 * len(dil))]
            blk["beta"] = [jnp.zeros((cout,)) for _ in range(2 * len(dil))]
            del blk["a"], blk["b_"]
            p["resblocks"].append(blk)
    return p


def load_hf_state(cfg: BigVGANConfig, state: dict) -> dict:
    def g(name):
        return jnp.asarray(np.asarray(state[name], np.float32))

    def conv(prefix, bias=True):
        out = {"w": g(f"{prefix}.weight").transpose(2, 1, 0)}
        if bias:
            out["b"] = g(f"{prefix}.bias")
        return out

    n_up = len(cfg.upsample_rates)
    n_res = len(cfg.resblock_kernel_sizes)
    p = {
        "conv_pre_w": g("conv_pre.weight").transpose(2, 1, 0),
        "conv_pre_b": g("conv_pre.bias"),
        "ups": [],
        "resblocks": [],
        "post_alpha": g("activation_post.act.alpha"),
        "post_beta": g("activation_post.act.beta"),
        "conv_post_w": g("conv_post.weight").transpose(2, 1, 0),
    }
    for li in range(n_up):
        # torch ConvTranspose1d weight [in, out, k] -> [k, in, out]
        p["ups"].append({
            "w": g(f"ups.{li}.0.weight").transpose(2, 0, 1),
            "b": g(f"ups.{li}.0.bias"),
        })
        for ri in range(n_res):
            base = f"resblocks.{li * n_res + ri}"
            dil = cfg.resblock_dilation_sizes[ri]
            blk = {
                "c1": [conv(f"{base}.convs1.{j}") for j in range(len(dil))],
                "c2": [conv(f"{base}.convs2.{j}") for j in range(len(dil))],
                "alpha": [
                    g(f"{base}.activations.{j}.act.alpha")
                    for j in range(2 * len(dil))
                ],
                "beta": [
                    g(f"{base}.activations.{j}.act.beta")
                    for j in range(2 * len(dil))
                ],
            }
            p["resblocks"].append(blk)
    return p


# -------------------------------------------------------------- forward
def _conv_same(x, w, b=None, dilation=1):
    """torch Conv1d with padding=(k*d - d)//2 (zero padding)."""
    k = w.shape[0]
    pad = (k * dilation - dilation) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y if b is None else y + b


def _conv_transpose(x, w, b, stride, kernel):
    """torch ConvTranspose1d with padding=(k - s)//2; w [k, in, out]."""
    pad = (kernel - stride) // 2
    y = jax.lax.conv_general_dilated(
        x, jnp.flip(w, 0), (1,), [(kernel - 1, kernel - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    # torch output_padding=0: out = (T-1)*s + k - 2*pad
    y = y[:, pad: y.shape[1] - pad]
    return y + b


def _amp_block(cfg, blk, dil, x):
    for j, d in enumerate(dil):
        residual = x
        x = _snake_filtered(x, blk["alpha"][2 * j], blk["beta"][2 * j])
        x = _conv_same(x, blk["c1"][j]["w"], blk["c1"][j]["b"], d)
        x = _snake_filtered(
            x, blk["alpha"][2 * j + 1], blk["beta"][2 * j + 1]
        )
        x = _conv_same(x, blk["c2"][j]["w"], blk["c2"][j]["b"], 1)
        x = residual + x
    return x


def mel_to_wav(cfg: BigVGANConfig, p: dict, mel: jax.Array) -> jax.Array:
    """mel [B, T, mel_dim] (log-amplitude) -> waveform [B, T * hop]."""
    # process_mel_spectrogram (token2wav.py:1046-1066)
    amp = jnp.exp(mel)
    min_level = math.exp(-115 / 20.0 * math.log(10))
    db = 20.0 * jnp.log10(jnp.clip(amp, min_level)) - 20.0
    x = jnp.clip(2.0 * ((db + 115.0) / 115.0) - 1.0, -1.0, 1.0)

    x = _conv_same(x, p["conv_pre_w"], p["conv_pre_b"])
    n_res = len(cfg.resblock_kernel_sizes)
    for li, (rate, ksz) in enumerate(
        zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
    ):
        x = _conv_transpose(
            x, p["ups"][li]["w"], p["ups"][li]["b"], rate, ksz
        )
        acc = None
        for ri in range(n_res):
            blk = p["resblocks"][li * n_res + ri]
            y = _amp_block(
                cfg, blk, cfg.resblock_dilation_sizes[ri], x
            )
            acc = y if acc is None else acc + y
        x = acc / n_res
    x = _snake_filtered(x, p["post_alpha"], p["post_beta"])
    x = _conv_same(x, p["conv_post_w"])
    return jnp.clip(x[..., 0], -1.0, 1.0)
