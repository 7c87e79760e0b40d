"""HiFT (NSF + ISTFT-Net) vocoder in jax: mel -> waveform.

Counterpart of the reference CausalHiFTGenerator (reference
vllm_omni/model_executor/models/cosyvoice3/code2wav_core/hifigan.py:429):

- an F0 predictor (causal conv stack) maps mel -> per-frame f0;
- a harmonic NSF source: f0 upsampled to sample rate, per-harmonic
  sines summed through a tanh merge (SourceModuleHnNSF);
- the source's STFT (n_fft 16, hop 4) fuses into the mel upsampling
  stack at each scale (source_downs + source_resblocks);
- HiFiGAN-style upsample stack (ConvTranspose + snake ResBlocks), then
  conv_post emits n_fft+2 channels -> magnitude=exp(.), phase=sin(.)
  -> inverse STFT -> clamp to audio_limit (hifigan.py:decode:564-596).

STFT/ISTFT are implemented with explicit framing + rfft/irfft +
overlap-add, matching torch.stft/istft center=True semantics
(parity-tested in tests/models/test_cosyvoice3.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.models.cosyvoice3.config import HiftConfig


# ------------------------------------------------------------- stft/istft
def hann_window(n: int) -> jnp.ndarray:
    i = jnp.arange(n, dtype=jnp.float32)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * i / n)


def stft(x: jax.Array, n_fft: int, hop: int):
    """x [B, T] -> (real, imag) [B, n_fft//2+1, frames]; center=True,
    reflect padding, periodic hann — torch.stft semantics."""
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    t = xp.shape[1]
    nframes = (t - n_fft) // hop + 1
    idx = jnp.arange(nframes)[:, None] * hop + jnp.arange(n_fft)[None]
    frames = xp[:, idx] * hann_window(n_fft)[None, None]
    spec = jnp.fft.rfft(frames, axis=-1)  # [B, frames, F]
    return (
        jnp.real(spec).transpose(0, 2, 1),
        jnp.imag(spec).transpose(0, 2, 1),
    )


def istft(real: jax.Array, imag: jax.Array, n_fft: int, hop: int):
    """(real, imag) [B, F, frames] -> x [B, (frames-1)*hop]; inverse of
    stft above incl. the window-envelope normalization torch.istft
    applies."""
    spec = (real + 1j * imag).transpose(0, 2, 1)  # [B, frames, F]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)
    win = hann_window(n_fft)
    frames = frames * win[None, None]
    b, nframes, _ = frames.shape
    t_pad = (nframes - 1) * hop + n_fft
    idx = jnp.arange(nframes)[:, None] * hop + jnp.arange(n_fft)[None]
    y = jnp.zeros((b, t_pad), jnp.float32)
    y = y.at[:, idx.reshape(-1)].add(
        frames.reshape(b, -1).astype(jnp.float32)
    )
    norm = jnp.zeros((t_pad,), jnp.float32)
    norm = norm.at[idx.reshape(-1)].add(
        jnp.tile((win * win)[None], (nframes, 1)).reshape(-1)
    )
    y = y / jnp.maximum(norm, 1e-11)
    pad = n_fft // 2
    return y[:, pad : t_pad - pad]


# ------------------------------------------------------------------ params
def init_params(cfg: HiftConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 128))

    def w(shape, scale=None):
        scale = scale or 1.0 / math.sqrt(
            max(int(np.prod(shape[:-1])), 1)
        )
        return jax.random.normal(next(keys), shape, jnp.float32) * scale

    mel = cfg.in_channels
    bc = cfg.base_channels
    nfft2 = cfg.istft_n_fft + 2
    p: dict = {
        # f0 predictor: 3 causal convs + head (compact stand-in for the
        # reference's CausalConvRNNF0Predictor)
        "f0_w1": w((5, mel, 64)), "f0_b1": jnp.zeros((64,)),
        "f0_w2": w((5, 64, 64)), "f0_b2": jnp.zeros((64,)),
        "f0_w3": w((5, 64, 64)), "f0_b3": jnp.zeros((64,)),
        "f0_head_w": w((64, 1)), "f0_head_b": jnp.zeros((1,)),
        # NSF source merge
        "src_w": w((cfg.nb_harmonics + 1, 1)),
        "src_b": jnp.zeros((1,)),
        "conv_pre_w": w((7, mel, bc)), "conv_pre_b": jnp.zeros((bc,)),
        "conv_post_w": w((7, bc // (2 ** len(cfg.upsample_rates)), nfft2)),
        "conv_post_b": jnp.zeros((nfft2,)),
    }
    # upsample convs + source-down convs (kernel sizes follow the
    # cumulated downsample rates, hifigan.py:497-513)
    downsample_rates = [1] + list(cfg.upsample_rates[::-1][:-1])
    cum = np.cumprod(downsample_rates)[::-1]
    ch = bc
    for i, (u, k) in enumerate(
        zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
    ):
        out = ch // 2
        p[f"up{i}_w"] = w((k, out, ch))  # [k, out, in] transposed layout
        p[f"up{i}_b"] = jnp.zeros((out,))
        uu = int(cum[i])
        p[f"srcdown{i}_w"] = w(
            (1 if uu == 1 else uu * 2, nfft2, out)
        )
        p[f"srcdown{i}_b"] = jnp.zeros((out,))
        ch = out
    # resblocks: per upsample stage x per kernel size
    ch = bc
    for i in range(len(cfg.upsample_rates)):
        ch //= 2
        for j, (k, dils) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            for di, _d in enumerate(dils):
                p[f"rb{i}_{j}_{di}_a1"] = jnp.ones((ch,))
                p[f"rb{i}_{j}_{di}_w1"] = w((k, ch, ch))
                p[f"rb{i}_{j}_{di}_b1"] = jnp.zeros((ch,))
                p[f"rb{i}_{j}_{di}_a2"] = jnp.ones((ch,))
                p[f"rb{i}_{j}_{di}_w2"] = w((k, ch, ch))
                p[f"rb{i}_{j}_{di}_b2"] = jnp.zeros((ch,))
        # source resblock at this scale
        k = cfg.source_resblock_kernel_sizes[i]
        for di, _d in enumerate(cfg.source_resblock_dilation_sizes[i]):
            p[f"srb{i}_{di}_a1"] = jnp.ones((ch,))
            p[f"srb{i}_{di}_w1"] = w((k, ch, ch))
            p[f"srb{i}_{di}_b1"] = jnp.zeros((ch,))
            p[f"srb{i}_{di}_a2"] = jnp.ones((ch,))
            p[f"srb{i}_{di}_w2"] = w((k, ch, ch))
            p[f"srb{i}_{di}_b2"] = jnp.zeros((ch,))
    return p


def _conv1d(x, w, b, *, dilation=1, padding=None, stride=1):
    k = w.shape[0]
    if padding is None:
        padding = dilation * (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride,), [(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + b


def _conv_transpose1d(x, w, b, *, stride, padding):
    k = w.shape[0]
    lo = k - 1 - padding
    return jax.lax.conv_general_dilated(
        x, jnp.flip(w, 0), (1,),
        [(lo, lo + (stride - 1))],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HOI", "NHC"),
    ) + b


def _snake(x, alpha):
    xf = x.astype(jnp.float32)
    return xf + jnp.sin(alpha * xf) ** 2 / (alpha + 1e-9)


def _resblock(p, pre, x, kernels_dilations):
    for di, d in enumerate(kernels_dilations):
        h = _snake(x, p[f"{pre}_{di}_a1"])
        h = _conv1d(h, p[f"{pre}_{di}_w1"], p[f"{pre}_{di}_b1"],
                    dilation=d)
        h = _snake(h, p[f"{pre}_{di}_a2"])
        h = _conv1d(h, p[f"{pre}_{di}_w2"], p[f"{pre}_{di}_b2"])
        x = x + h
    return x


def predict_f0(cfg: HiftConfig, params: dict, mel: jax.Array) -> jax.Array:
    """mel [B, T, mel] -> f0 [B, T] (Hz, >= 0)."""
    pad = 4  # causal: left-pad k-1

    def causal(x, w, b):
        xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        return jax.lax.conv_general_dilated(
            xp, w, (1,), [(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + b

    h = jax.nn.elu(causal(mel, params["f0_w1"], params["f0_b1"]))
    h = jax.nn.elu(causal(h, params["f0_w2"], params["f0_b2"]))
    h = jax.nn.elu(causal(h, params["f0_w3"], params["f0_b3"]))
    f0 = jnp.dot(h, params["f0_head_w"]) + params["f0_head_b"]
    return jax.nn.relu(f0[..., 0])


def harmonic_source(
    cfg: HiftConfig, params: dict, f0: jax.Array, key: jax.Array
) -> jax.Array:
    """f0 [B, T] -> NSF source [B, T * total_upsample] (SineGen type 1 +
    SourceModuleHnNSF merge, hifigan.py:158-427)."""
    up = cfg.total_upsample
    f0_up = jnp.repeat(f0, up, axis=1)  # nearest upsample
    b, t = f0_up.shape
    harmonics = (
        jnp.arange(1, cfg.nb_harmonics + 2, dtype=jnp.float32)[None, None]
    )
    rad = jnp.cumsum(
        f0_up[..., None] * harmonics / cfg.sampling_rate, axis=1
    )
    k1, k2 = jax.random.split(key)
    phase = (
        jax.random.uniform(k1, (b, 1, cfg.nb_harmonics + 1)) * 2 * jnp.pi
    )
    phase = phase.at[:, :, 0].set(0.0)
    sines = cfg.nsf_alpha * jnp.sin(2 * jnp.pi * rad + phase)
    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)[..., None]
    noise_amp = uv * cfg.nsf_sigma + (1 - uv) * cfg.nsf_alpha / 3.0
    noise = noise_amp * jax.random.normal(k2, sines.shape)
    sines = sines * uv + noise
    src = jnp.tanh(jnp.dot(sines, params["src_w"]) + params["src_b"])
    return src[..., 0]


def decode(
    cfg: HiftConfig,
    params: dict,
    mel: jax.Array,  # [B, T, mel]
    source: jax.Array,  # [B, T * total_upsample]
) -> jax.Array:
    """mel + NSF source -> waveform [B, T * total_upsample]."""
    n_fft, hop = cfg.istft_n_fft, cfg.istft_hop_len
    s_re, s_im = stft(source, n_fft, hop)
    s_stft = jnp.concatenate([s_re, s_im], axis=1)  # [B, n_fft+2, TT]
    s_stft = s_stft.transpose(0, 2, 1)  # [B, TT, n_fft+2]

    x = _conv1d(mel, params["conv_pre_w"], params["conv_pre_b"])
    downsample_rates = [1] + list(cfg.upsample_rates[::-1][:-1])
    cum = np.cumprod(downsample_rates)[::-1]
    for i, (u, k) in enumerate(
        zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
    ):
        x = jnp.where(
            x > 0, x, cfg.lrelu_slope * x
        )
        x = _conv_transpose1d(
            x, params[f"up{i}_w"], params[f"up{i}_b"],
            stride=u, padding=(k - u) // 2,
        )
        if i == len(cfg.upsample_rates) - 1:
            # reflection pad (1, 0) (hifigan.py:573)
            x = jnp.concatenate([x[:, 1:2], x], axis=1)
        # fuse the source at this scale
        uu = int(cum[i])
        if uu == 1:
            si = _conv1d(
                s_stft, params[f"srcdown{i}_w"], params[f"srcdown{i}_b"],
                padding=0,
            )
        else:
            si = _conv1d(
                s_stft, params[f"srcdown{i}_w"], params[f"srcdown{i}_b"],
                stride=uu, padding=uu // 2,
            )
        si = _resblock(
            params, f"srb{i}", si,
            cfg.source_resblock_dilation_sizes[i],
        )
        # align lengths (stride/pad rounding differs by 1 frame at edges)
        tlen = min(x.shape[1], si.shape[1])
        x = x[:, :tlen] + si[:, :tlen]
        acc = None
        for j in range(len(cfg.resblock_kernel_sizes)):
            y = _resblock(
                params, f"rb{i}_{j}", x,
                cfg.resblock_dilation_sizes[j],
            )
            acc = y if acc is None else acc + y
        x = acc / len(cfg.resblock_kernel_sizes)

    x = jnp.where(x > 0, x, cfg.lrelu_slope * x)
    x = _conv1d(x, params["conv_post_w"], params["conv_post_b"])
    half = n_fft // 2 + 1
    mag = jnp.exp(jnp.clip(x[..., :half], -20.0, jnp.log(1e2)))
    phase = jnp.sin(x[..., half:])
    real = (mag * jnp.cos(phase)).transpose(0, 2, 1)
    imag = (mag * jnp.sin(phase)).transpose(0, 2, 1)
    wav = istft(real, imag, n_fft, hop)
    return jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)


def mel_to_wav(
    cfg: HiftConfig, params: dict, mel: jax.Array, key: jax.Array
) -> jax.Array:
    f0 = predict_f0(cfg, params, mel)
    src = harmonic_source(cfg, params, f0, key)
    return decode(cfg, params, mel, src)
