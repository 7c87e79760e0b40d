"""DAC (Descript Audio Codec) decoder in jax.

Codes -> waveform path of Fish-Speech (reference
vllm_omni/model_executor/models/fish_speech/fish_speech_dac_decoder.py),
matching HF ``DacModel``'s quantizer.from_codes + decoder semantics:

- ResidualVQ decode: per-quantizer codebook lookup -> 1x1 out_proj,
  summed over codebooks;
- decoder: conv_in (k=7), one block per upsampling ratio
  (snake -> ConvTranspose1d(k=2r, stride=r, pad=ceil(r/2)) -> 3 residual
  units with dilations 1/3/9), final snake -> conv_out (k=7) -> tanh;
- snake(x) = x + sin^2(alpha x) / (alpha + 1e-9), alpha per channel.

Layout is channels-last ([B, T, C]) for TPU-friendly convs; the loader
transposes torch's [out, in, k] conv kernels to [k, in, out].
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DacDecoderConfig:
    latent_dim: int = 1024  # encoder_hidden_size * 2**len(ratios) in HF
    decoder_hidden_size: int = 1536
    upsampling_ratios: tuple[int, ...] = (8, 8, 4, 2)
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    dtype: str = "float32"

    @staticmethod
    def tiny(**kw) -> "DacDecoderConfig":
        base = dict(
            latent_dim=64, decoder_hidden_size=16,
            upsampling_ratios=(2, 4), n_codebooks=4, codebook_size=32,
            codebook_dim=6,
        )
        base.update(kw)
        return DacDecoderConfig(**base)

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.upsampling_ratios))


def _dt(cfg: DacDecoderConfig):
    return jnp.dtype(cfg.dtype)


def init_params(cfg: DacDecoderConfig, key: jax.Array) -> dict:
    dt = _dt(cfg)
    keys = iter(jax.random.split(key, 64))

    def w(shape, fan=None):
        fan = fan or max(int(np.prod(shape[:-1])), 1)
        return (
            jax.random.normal(next(keys), shape, jnp.float32)
            / math.sqrt(fan)
        ).astype(dt)

    p: dict = {
        "codebooks": w(
            (cfg.n_codebooks, cfg.codebook_size, cfg.codebook_dim), fan=1
        ),
        "out_proj_w": w(
            (cfg.n_codebooks, 1, cfg.codebook_dim, cfg.latent_dim)
        ),
        "out_proj_b": jnp.zeros((cfg.n_codebooks, cfg.latent_dim), dt),
        "conv_in_w": w((7, cfg.latent_dim, cfg.decoder_hidden_size)),
        "conv_in_b": jnp.zeros((cfg.decoder_hidden_size,), dt),
    }
    ch = cfg.decoder_hidden_size
    for i, r in enumerate(cfg.upsampling_ratios):
        out = ch // 2
        p[f"b{i}_alpha_in"] = jnp.ones((ch,), dt)
        p[f"b{i}_up_w"] = w((2 * r, out, ch))  # [k, out, in] (transposed)
        p[f"b{i}_up_b"] = jnp.zeros((out,), dt)
        for j, _d in enumerate((1, 3, 9)):
            p[f"b{i}_r{j}_alpha1"] = jnp.ones((out,), dt)
            p[f"b{i}_r{j}_conv1_w"] = w((7, out, out))
            p[f"b{i}_r{j}_conv1_b"] = jnp.zeros((out,), dt)
            p[f"b{i}_r{j}_alpha2"] = jnp.ones((out,), dt)
            p[f"b{i}_r{j}_conv2_w"] = w((1, out, out))
            p[f"b{i}_r{j}_conv2_b"] = jnp.zeros((out,), dt)
        ch = out
    p["alpha_out"] = jnp.ones((ch,), dt)
    p["conv_out_w"] = w((7, ch, 1))
    p["conv_out_b"] = jnp.zeros((1,), dt)
    return p


def _snake(x: jax.Array, alpha: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    a = alpha.astype(jnp.float32)
    return (xf + jnp.sin(a * xf) ** 2 / (a + 1e-9)).astype(x.dtype)


def _conv1d(x, w, b, *, dilation=1, padding=None):
    """x [B, T, Cin], w [k, Cin, Cout] -> [B, T', Cout]."""
    k = w.shape[0]
    if padding is None:
        padding = dilation * (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y + b


def _conv_transpose1d(x, w, b, *, stride):
    """x [B, T, Cin], w [k, Cout, Cin] -> [B, T*stride, Cout].

    Matches torch ConvTranspose1d(k=2*stride, stride, pad=ceil(stride/2)):
    lhs-dilated conv with flipped kernel; torch 'padding' trims k-1-pad
    from each side of the full output.
    """
    k = w.shape[0]
    pad = math.ceil(stride / 2)
    lo = k - 1 - pad
    hi = k - 1 - pad + (stride - 1 if (2 * pad - k + stride) % stride else 0)
    # full output length = (T-1)*stride + k - 2*pad; with k=2*stride and
    # pad=ceil(stride/2) this is T*stride for even stride
    y = jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, 0),  # [k, Cout, Cin] flipped taps
        window_strides=(1,),
        padding=[(lo, hi)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HOI", "NHC"),
    )
    return y + b


def from_codes(cfg: DacDecoderConfig, params: dict, codes: jax.Array):
    """codes [B, n_codebooks, T] -> latent [B, T, latent_dim] (HF
    DacResidualVectorQuantize.from_codes)."""
    z = None
    for i in range(cfg.n_codebooks):
        e = params["codebooks"][i][codes[:, i]]  # [B, T, cb_dim]
        zi = _conv1d(
            e, params["out_proj_w"][i], params["out_proj_b"][i], padding=0
        )
        z = zi if z is None else z + zi
    return z


def decode_latent(
    cfg: DacDecoderConfig, params: dict, z: jax.Array
) -> jax.Array:
    """latent [B, T, latent_dim] -> waveform [B, T*hop]."""
    x = _conv1d(z, params["conv_in_w"], params["conv_in_b"])
    for i, r in enumerate(cfg.upsampling_ratios):
        x = _snake(x, params[f"b{i}_alpha_in"])
        x = _conv_transpose1d(
            x, params[f"b{i}_up_w"], params[f"b{i}_up_b"], stride=r
        )
        for j, d in enumerate((1, 3, 9)):
            h = _snake(x, params[f"b{i}_r{j}_alpha1"])
            h = _conv1d(
                x=h, w=params[f"b{i}_r{j}_conv1_w"],
                b=params[f"b{i}_r{j}_conv1_b"], dilation=d,
            )
            h = _snake(h, params[f"b{i}_r{j}_alpha2"])
            h = _conv1d(
                h, params[f"b{i}_r{j}_conv2_w"],
                params[f"b{i}_r{j}_conv2_b"], padding=0,
            )
            x = x + h
    x = _snake(x, params["alpha_out"])
    x = _conv1d(x, params["conv_out_w"], params["conv_out_b"])
    return jnp.tanh(x.astype(jnp.float32))[..., 0]


def decode(cfg: DacDecoderConfig, params: dict, codes: jax.Array):
    return decode_latent(cfg, params, from_codes(cfg, params, codes))


# ------------------------------------------------------------------ loading
def config_from_hf(hf_cfg) -> DacDecoderConfig:
    return DacDecoderConfig(
        latent_dim=hf_cfg.hidden_size,
        decoder_hidden_size=hf_cfg.decoder_hidden_size,
        upsampling_ratios=tuple(reversed(hf_cfg.downsampling_ratios)),
        n_codebooks=hf_cfg.n_codebooks,
        codebook_size=hf_cfg.codebook_size,
        codebook_dim=hf_cfg.codebook_dim,
    )


def load_hf_params(
    cfg: DacDecoderConfig, tensors: dict[str, np.ndarray], dtype=None
) -> dict:
    """HF ``DacModel`` state dict (decoder + quantizer subset) -> pytree."""
    dt = jnp.dtype(dtype or cfg.dtype)

    def f32(t):
        if t.dtype == np.uint16:
            return np.asarray(
                jnp.asarray(t).view(jnp.bfloat16), dtype=np.float32
            )
        return t.astype(np.float32)

    g = lambda k: f32(tensors[k])  # noqa: E731

    def conv(k):  # torch [out, in, kw] -> [kw, in, out]
        return jnp.asarray(g(k).transpose(2, 1, 0), dt)

    def convT(k):  # torch ConvTranspose1d [in, out, kw] -> [kw, out, in]
        return jnp.asarray(g(k).transpose(2, 1, 0), dt)

    p = {
        "codebooks": jnp.asarray(
            np.stack(
                [
                    g(f"quantizer.quantizers.{i}.codebook.weight")
                    for i in range(cfg.n_codebooks)
                ]
            ),
            dt,
        ),
        "out_proj_w": jnp.stack(
            [
                conv(f"quantizer.quantizers.{i}.out_proj.weight")
                for i in range(cfg.n_codebooks)
            ]
        ),
        "out_proj_b": jnp.asarray(
            np.stack(
                [
                    g(f"quantizer.quantizers.{i}.out_proj.bias")
                    for i in range(cfg.n_codebooks)
                ]
            ),
            dt,
        ),
        "conv_in_w": conv("decoder.conv1.weight"),
        "conv_in_b": jnp.asarray(g("decoder.conv1.bias"), dt),
        "alpha_out": jnp.asarray(g("decoder.snake1.alpha")[0, :, 0], dt),
        "conv_out_w": conv("decoder.conv2.weight"),
        "conv_out_b": jnp.asarray(g("decoder.conv2.bias"), dt),
    }
    for i in range(len(cfg.upsampling_ratios)):
        pre = f"decoder.block.{i}."
        p[f"b{i}_alpha_in"] = jnp.asarray(
            g(pre + "snake1.alpha")[0, :, 0], dt
        )
        p[f"b{i}_up_w"] = convT(pre + "conv_t1.weight")
        p[f"b{i}_up_b"] = jnp.asarray(g(pre + "conv_t1.bias"), dt)
        for j in range(3):
            rp = pre + f"res_unit{j + 1}."
            p[f"b{i}_r{j}_alpha1"] = jnp.asarray(
                g(rp + "snake1.alpha")[0, :, 0], dt
            )
            p[f"b{i}_r{j}_conv1_w"] = conv(rp + "conv1.weight")
            p[f"b{i}_r{j}_conv1_b"] = jnp.asarray(g(rp + "conv1.bias"), dt)
            p[f"b{i}_r{j}_alpha2"] = jnp.asarray(
                g(rp + "snake2.alpha")[0, :, 0], dt
            )
            p[f"b{i}_r{j}_conv2_w"] = conv(rp + "conv2.weight")
            p[f"b{i}_r{j}_conv2_b"] = jnp.asarray(g(rp + "conv2.bias"), dt)
    return p
