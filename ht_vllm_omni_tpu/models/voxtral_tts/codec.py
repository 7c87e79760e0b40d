"""Voxtral TTS audio-tokenizer decoder (jax).

Codes -> waveform path of the reference VoxtralTTSAudioTokenizer
(reference vllm_omni/model_executor/models/voxtral_tts/
voxtral_tts_audio_tokenizer.py:719-1114), decoder half only (the
open-source checkpoint ships decoder + quantizer weights):

- quantizer.decode: semantic euclidean codebook lookup
  (embedding_sum / cluster_usage) + FSQ rescale of acoustic codes;
- decoder: causal conv in -> 4 transformer groups (ALiBi + causal +
  sliding-window attention, flat-dim qk RMSNorm, layer-scale) with a
  stride-2 causal conv-transpose between groups -> causal conv out ->
  depatch to waveform (240 samples per final-rate step).

Everything is static-shaped and jit-friendly; attention is dense with
an additive bias (chunks are short in streaming use, so the banded
structure does not warrant a custom kernel).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.models.voxtral_tts.config import (
    END_AUDIO,
    NUM_SPECIAL,
    VoxtralCodecConfig,
)


# ------------------------------------------------------------------ params


def _alibi_slopes(n_heads: int) -> np.ndarray:
    """Geometric ALiBi slopes (voxtral_tts_audio_tokenizer.py:469)."""

    def pow2(n):
        r = 2.0 ** (-8.0 / n)
        return np.array([r**i for i in range(n)], np.float32)

    if math.log2(n_heads).is_integer():
        return pow2(n_heads)
    m = 2 ** math.floor(math.log2(n_heads))
    return np.concatenate([pow2(m), pow2(2 * m)[::2][: n_heads - m]])


def _num_layers(cfg: VoxtralCodecConfig) -> int:
    return sum(cfg.decoder_transformer_lengths)


def layer_windows(cfg: VoxtralCodecConfig) -> list[int]:
    """Per-layer sliding windows, groups flattened in order."""
    wins = []
    for g, n in enumerate(cfg.decoder_transformer_lengths):
        wins.extend([cfg.decoder_windows[g]] * n)
    return wins


def init_params(cfg: VoxtralCodecConfig, key: jax.Array) -> dict:
    ks = iter(jax.random.split(key, 32))

    def w(shape, scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    L, d, hd = _num_layers(cfg), cfg.dim, cfg.head_dim
    nq, nk = cfg.n_heads, cfg.n_kv_heads
    n_up = sum(1 for s in cfg.decoder_convs_strides[1:] if s > 1)
    p = {
        "sem_embed": w((cfg.semantic_codebook_size, cfg.semantic_dim), 1.0),
        "conv_in": w(
            (cfg.decoder_convs_kernels[0], cfg.latent_dim, d)
        ),
        "conv_out": w((cfg.patch_proj_kernel_size, d, cfg.patch_size)),
        "upconvs": w(
            (n_up, cfg.decoder_convs_kernels[1], d, d)
        ),
        "ln1": jnp.ones((L, d), jnp.float32),
        "ln2": jnp.ones((L, d), jnp.float32),
        "wq": w((L, d, nq * hd)),
        "wk": w((L, d, nk * hd)),
        "wv": w((L, d, nk * hd)),
        "wo": w((L, nq * hd, d)),
        "w1": w((L, d, cfg.hidden_dim)),
        "w3": w((L, d, cfg.hidden_dim)),
        "w2": w((L, cfg.hidden_dim, d)),
    }
    if cfg.qk_norm:
        p["q_norm"] = jnp.ones((L, nq * hd), jnp.float32)
        p["k_norm"] = jnp.ones((L, nk * hd), jnp.float32)
    if cfg.layer_scale:
        p["attn_scale"] = jnp.full((L, d), 0.1, jnp.float32)
        p["ffn_scale"] = jnp.full((L, d), 0.1, jnp.float32)
    return p


def _wn(v: np.ndarray, g: np.ndarray) -> np.ndarray:
    """Collapse torch weight_norm (v, g) to the effective weight."""
    norm = np.sqrt(
        np.sum(np.square(v), axis=tuple(range(1, v.ndim)), keepdims=True)
    )
    return g * v / np.maximum(norm, 1e-12)


def load_torch_state(cfg: VoxtralCodecConfig, state: dict) -> dict:
    """Map reference decoder weights (torch names) onto the jax layout.

    Handles weight-normed convs (``*.conv.weight_v`` / ``weight_g``)
    and the semantic codebook's (embedding_sum, cluster_usage) pair."""

    def arr(name):
        return np.asarray(state[name], np.float32)

    def conv_w(prefix):
        if f"{prefix}.conv.weight_v" in state:
            w = _wn(arr(f"{prefix}.conv.weight_v"),
                    arr(f"{prefix}.conv.weight_g"))
        else:
            w = arr(f"{prefix}.conv.weight")
        return jnp.asarray(w.transpose(2, 1, 0))  # [out,in,k] -> [k,in,out]

    def convt_w(prefix):
        if f"{prefix}.conv.weight_v" in state:
            w = _wn(arr(f"{prefix}.conv.weight_v"),
                    arr(f"{prefix}.conv.weight_g"))
        else:
            w = arr(f"{prefix}.conv.weight")
        return jnp.asarray(w.transpose(2, 0, 1))  # [in,out,k] -> [k,in,out]

    usage = arr("quantizer.semantic_codebook.cluster_usage")
    emb_sum = arr("quantizer.semantic_codebook.embedding_sum")
    p = {
        "sem_embed": jnp.asarray(
            emb_sum / np.maximum(usage, 1e-5)[:, None]
        ),
        "conv_in": conv_w("decoder_blocks.0"),
    }

    # walk decoder_blocks in construction order: conv, then per group
    # [transformer, conv-transpose?] (voxtral_tts_audio_tokenizer.py:800)
    block_idx = 1
    stacked: dict[str, list] = {
        k: []
        for k in (
            "ln1", "ln2", "wq", "wk", "wv", "wo", "w1", "w2", "w3",
            "q_norm", "k_norm", "attn_scale", "ffn_scale",
        )
    }
    upconvs = []
    n_groups = len(cfg.decoder_transformer_lengths)
    for g in range(n_groups):
        base = f"decoder_blocks.{block_idx}"
        for li in range(cfg.decoder_transformer_lengths[g]):
            lb = f"{base}.layers.{li}"
            stacked["ln1"].append(arr(f"{lb}.attention_norm.weight"))
            stacked["ln2"].append(arr(f"{lb}.ffn_norm.weight"))
            stacked["wq"].append(arr(f"{lb}.attention.wq.weight").T)
            stacked["wk"].append(arr(f"{lb}.attention.wk.weight").T)
            stacked["wv"].append(arr(f"{lb}.attention.wv.weight").T)
            stacked["wo"].append(arr(f"{lb}.attention.wo.weight").T)
            stacked["w1"].append(arr(f"{lb}.feed_forward.w1.weight").T)
            stacked["w2"].append(arr(f"{lb}.feed_forward.w2.weight").T)
            stacked["w3"].append(arr(f"{lb}.feed_forward.w3.weight").T)
            if cfg.qk_norm:
                stacked["q_norm"].append(
                    arr(f"{lb}.attention.q_norm.weight")
                )
                stacked["k_norm"].append(
                    arr(f"{lb}.attention.k_norm.weight")
                )
            if cfg.layer_scale:
                stacked["attn_scale"].append(
                    arr(f"{lb}.attention_scale")
                )
                stacked["ffn_scale"].append(arr(f"{lb}.ffn_scale"))
        block_idx += 1
        nxt = g + 1
        if nxt < n_groups and (
            cfg.decoder_convs_kernels[nxt] != 1
            or cfg.decoder_convs_strides[nxt] != 1
        ):
            upconvs.append(convt_w(f"decoder_blocks.{block_idx}"))
            block_idx += 1

    for k, v in stacked.items():
        if v:
            p[k] = jnp.asarray(np.stack(v))
    p["upconvs"] = jnp.asarray(np.stack(upconvs))
    p["conv_out"] = conv_w("output_proj")
    return p


# ------------------------------------------------------------------ model


def _rms(x, w, eps):
    v = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (w * (x * jax.lax.rsqrt(v + eps))).astype(x.dtype)


def _causal_conv(x: jax.Array, w: jax.Array, pad_mode: str) -> jax.Array:
    """Left-padded stride-1 conv; x [B, T, C], w [k, in, out]."""
    k = w.shape[0]
    if k > 1:
        mode = {"replicate": "edge", "reflect": "reflect"}[pad_mode]
        x = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)), mode=mode)
    return jax.lax.conv_general_dilated(
        x, w, (1,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


def _causal_conv_transpose(
    x: jax.Array, w: jax.Array, stride: int
) -> jax.Array:
    """Stride-s conv-transpose trimmed causally: out keeps
    [0 : (T*s)] — total_padding = k - s removed from the right
    (trim_ratio=1, voxtral_tts_audio_tokenizer.py:417).

    Expressed as an input-dilated conv with a flipped kernel, which is
    exactly ``torch.nn.ConvTranspose1d`` (out[t] = sum_s x[s] *
    w[:, :, t - s*stride]); w is [k, in, out]."""
    k = w.shape[0]
    out = jax.lax.conv_general_dilated(
        x, jnp.flip(w, 0), window_strides=(1,),
        padding=[(k - 1, k - 1)], lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out[:, : out.shape[1] - (k - stride)]


def _attention(cfg: VoxtralCodecConfig, p, li: int, window: int,
               x: jax.Array) -> jax.Array:
    b, t, _ = x.shape
    nq, nk, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    q, k, v = x @ p["wq"][li], x @ p["wk"][li], x @ p["wv"][li]
    if cfg.qk_norm:
        q = _rms(q, p["q_norm"][li], cfg.qk_norm_eps)
        k = _rms(k, p["k_norm"][li], cfg.qk_norm_eps)
    q = q.reshape(b, t, nq, hd)
    k = k.reshape(b, t, nk, hd)
    v = v.reshape(b, t, nk, hd)
    if nq != nk:
        k = jnp.repeat(k, nq // nk, axis=2)
        v = jnp.repeat(v, nq // nk, axis=2)
    slopes = jnp.asarray(_alibi_slopes(nq))
    pos = jnp.arange(t)
    rel = pos[None, :] - pos[:, None]  # rel[i, j] = j - i
    bias = slopes[:, None, None] * rel[None].astype(jnp.float32)
    bad = (rel > 0) | (rel < -window)
    bias = jnp.where(bad[None], jnp.finfo(jnp.float32).min, bias)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd**-0.5)
    attn = jax.nn.softmax(
        scores.astype(jnp.float32) + bias[None], -1
    ).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, nq * hd)
    return o @ p["wo"][li]


def _layer(cfg, p, li, window, x):
    r = _attention(cfg, p, li, window, _rms(x, p["ln1"][li], cfg.norm_eps))
    if cfg.layer_scale:
        r = p["attn_scale"][li] * r
    x = x + r
    h = _rms(x, p["ln2"][li], cfg.norm_eps)
    r = (jax.nn.silu(h @ p["w1"][li]) * (h @ p["w3"][li])) @ p["w2"][li]
    if cfg.layer_scale:
        r = p["ffn_scale"][li] * r
    return x + r


def dequantize(cfg: VoxtralCodecConfig, p, codes: jax.Array) -> jax.Array:
    """codes [T, K] (offset-free, i.e. specials already subtracted) ->
    latent [T, semantic_dim + acoustic_dim]."""
    sem = p["sem_embed"][jnp.clip(codes[:, 0], 0,
                                  cfg.semantic_codebook_size - 1)]
    ac = (
        codes[:, 1:].astype(jnp.float32)
        * 2.0 / (cfg.acoustic_codebook_size - 1)
        - 1.0
    )
    return jnp.concatenate([sem, ac], axis=-1)


def decode_latent(cfg: VoxtralCodecConfig, p, latent: jax.Array):
    """latent [B, T, latent_dim] -> waveform [B, T * downsample]."""
    x = _causal_conv(latent, p["conv_in"], "replicate")
    wins = layer_windows(cfg)
    li = 0
    up = 0
    n_groups = len(cfg.decoder_transformer_lengths)
    for g in range(n_groups):
        for _ in range(cfg.decoder_transformer_lengths[g]):
            x = _layer(cfg, p, li, wins[li], x)
            li += 1
        nxt = g + 1
        if nxt < n_groups and (
            cfg.decoder_convs_kernels[nxt] != 1
            or cfg.decoder_convs_strides[nxt] != 1
        ):
            x = _causal_conv_transpose(
                x, p["upconvs"][up], cfg.decoder_convs_strides[nxt]
            )
            up += 1
    x = _causal_conv(x, p["conv_out"], "reflect")  # [B, T', patch]
    b, t, h = x.shape
    return x.reshape(b, t * h)


def decode_codes(cfg: VoxtralCodecConfig, p, codes: jax.Array):
    """Offset codes [T, K] -> waveform [T * downsample] (the -2 unshift
    of decode_helper_batch_async, voxtral_tts_audio_tokenizer.py:1040)."""
    latent = dequantize(cfg, p, codes - NUM_SPECIAL)
    return decode_latent(cfg, p, latent[None])[0]


class VoxtralCodecModel:
    """GenerationEngine adapter (engine/generation_engine.py contract):
    chunk payloads carry offset audio codes under
    additional_information["codes"] as [K, n]; left-context frames are
    decoded and trimmed like the other codec stages."""

    def __init__(
        self,
        cfg: VoxtralCodecConfig,
        params: dict | None = None,
        seed: int = 0,
    ) -> None:
        self.cfg = cfg
        self.params = params or init_params(cfg, jax.random.PRNGKey(seed))
        self._fns: dict[int, object] = {}

    @property
    def sample_rate(self) -> int:
        return self.cfg.sampling_rate

    def __call__(self, token_ids, prompt_embeds, info, state):
        codes = info.get("codes")
        if codes is None:
            return {}
        codes = np.asarray(codes, np.int32)
        if codes.ndim == 1:
            codes = codes[None]
        codes = codes.T  # [K, n] -> [n, K]
        # cut at the first [END_AUDIO] frame
        end = np.nonzero(codes[:, 0] == END_AUDIO)[0]
        if len(end):
            codes = codes[: end[0]]
        t = len(codes)
        if t == 0:
            return {}
        left = int(info.get("left_context", 0) or 0)
        fn = self._fns.get(t)
        if fn is None:
            fn = jax.jit(
                lambda p, c: decode_codes(self.cfg, p, c)
            )
            self._fns[t] = fn
        wav = np.asarray(fn(self.params, codes))
        return {
            "audio": wav[left * self.cfg.downsample_factor :],
            "sample_rate": np.asarray(self.sample_rate),
        }
