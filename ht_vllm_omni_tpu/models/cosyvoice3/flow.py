"""CosyVoice3 flow-matching token->mel decoder in jax.

Counterpart of the reference CausalMaskedDiffWithDiT + ConditionalCFM
(reference vllm_omni/model_executor/models/cosyvoice3/code2wav_core/
cfm.py:40-160 and cosyvoice3_code2wav.py:47-78):

- speech tokens embed -> pre-lookahead conv (right-context
  ``pre_lookahead_len``) -> repeat-upsample by ``token_mel_ratio`` ->
  encoder projection = mu [B, T_mel, 80];
- Euler ODE over a cosine-scheduled t-span, with inference-time CFG
  (positive branch conditioned on mu/spk, negative on zeros; combined
  (1+r)*pos - r*neg, cfm.py:solve_euler);
- the estimator is a 1-D mel DiT: timestep AdaLN + speaker conditioning
  over [x || mu || spk] channels (the reference instantiates its DiT
  estimator from the same conditioning set).

The whole n_timesteps solve runs under one ``lax.scan``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.models.cosyvoice3.config import FlowConfig


def init_params(cfg: FlowConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 32))
    h = cfg.dit_hidden
    mel = cfg.output_size
    L = cfg.dit_layers

    def w(shape, scale=None):
        scale = scale or 1.0 / math.sqrt(shape[-2] if len(shape) > 1 else 1)
        return jax.random.normal(next(keys), shape, jnp.float32) * scale

    p = {
        "tok_embed": w((cfg.vocab_size, cfg.input_size), 0.02),
        # pre-lookahead conv: kernel (1 + lookahead) taps of RIGHT context
        "pre_w": w((cfg.pre_lookahead_len + 1, cfg.input_size,
                    cfg.input_size)),
        "pre_b": jnp.zeros((cfg.input_size,)),
        "enc_w": w((cfg.input_size, mel)),
        "enc_b": jnp.zeros((mel,)),
        "spk_w": w((cfg.spk_embed_dim, mel)),
        "spk_b": jnp.zeros((mel,)),
        # estimator input proj: [x, mu, spk] channels -> hidden
        "in_w": w((3 * mel, h)), "in_b": jnp.zeros((h,)),
        "t_w1": w((256, h)), "t_b1": jnp.zeros((h,)),
        "t_w2": w((h, h)), "t_b2": jnp.zeros((h,)),
        "out_w": w((h, mel), 0.0), "out_b": jnp.zeros((mel,)),
        # DiT blocks (AdaLN-zero, self-attention over mel frames)
        "mod_w": w((L, h, 6 * h), 0.02), "mod_b": jnp.zeros((L, 6 * h)),
        "qkv_w": w((L, h, 3 * h)), "qkv_b": jnp.zeros((L, 3 * h)),
        "attn_out_w": w((L, h, h)), "attn_out_b": jnp.zeros((L, h)),
        "mlp_w1": w((L, h, 4 * h)), "mlp_b1": jnp.zeros((L, 4 * h)),
        "mlp_w2": w((L, 4 * h, h)), "mlp_b2": jnp.zeros((L, h)),
    }
    return p


def encode_tokens(
    cfg: FlowConfig, params: dict, tokens: jax.Array  # [B, T_tok]
) -> jax.Array:
    """tokens -> mu [B, T_tok * token_mel_ratio, mel]."""
    x = params["tok_embed"][jnp.clip(tokens, 0, cfg.vocab_size - 1)]
    # pre-lookahead: conv over [t, t+1, .., t+lookahead] (right context),
    # reference PreLookaheadLayer (code2wav_core/layers.py)
    k = cfg.pre_lookahead_len + 1
    xp = jnp.pad(x, ((0, 0), (0, k - 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, params["pre_w"], (1,), [(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    ) + params["pre_b"]
    x = x + jax.nn.relu(y)
    # repeat-upsample tokens -> mel frames
    x = jnp.repeat(x, cfg.token_mel_ratio, axis=1)
    return jnp.dot(x, params["enc_w"]) + params["enc_b"]


def _ln(x):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


def estimator(
    cfg: FlowConfig,
    params: dict,
    x: jax.Array,  # [B, T, mel] current sample
    mu: jax.Array,  # [B, T, mel] encoder output (zeros on the CFG branch)
    spk: jax.Array,  # [B, mel] projected speaker embedding
    t: jax.Array,  # [B] flow time
) -> jax.Array:
    b, s, mel = x.shape
    h = cfg.dit_hidden
    nh = cfg.dit_heads
    hd = h // nh

    spk_t = jnp.broadcast_to(spk[:, None, :], (b, s, mel))
    z = jnp.concatenate([x, mu, spk_t], axis=-1)
    z = jnp.dot(z, params["in_w"]) + params["in_b"]

    half = 128
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = 1000.0 * t.astype(jnp.float32)[:, None] * freqs[None]
    temb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    temb = jnp.dot(temb, params["t_w1"]) + params["t_b1"]
    temb = jax.nn.silu(temb)
    temb = jnp.dot(temb, params["t_w2"]) + params["t_b2"]
    temb = jax.nn.silu(temb)

    def block(z, lp):
        mod = jnp.dot(temb, lp["mod_w"]) + lp["mod_b"]
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6, axis=-1)
        zn = _ln(z) * (1 + sc1[:, None]) + sh1[:, None]
        qkv = jnp.dot(zn, lp["qkv_w"]) + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        sc = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(hd)
        a = jax.nn.softmax(sc, axis=-1).astype(z.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, h)
        z = z + g1[:, None] * (
            jnp.dot(o, lp["attn_out_w"]) + lp["attn_out_b"]
        )
        zn = _ln(z) * (1 + sc2[:, None]) + sh2[:, None]
        m = jax.nn.gelu(
            jnp.dot(zn, lp["mlp_w1"]) + lp["mlp_b1"], approximate=True
        )
        z = z + g2[:, None] * (jnp.dot(m, lp["mlp_w2"]) + lp["mlp_b2"])
        return z, None

    tree = {
        k: params[k]
        for k in (
            "mod_w", "mod_b", "qkv_w", "qkv_b", "attn_out_w",
            "attn_out_b", "mlp_w1", "mlp_b1", "mlp_w2", "mlp_b2",
        )
    }
    z, _ = jax.lax.scan(block, z, tree)
    return jnp.dot(_ln(z), params["out_w"]) + params["out_b"]


def solve(
    cfg: FlowConfig,
    params: dict,
    mu: jax.Array,  # [B, T, mel]
    spk_embed: jax.Array,  # [B, spk_embed_dim]
    noise: jax.Array,  # [B, T, mel]
) -> jax.Array:
    """Euler CFG solve (reference cfm.py:solve_euler): returns mel."""
    n = cfg.n_timesteps
    # F.normalize(spk) in the reference (CausalMaskedDiffWithDiT)
    spk = spk_embed / jnp.maximum(
        jnp.linalg.norm(spk_embed, axis=-1, keepdims=True), 1e-8
    )
    spk = jnp.dot(spk, params["spk_w"]) + params["spk_b"]
    t_span = jnp.linspace(0.0, 1.0, n + 1)
    if cfg.t_scheduler == "cosine":
        t_span = 1.0 - jnp.cos(t_span * 0.5 * jnp.pi)
    rate = cfg.inference_cfg_rate

    def step(x, i):
        t = t_span[i]
        dt = t_span[i + 1] - t_span[i]
        b = x.shape[0]
        tb = jnp.full((b,), t, jnp.float32)
        pos = estimator(cfg, params, x, mu, spk, tb)
        neg = estimator(
            cfg, params, x, jnp.zeros_like(mu), jnp.zeros_like(spk), tb
        )
        dphi = (1.0 + rate) * pos - rate * neg
        return x + dt * dphi, None

    x, _ = jax.lax.scan(step, noise, jnp.arange(n))
    return x


def token2mel(
    cfg: FlowConfig,
    params: dict,
    tokens: jax.Array,  # [B, T_tok]
    spk_embed: jax.Array,  # [B, spk_embed_dim]
    key: jax.Array,
) -> jax.Array:
    mu = encode_tokens(cfg, params, tokens)
    noise = jax.random.normal(key, mu.shape, jnp.float32)
    return solve(cfg, params, mu, spk_embed, noise)
