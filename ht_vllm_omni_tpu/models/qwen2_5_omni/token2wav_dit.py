"""Qwen2.5-Omni token2wav DiT (jax): codec tokens -> mel spectrogram.

Flow-matching DiT with block-local attention and an ECAPA-TDNN speaker
encoder, following the reference Qwen2_5OmniToken2WavDiTModel
(reference vllm_omni/model_executor/models/qwen2_5_omni/
qwen2_5_omni_token2wav.py:1174):

- input embedding = proj([noisy mel, ECAPA(ref mel) per-frame, codec
  embedding repeat_interleaved to mel rate, x-vector]) (:385-417);
- RoPE is applied to attention head 0 ONLY, in the interleaved-pair
  convention (:533-601, a training quirk kept for weight parity);
- per-layer block mask: block_diff in [-look_backward, look_ahead]
  where only layers in look_ahead/backward_layers see 1 block out
  (:631-664);
- classifier-free guidance doubles the batch (cond / uncond drops
  speaker + reference-mel + codes) (:394-416);
- sampling integrates the ODE with the reference's 3/8-rule RK4 over a
  sway-warped time grid (:1086-1171, :1265-1337).

Everything is static-shaped; ``sample`` jits per (T_mel, num_steps).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.models.qwen2_5_omni.config import DiTConfig


# ------------------------------------------------------------------ ECAPA
def _same_conv(x, w, b, dilation=1):
    """'same'-padded (reflect) dilated conv; x [B, T, C], w [k, in, out]."""
    k = w.shape[0]
    total = (k - 1) * dilation
    if total:
        left = total // 2
        x = jnp.pad(
            x, ((0, 0), (left, total - left), (0, 0)), mode="reflect"
        )
    y = jax.lax.conv_general_dilated(
        x, w, (1,), "VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y + b


def _tdnn(x, p, dilation=1):
    return jax.nn.relu(_same_conv(x, p["w"], p["b"], dilation))


def _spk_init(cfg: DiTConfig, ks) -> dict:
    def w(shape, scale=0.05):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    def conv(cin, cout, k):
        return {"w": w((k, cin, cout)), "b": jnp.zeros((cout,))}

    ch = cfg.enc_channels
    layers = []
    for i in range(1, len(ch) - 1):
        scale = cfg.enc_res2net_scale
        layers.append({
            "tdnn1": conv(ch[i - 1], ch[i], 1),
            "res2net": [
                conv(ch[i] // scale, ch[i] // scale,
                     cfg.enc_kernel_sizes[i])
                for _ in range(scale - 1)
            ],
            "tdnn2": conv(ch[i], ch[i], 1),
            "se1": conv(ch[i], cfg.enc_se_channels, 1),
            "se2": conv(cfg.enc_se_channels, ch[i], 1),
        })
    return {
        "block0": conv(cfg.mel_dim, ch[0], cfg.enc_kernel_sizes[0]),
        "layers": layers,
        "mfa": conv(sum(ch[1:-1]), ch[-1], cfg.enc_kernel_sizes[-1]),
        "asp_tdnn": conv(ch[-1] * 3, cfg.enc_attention_channels, 1),
        "asp_conv": conv(cfg.enc_attention_channels, ch[-1], 1),
        "fc": conv(ch[-1] * 2, cfg.enc_dim, 1),
    }


def spk_encode(cfg: DiTConfig, p: dict, ref_mel: jax.Array) -> jax.Array:
    """Reference mel [B, T, mel_dim] -> speaker code [B, enc_dim]
    (ECAPA_TimeDelayNet.forward, token2wav.py:362-384)."""
    x = _tdnn(ref_mel, p["block0"], cfg.enc_dilations[0])
    feats = []
    for i, lp in enumerate(p["layers"], start=1):
        residual = x
        h = _tdnn(x, lp["tdnn1"])
        # Res2Net: first chunk passes through; chunk i runs through
        # block i-1 summed with the previous block's output
        parts = jnp.split(h, cfg.enc_res2net_scale, axis=-1)
        outs = [parts[0]]
        prev = None
        for j in range(1, cfg.enc_res2net_scale):
            inp = parts[j] if j == 1 else parts[j] + prev
            prev = _tdnn(inp, lp["res2net"][j - 1], cfg.enc_dilations[i])
            outs.append(prev)
        h = jnp.concatenate(outs, axis=-1)
        h = _tdnn(h, lp["tdnn2"])
        # squeeze-excitation over the time mean
        m = jnp.mean(h, axis=1, keepdims=True)
        m = jax.nn.relu(_same_conv(m, lp["se1"]["w"], lp["se1"]["b"]))
        m = jax.nn.sigmoid(_same_conv(m, lp["se2"]["w"], lp["se2"]["b"]))
        x = h * m + residual
        feats.append(x)
    x = _tdnn(jnp.concatenate(feats, axis=-1), p["mfa"],
              cfg.enc_dilations[-1])

    # attentive statistics pooling (uniform lengths)
    t = x.shape[1]
    mean = jnp.mean(x, axis=1, keepdims=True)
    std = jnp.sqrt(
        jnp.clip(jnp.mean((x - mean) ** 2, axis=1, keepdims=True), 1e-12)
    )
    att = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape),
         jnp.broadcast_to(std, x.shape)], axis=-1,
    )
    att = _tdnn(att, p["asp_tdnn"])
    att = jnp.tanh(att)
    att = _same_conv(att, p["asp_conv"]["w"], p["asp_conv"]["b"])
    att = jax.nn.softmax(att, axis=1)
    mean = jnp.sum(att * x, axis=1)
    std = jnp.sqrt(
        jnp.clip(jnp.sum(att * (x - mean[:, None]) ** 2, axis=1), 1e-12)
    )
    pooled = jnp.concatenate([mean, std], axis=-1)[:, None]
    out = _same_conv(pooled, p["fc"]["w"], p["fc"]["b"])
    return out[:, 0]


# -------------------------------------------------------------------- DiT
def init_params(cfg: DiTConfig, key: jax.Array) -> dict:
    ks = iter(jax.random.split(key, 64 + 10 * cfg.num_hidden_layers))

    def w(shape, scale=0.02):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    L, d = cfg.num_hidden_layers, cfg.hidden_size
    inner = cfg.num_attention_heads * cfg.head_dim
    in_dim = cfg.mel_dim + cfg.enc_dim + cfg.emb_dim + cfg.enc_emb_dim
    return {
        "spk": _spk_init(cfg, ks),
        "codec_embed": w((cfg.num_embeds + 1, cfg.emb_dim), 1.0),
        "in_w": w((in_dim, d)),
        "in_b": jnp.zeros((d,)),
        "t_w1": w((256, d)),
        "t_b1": jnp.zeros((d,)),
        "t_w2": w((d, d)),
        "t_b2": jnp.zeros((d,)),
        "ada_w": w((L, d, 6 * d)),
        "ada_b": jnp.zeros((L, 6 * d)),
        "qkv_w": w((L, d, 3 * inner)),
        "qkv_b": jnp.zeros((L, 3 * inner)),
        "out_w": w((L, inner, d)),
        "out_b": jnp.zeros((L, d)),
        "ff_w1": w((L, d, cfg.ff_mult * d)),
        "ff_b1": jnp.zeros((L, cfg.ff_mult * d)),
        "ff_w2": w((L, cfg.ff_mult * d, d)),
        "ff_b2": jnp.zeros((L, d)),
        "final_w": w((d, 2 * d)),
        "final_b": jnp.zeros((2 * d,)),
        "proj_w": w((d, cfg.mel_dim)),
        "proj_b": jnp.zeros((cfg.mel_dim,)),
    }


def load_hf_state(cfg: DiTConfig, state: dict) -> dict:
    """Map HF/reference weight names (token2wav.py:1410 load_weights)
    onto the jax layout.  Accepts either split to_q/to_k/to_v or a
    pre-fused qkv_proj."""

    def g(name):
        return jnp.asarray(np.asarray(state[name], np.float32))

    def conv(prefix):
        return {
            "w": g(f"{prefix}.weight").transpose(2, 1, 0),
            "b": g(f"{prefix}.bias"),
        }

    L = cfg.num_hidden_layers

    def qkv(i):
        base = f"transformer_blocks.{i}.attn"
        if f"{base}.qkv_proj.weight" in state:
            return g(f"{base}.qkv_proj.weight").T, g(f"{base}.qkv_proj.bias")
        ws = [g(f"{base}.to_{n}.weight").T for n in ("q", "k", "v")]
        bs = [g(f"{base}.to_{n}.bias") for n in ("q", "k", "v")]
        return jnp.concatenate(ws, 1), jnp.concatenate(bs, 0)

    qkvs = [qkv(i) for i in range(L)]
    spk_layers = []
    n_mid = len(cfg.enc_channels) - 2
    for i in range(1, n_mid + 1):
        base = f"input_embed.spk_encoder.blocks.{i}"
        spk_layers.append({
            "tdnn1": conv(f"{base}.tdnn1.conv"),
            "res2net": [
                conv(f"{base}.res2net_block.blocks.{j}.conv")
                for j in range(cfg.enc_res2net_scale - 1)
            ],
            "tdnn2": conv(f"{base}.tdnn2.conv"),
            "se1": conv(f"{base}.se_block.conv1"),
            "se2": conv(f"{base}.se_block.conv2"),
        })
    stk = lambda fmt, T=True: jnp.stack(
        [g(fmt.format(i)).T if T else g(fmt.format(i)) for i in range(L)]
    )
    return {
        "spk": {
            "block0": conv("input_embed.spk_encoder.blocks.0.conv"),
            "layers": spk_layers,
            "mfa": conv("input_embed.spk_encoder.mfa.conv"),
            "asp_tdnn": conv("input_embed.spk_encoder.asp.tdnn.conv"),
            "asp_conv": conv("input_embed.spk_encoder.asp.conv"),
            "fc": conv("input_embed.spk_encoder.fc"),
        },
        "codec_embed": g("text_embed.codec_embed.weight"),
        "in_w": g("input_embed.proj.weight").T,
        "in_b": g("input_embed.proj.bias"),
        "t_w1": g("time_embed.time_mlp.0.weight").T,
        "t_b1": g("time_embed.time_mlp.0.bias"),
        "t_w2": g("time_embed.time_mlp.2.weight").T,
        "t_b2": g("time_embed.time_mlp.2.bias"),
        "ada_w": stk("transformer_blocks.{}.attn_norm.linear.weight"),
        "ada_b": stk(
            "transformer_blocks.{}.attn_norm.linear.bias", T=False
        ),
        "qkv_w": jnp.stack([q[0] for q in qkvs]),
        "qkv_b": jnp.stack([q[1] for q in qkvs]),
        "out_w": stk("transformer_blocks.{}.attn.to_out.0.weight"),
        "out_b": stk("transformer_blocks.{}.attn.to_out.0.bias", T=False),
        "ff_w1": stk("transformer_blocks.{}.ff.ff.0.weight"),
        "ff_b1": stk("transformer_blocks.{}.ff.ff.0.bias", T=False),
        "ff_w2": stk("transformer_blocks.{}.ff.ff.3.weight"),
        "ff_b2": stk("transformer_blocks.{}.ff.ff.3.bias", T=False),
        "final_w": g("norm_out.linear.weight").T,
        "final_b": g("norm_out.linear.bias"),
        "proj_w": g("proj_out.weight").T,
        "proj_b": g("proj_out.bias"),
    }


def _layer_norm(x):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


def _time_embed(cfg: DiTConfig, p, t: jax.Array) -> jax.Array:
    """SinusPositionEmbedding (sin first, then cos; scale=1000) -> MLP."""
    half = 128
    emb = math.log(10000) / (half - 1)
    freqs = jnp.exp(-emb * jnp.arange(half, dtype=jnp.float32))
    args = 1000.0 * t[:, None] * freqs[None]
    h = jnp.concatenate([jnp.sin(args), jnp.cos(args)], -1)
    h = jax.nn.silu(h @ p["t_w1"] + p["t_b1"])
    return h @ p["t_w2"] + p["t_b2"]


def _rotate_interleaved(x):
    a = x[..., 0::2]
    b = x[..., 1::2]
    return jnp.stack([-b, a], axis=-1).reshape(x.shape)


def _rope_tables(cfg: DiTConfig, t: int):
    inv = 1.0 / (
        cfg.rope_theta
        ** (jnp.arange(0, cfg.head_dim, 2, dtype=jnp.float32)
            / cfg.head_dim)
    )
    freqs = jnp.arange(t, dtype=jnp.float32)[:, None] * inv[None]
    # duplicate each frequency into the interleaved pair slots
    freqs = jnp.stack([freqs, freqs], -1).reshape(t, cfg.head_dim)
    return jnp.cos(freqs), jnp.sin(freqs)


def forward(
    cfg: DiTConfig,
    p: dict,
    x: jax.Array,           # [B, T, mel] noisy mel
    spk_code: jax.Array,    # [B, enc_dim] ECAPA output (precomputed)
    code_embed: jax.Array,  # [B, T, emb_dim] repeated codec embeddings
    spk_emb: jax.Array,     # [B, T, enc_emb_dim] x-vector (repeated)
    t: jax.Array,           # [B] flow time
) -> jax.Array:
    """One velocity evaluation; conditioning drops (CFG) are expressed
    by zeroing the corresponding inputs before the call."""
    b, T, _ = x.shape
    d = cfg.hidden_size
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    temb = _time_embed(cfg, p, t)
    cond = jnp.broadcast_to(spk_code[:, None], (b, T, spk_code.shape[-1]))
    h = (
        jnp.concatenate([x, cond, code_embed, spk_emb], -1) @ p["in_w"]
        + p["in_b"]
    )

    cos, sin = _rope_tables(cfg, T)
    blocks = jnp.arange(T) // cfg.block_size
    diff = blocks[None, :] - blocks[:, None]  # [T, T] block_j - block_i
    silu_t = jax.nn.silu(temb)

    for li in range(cfg.num_hidden_layers):
        ada = silu_t @ p["ada_w"][li] + p["ada_b"][li]
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(ada, 6, -1)
        norm = _layer_norm(h) * (1 + sc_msa[:, None]) + sh_msa[:, None]

        qkv = norm @ p["qkv_w"][li] + p["qkv_b"][li]
        q, k, v = jnp.split(qkv, 3, -1)
        q = q.reshape(b, T, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, T, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, T, nh, hd).transpose(0, 2, 1, 3)
        # RoPE on head 0 only (reference DiTAttention.forward:578)
        q0 = q[:, 0] * cos[None] + _rotate_interleaved(q[:, 0]) * sin[None]
        k0 = k[:, 0] * cos[None] + _rotate_interleaved(k[:, 0]) * sin[None]
        q = q.at[:, 0].set(q0)
        k = k.at[:, 0].set(k0)

        la = 1.0 if li in cfg.look_ahead_layers else 0.0
        lb = 1.0 if li in cfg.look_backward_layers else 0.0
        ok = (diff >= -lb) & (diff <= la)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd**-0.5)
        scores = jnp.where(
            ok[None, None], scores, jnp.finfo(jnp.float32).min
        )
        att = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(
            h.dtype
        )
        o = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, T, nh * hd)
        h = h + g_msa[:, None] * (o @ p["out_w"][li] + p["out_b"][li])

        norm = _layer_norm(h) * (1 + sc_mlp[:, None]) + sh_mlp[:, None]
        ff = jax.nn.gelu(
            norm @ p["ff_w1"][li] + p["ff_b1"][li], approximate=True
        )
        h = h + g_mlp[:, None] * (ff @ p["ff_w2"][li] + p["ff_b2"][li])

    ada = jax.nn.silu(temb) @ p["final_w"] + p["final_b"]
    scale, shift = jnp.split(ada, 2, -1)
    h = _layer_norm(h) * (1 + scale)[:, None] + shift[:, None]
    return h @ p["proj_w"] + p["proj_b"]


def sample(
    cfg: DiTConfig,
    p: dict,
    codes: jax.Array,     # [1, T_code] codec tokens
    spk_emb: jax.Array,   # [1, enc_emb_dim] x-vector
    ref_mel: jax.Array,   # [1, T_ref, mel] reference mel
    y0: jax.Array,        # [1, T_mel, mel] initial noise
    num_steps: int = 10,
    guidance_scale: float = 0.5,
    sway_coefficient: float = -1.0,
    solver: str = "rk4",
) -> jax.Array:
    """Block-wise flow sample -> mel [1, T_mel, mel_dim] (reference
    fast_block_sample + RungeKutta4ODESolver; the Qwen3-TTS 25 Hz
    tokenizer reuses this DiT with a plain Euler ODE —
    solver="euler", reference tokenizer_25hz/
    modeling_qwen3_tts_tokenizer_v1.py:1219-1229)."""
    T = y0.shape[1]
    code_embed = jnp.repeat(
        p["codec_embed"][jnp.clip(codes, 0, cfg.num_embeds)],
        cfg.repeats, axis=1,
    )
    # drop_code zeroes the token ids, i.e. every frame embeds id 0
    code_uncond = jnp.broadcast_to(
        p["codec_embed"][0][None, None, :], code_embed.shape
    )
    spk_rep = jnp.broadcast_to(
        spk_emb[:, None], (1, T, spk_emb.shape[-1])
    )
    spk_code = spk_encode(cfg, p["spk"], ref_mel)

    def velocity(t_scalar, y):
        x2 = jnp.concatenate([y, y], 0)
        sc2 = jnp.concatenate([spk_code, jnp.zeros_like(spk_code)], 0)
        ce2 = jnp.concatenate([code_embed, code_uncond], 0)
        se2 = jnp.concatenate([spk_rep, jnp.zeros_like(spk_rep)], 0)
        t2 = jnp.full((2,), t_scalar, jnp.float32)
        out = forward(cfg, p, x2, sc2, ce2, se2, t2)
        return out[:1] + (out[:1] - out[1:]) * guidance_scale

    ts = jnp.linspace(0.0, 1.0, num_steps)
    if sway_coefficient is not None:
        ts = ts + sway_coefficient * (
            jnp.cos(jnp.pi / 2 * ts) - 1 + ts
        )

    def rk38(y, i):
        t0, t1 = ts[i], ts[i + 1]
        dt = t1 - t0
        k1 = velocity(t0, y)
        k2 = velocity(t0 + dt / 3, y + dt * k1 / 3)
        k3 = velocity(t0 + 2 * dt / 3, y + dt * (k2 - k1 / 3))
        k4 = velocity(t1, y + dt * (k1 - k2 + k3))
        return y + (k1 + 3 * (k2 + k3) + k4) * dt / 8, None

    def euler(y, i):
        t0, t1 = ts[i], ts[i + 1]
        return y + (t1 - t0) * velocity(t0, y), None

    step = rk38 if solver == "rk4" else euler
    y, _ = jax.lax.scan(step, y0, jnp.arange(num_steps - 1))
    return y
