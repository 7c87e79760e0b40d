"""Fish-Speech Fast AR (residual-codebook predictor) in jax.

Counterpart of the reference FishSpeechFastAR (reference
vllm_omni/model_executor/models/fish_speech/fish_speech_fast_ar.py:259):
a small llama-style transformer that, per slow-AR step, expands the
remaining ``num_codebooks - 1`` residual codes autoregressively over the
tiny sequence [proj(slow_hidden), emb(code0), emb(c1), ...] with a
single shared embedding table and a single lm_head (unlike the
Qwen3-Omni MTP's per-group tables).  Fish-Speech trains with
interleaved (GPT-J) RoPE and no q/k norm; residual codebooks have
``residual_codebook_size`` entries, so logits for steps >= 1 truncate.

TPU shaping: one jitted lax.scan over codebooks; attention recomputes
over a static [N, C+1, H] buffer with a length mask instead of a KV
cache (same rationale as qwen3_omni/code_predictor.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.models.fish_speech.config import FishSpeechFastConfig


def init_params(cfg: FishSpeechFastConfig, key: jax.Array) -> dict:
    dt = jnp.dtype(cfg.dtype)
    L, h = cfg.num_hidden_layers, cfg.hidden_size
    nq, nk, hd = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
    )
    im = cfg.intermediate_size
    keys = iter(jax.random.split(key, 16))

    def w(shape, scale=0.02):
        return (
            jax.random.normal(next(keys), shape, jnp.float32) * scale
        ).astype(dt)

    return {
        "embed": w((cfg.vocab_size, h)),
        "head": w((h, cfg.vocab_size)),
        "fast_norm": jnp.ones((h,), dt),
        "norm_f": jnp.ones((h,), dt),
        "wq": w((L, h, nq * hd)),
        "wk": w((L, h, nk * hd)),
        "wv": w((L, h, nk * hd)),
        "wo": w((L, nq * hd, h)),
        "ln1": jnp.ones((L, h), dt),
        "ln2": jnp.ones((L, h), dt),
        "gate": w((L, h, im)),
        "up": w((L, h, im)),
        "down": w((L, im, h)),
    }


def load_hf_state(cfg: FishSpeechFastConfig, state: dict) -> dict:
    """HF-layout fast_ar.* state dict (llama-style names after the
    reference's weight remap, fish_speech_slow_ar.py:150-160) -> pytree."""
    dt = jnp.dtype(cfg.dtype)
    L = cfg.num_hidden_layers

    def g(k):
        t = np.asarray(state[k], np.float32)
        return t

    def gs(fmt, transpose=True):
        return jnp.asarray(
            np.stack(
                [
                    g(fmt.format(i=i)).T if transpose else g(fmt.format(i=i))
                    for i in range(L)
                ]
            ),
            dt,
        )

    pre = "fast_ar.model.layers.{i}."
    p = {
        "embed": jnp.asarray(g("fast_ar.fast_embeddings.weight"), dt),
        "head": jnp.asarray(g("fast_ar.fast_output.weight").T, dt),
        "fast_norm": jnp.asarray(g("fast_ar.fast_norm.weight"), dt),
        "norm_f": jnp.asarray(g("fast_ar.model.norm.weight"), dt),
        "wq": gs(pre + "self_attn.q_proj.weight"),
        "wk": gs(pre + "self_attn.k_proj.weight"),
        "wv": gs(pre + "self_attn.v_proj.weight"),
        "wo": gs(pre + "self_attn.o_proj.weight"),
        "ln1": gs(pre + "input_layernorm.weight", transpose=False),
        "ln2": gs(pre + "post_attention_layernorm.weight", transpose=False),
        "gate": gs(pre + "mlp.gate_proj.weight"),
        "up": gs(pre + "mlp.up_proj.weight"),
        "down": gs(pre + "mlp.down_proj.weight"),
    }
    if "fast_ar.fast_project_in.weight" in state:
        p["proj_in_w"] = jnp.asarray(
            g("fast_ar.fast_project_in.weight").T, dt
        )
        p["proj_in_b"] = jnp.asarray(g("fast_ar.fast_project_in.bias"), dt)
    return p


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return w * (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _rope_gptj(x, cos, sin):
    # x [N, G, heads, hd]; cos/sin [G, 1, hd//2]
    x_even = x[..., 0::2]
    x_odd = x[..., 1::2]
    out_even = x_even * cos - x_odd * sin
    out_odd = x_odd * cos + x_even * sin
    return jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)


def _trunk(cfg: FishSpeechFastConfig, params: dict, seq, length):
    """seq [N, G, H] -> normed hidden [N, G, H]; causal + < length."""
    n, g, _ = seq.shape
    nq, nk, hd = (
        cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim,
    )
    group = nq // nk
    pos = jnp.arange(g)
    inv = 1.0 / (
        cfg.rope_theta ** (np.arange(0, hd, 2, np.float32) / hd)
    )
    f = pos[:, None].astype(jnp.float32) * inv[None]
    cos, sin = jnp.cos(f)[:, None, :], jnp.sin(f)[:, None, :]
    valid = pos < length
    mask = (pos[None, :] <= pos[:, None]) & valid[None, :]

    def layer(h, lp):
        x = _rms(h, lp["ln1"], cfg.rms_norm_eps)
        q = jnp.dot(x, lp["wq"]).reshape(n, g, nq, hd).astype(jnp.float32)
        k = jnp.dot(x, lp["wk"]).reshape(n, g, nk, hd).astype(jnp.float32)
        v = jnp.dot(x, lp["wv"]).reshape(n, g, nk, hd).astype(jnp.float32)
        q = _rope_gptj(q, cos, sin)
        k = _rope_gptj(k, cos, sin)
        k = jnp.repeat(k, group, axis=2)
        v = jnp.repeat(v, group, axis=2)
        s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * hd**-0.5
        s = jnp.where(mask[None, None], s, -1e30)
        pa = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("nhqk,nkhd->nqhd", pa, v).reshape(n, g, -1)
        h = h + jnp.dot(o.astype(h.dtype), lp["wo"])
        x = _rms(h, lp["ln2"], cfg.rms_norm_eps)
        act = jax.nn.silu(
            jnp.dot(x, lp["gate"], preferred_element_type=jnp.float32)
        ) * jnp.dot(x, lp["up"], preferred_element_type=jnp.float32)
        h = h + jnp.dot(act.astype(x.dtype), lp["down"])
        return h, None

    keys = ("ln1", "wq", "wk", "wv", "wo", "ln2", "gate", "up", "down")
    h, _ = jax.lax.scan(layer, seq, {k: params[k] for k in keys})
    return _rms(h, params["norm_f"], cfg.rms_norm_eps)


def predict_codes(
    cfg: FishSpeechFastConfig,
    params: dict,
    slow_hidden: jax.Array,  # [N, H_slow]
    semantic_code: jax.Array,  # [N] code-0 (already offset to codebook ix)
    residual_codebook_size: int = 1024,
) -> jax.Array:
    """Greedy residual expansion; returns codes [N, num_codebooks]
    (row 0 = the semantic code)."""
    n = slow_hidden.shape[0]
    c = cfg.num_codebooks
    dt = params["embed"].dtype
    rsz = min(residual_codebook_size, cfg.vocab_size)

    h0 = slow_hidden.astype(dt)
    if "proj_in_w" in params:
        h0 = jnp.dot(h0, params["proj_in_w"]) + params["proj_in_b"]
    seq0 = jnp.zeros((n, c + 1, cfg.hidden_size), dt)
    seq0 = seq0.at[:, 0].set(h0)
    code0 = jnp.clip(semantic_code.astype(jnp.int32), 0,
                     cfg.vocab_size - 1)
    seq0 = seq0.at[:, 1].set(jnp.take(params["embed"], code0, axis=0))

    codes0 = jnp.zeros((n, c), jnp.int32).at[:, 0].set(code0)

    def step(carry, s):
        seq, codes = carry
        out = _trunk(cfg, params, seq, 2 + s)
        last = jnp.take_along_axis(
            out, (s + 1)[None, None, None].repeat(n, 0), axis=1
        )[:, 0]
        logits = jnp.dot(
            _rms(last, params["fast_norm"], cfg.rms_norm_eps),
            params["head"], preferred_element_type=jnp.float32,
        )[:, :rsz]
        code = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        codes = codes.at[:, s + 1].set(code)
        emb = jnp.take(params["embed"], code, axis=0)
        write_pos = jnp.minimum(s + 2, c)
        seq = jax.lax.cond(
            s + 2 <= c,
            lambda sq: jax.vmap(
                lambda row, e: row.at[write_pos].set(e)
            )(sq, emb),
            lambda sq: sq,
            seq,
        )
        return (seq, codes), None

    (seq, codes), _ = jax.lax.scan(
        step, (seq0, codes0), jnp.arange(c - 1, dtype=jnp.int32)
    )
    return codes


class FastARRuntime:
    """Engine-facing wrapper: jitted, batch-bucketed expansion (the
    reference wraps the same loop in torch.compile, fast_ar.py:328)."""

    def __init__(self, cfg: FishSpeechFastConfig, params: dict) -> None:
        self.cfg = cfg
        self.params = params
        self._fns: dict[int, object] = {}

    def expand(
        self, slow_hidden: np.ndarray, semantic_code: np.ndarray
    ) -> np.ndarray:
        n = len(semantic_code)
        if n == 0:
            return np.zeros((0, self.cfg.num_codebooks), np.int32)
        bucket = 1
        while bucket < n:
            bucket *= 2
        fn = self._fns.get(bucket)
        if fn is None:
            fn = jax.jit(
                lambda p, h, c: predict_codes(self.cfg, p, h, c)
            )
            self._fns[bucket] = fn
        h_pad = np.zeros((bucket, slow_hidden.shape[1]), np.float32)
        h_pad[:n] = slow_hidden
        c_pad = np.zeros((bucket,), np.int32)
        c_pad[:n] = np.asarray(semantic_code, np.int32)
        return np.asarray(fn(self.params, h_pad, c_pad))[:n]
