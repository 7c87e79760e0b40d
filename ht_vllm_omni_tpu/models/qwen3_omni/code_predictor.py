"""Qwen3-Omni talker code predictor (MTP residual-codebook head) in jax.

Architecture (reference vllm_omni/model_executor/models/qwen3_omni/
qwen3_omni_moe_code_predictor_mtp.py; numerics pinned to transformers'
Qwen3OmniMoeTalkerCodePredictorModelForConditionalGeneration):

For each talker step the talker trunk emits a hidden state + the group-0
codec token; this small dense Qwen3-style transformer then expands the
remaining ``num_code_groups - 1`` residual codebook codes
autoregressively over a tiny sequence [hidden, emb0(code0), emb1(c1), ..]
with a per-group embedding table and a per-group lm_head.

TPU shaping: the whole group loop runs inside ONE jitted lax.scan — the
sequence is short and fixed (num_code_groups positions), so each step
recomputes attention over a static [N, G, H] buffer with a length mask
instead of keeping a KV cache; this is the CUDA-graph-wrapper
equivalent the reference uses for the same latency reason
(cuda_graph_decoder_wrapper.py).  Batched over N talker steps.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CodePredictorConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 5
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 3072
    vocab_size: int = 2048
    num_code_groups: int = 32
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    dtype: str = "float32"


def init_params(cfg: CodePredictorConfig, key: jax.Array) -> dict:
    dt = jnp.dtype(cfg.dtype)
    h, ff, nl = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    nq, nk, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    g1 = cfg.num_code_groups - 1
    ks = iter(jax.random.split(key, 16))

    def w(shape, scale=0.02):
        return (
            jax.random.normal(next(ks), shape, jnp.float32) * scale
        ).astype(dt)

    return {
        "embeds": w((g1, cfg.vocab_size, h)),  # codec_embedding[i]
        "heads": w((g1, h, cfg.vocab_size)),  # lm_head[i]
        "ln1": jnp.ones((nl, h), dt),
        "wq": w((nl, h, nq * hd)),
        "wk": w((nl, h, nk * hd)),
        "wv": w((nl, h, nk * hd)),
        "wo": w((nl, nq * hd, h)),
        "q_norm": jnp.ones((nl, hd), dt),
        "k_norm": jnp.ones((nl, hd), dt),
        "ln2": jnp.ones((nl, h), dt),
        "gate": w((nl, h, ff)),
        "up": w((nl, h, ff)),
        "down": w((nl, ff, h)),
        "norm_f": jnp.ones((h,), dt),
    }


def load_hf_state(cfg: CodePredictorConfig, state: dict) -> dict:
    """Map a transformers ...CodePredictorModelForConditionalGeneration
    state_dict to params."""
    dt = jnp.dtype(cfg.dtype)

    def gs(fmt, n, transpose=False):
        return jnp.asarray(
            np.stack([
                np.asarray(state[fmt.format(i)].float()).T if transpose
                else np.asarray(state[fmt.format(i)].float())
                for i in range(n)
            ]), dt
        )

    nl = cfg.num_hidden_layers
    g1 = cfg.num_code_groups - 1
    t = "model.layers.{}."
    return {
        "embeds": gs("model.codec_embedding.{}.weight", g1),
        "heads": gs("lm_head.{}.weight", g1, transpose=True),
        "ln1": gs(t + "input_layernorm.weight", nl),
        "wq": gs(t + "self_attn.q_proj.weight", nl, True),
        "wk": gs(t + "self_attn.k_proj.weight", nl, True),
        "wv": gs(t + "self_attn.v_proj.weight", nl, True),
        "wo": gs(t + "self_attn.o_proj.weight", nl, True),
        "q_norm": gs(t + "self_attn.q_norm.weight", nl),
        "k_norm": gs(t + "self_attn.k_norm.weight", nl),
        "ln2": gs(t + "post_attention_layernorm.weight", nl),
        "gate": gs(t + "mlp.gate_proj.weight", nl, True),
        "up": gs(t + "mlp.up_proj.weight", nl, True),
        "down": gs(t + "mlp.down_proj.weight", nl, True),
        "norm_f": jnp.asarray(
            np.asarray(state["model.norm.weight"].float()), dt
        ),
    }


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return w * (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _trunk(cfg: CodePredictorConfig, params: dict, seq, length):
    """seq [N, G, H], attention causal + masked to < length; returns the
    normed hidden at every position."""
    n, g, _ = seq.shape
    nq, nk, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    group = nq // nk
    pos = jnp.arange(g)
    inv = 1.0 / (
        cfg.rope_theta ** (np.arange(0, hd, 2, np.float32) / hd)
    )
    f = pos[:, None].astype(jnp.float32) * inv[None]
    emb = jnp.concatenate([f, f], axis=-1)
    cos, sin = jnp.cos(emb)[:, None, :], jnp.sin(emb)[:, None, :]
    valid = pos < length
    mask = (pos[None, :] <= pos[:, None]) & valid[None, :]

    def layer(h, lp):
        x = _rms(h, lp["ln1"], cfg.rms_norm_eps)
        q = jnp.einsum("ngh,hd->ngd", x, lp["wq"]).reshape(n, g, nq, hd)
        k = jnp.einsum("ngh,hd->ngd", x, lp["wk"]).reshape(n, g, nk, hd)
        v = jnp.einsum("ngh,hd->ngd", x, lp["wv"]).reshape(n, g, nk, hd)
        q = _rms(q, lp["q_norm"], cfg.rms_norm_eps).astype(jnp.float32)
        k = _rms(k, lp["k_norm"], cfg.rms_norm_eps).astype(jnp.float32)
        q = q * cos + _rotate_half(q) * sin
        k = k * cos + _rotate_half(k) * sin
        k = jnp.repeat(k, group, axis=2)
        v = jnp.repeat(v.astype(jnp.float32), group, axis=2)
        s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * hd**-0.5
        s = jnp.where(mask[None, None], s, -1e30)
        pa = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("nhqk,nkhd->nqhd", pa, v).reshape(n, g, -1)
        h = h + jnp.dot(o.astype(h.dtype), lp["wo"])
        x = _rms(h, lp["ln2"], cfg.rms_norm_eps)
        act = jax.nn.silu(jnp.dot(x, lp["gate"])) * jnp.dot(x, lp["up"])
        h = h + jnp.dot(act.astype(x.dtype), lp["down"])
        return h, None

    keys = ("ln1", "wq", "wk", "wv", "wo", "q_norm", "k_norm",
            "ln2", "gate", "up", "down")
    h, _ = jax.lax.scan(layer, seq, {k: params[k] for k in keys})
    return _rms(h, params["norm_f"], cfg.rms_norm_eps)


def predict_residuals(
    cfg: CodePredictorConfig,
    params: dict,
    hidden: jax.Array,  # [N, H] talker hidden per step
    code0_embed: jax.Array,  # [N, H] talker's embedding of the group-0 code
    code0: jax.Array,  # [N] group-0 codec token per step
) -> jax.Array:
    """Greedy-expand residual groups; returns codes [N, num_code_groups]
    including group 0.  One compiled scan over groups.

    The group-0 token is embedded by the TALKER's codec table, not this
    module's (HF prepare_inputs_for_generation concatenates
    [talker hidden, talker embed(code0)] as the prefill); group-(s+1)
    codes are predicted by heads[s] and fed back via embeds[s]."""
    n, h = hidden.shape
    g = cfg.num_code_groups
    dt = params["embeds"].dtype
    seq0 = jnp.zeros((n, g, h), dt)
    seq0 = seq0.at[:, 0].set(hidden.astype(dt))
    seq0 = seq0.at[:, 1].set(code0_embed.astype(dt))

    def step(carry, s):
        seq, codes = carry
        # positions filled: 2 + s; predict group s+1 with heads[s]
        out = _trunk(cfg, params, seq, 2 + s)
        last = jnp.take_along_axis(
            out, (s + 1)[None, None, None].repeat(n, 0), axis=1
        )[:, 0]
        head = params["heads"][s]
        logits = jnp.dot(
            last, head, preferred_element_type=jnp.float32
        )
        code = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        codes = codes.at[:, s + 1].set(code)
        # feed group-(s+1)'s code back through embeds[s]; the final
        # group's code is never fed back
        emb = jnp.take(params["embeds"][jnp.minimum(s, g - 2)], code, axis=0)
        write_pos = jnp.minimum(s + 2, g - 1)
        seq = jax.lax.cond(
            s + 2 < g,
            lambda sq: jax.vmap(
                lambda row, e: row.at[write_pos].set(e)
            )(sq, emb),
            lambda sq: sq,
            seq,
        )
        return (seq, codes), None

    codes0 = jnp.zeros((n, g), jnp.int32).at[:, 0].set(
        code0.astype(jnp.int32)
    )
    (seq, codes), _ = jax.lax.scan(
        step, (seq0, codes0), jnp.arange(g - 1, dtype=jnp.int32)
    )
    return codes


class CodePredictorRuntime:
    """Engine-facing wrapper: jitted, batch-bucketed residual expansion.

    Holds the predictor params plus the TALKER's codec embedding table
    (group-0 codes are embedded by the talker, see predict_residuals).
    Batch sizes are bucketed to powers of two so chunked TTS streams hit
    a handful of compiled shapes.
    """

    def __init__(self, cfg: CodePredictorConfig, params: dict,
                 talker_embed) -> None:
        self.cfg = cfg
        self.params = params
        self.talker_embed = jnp.asarray(talker_embed)
        self._fns: dict[int, object] = {}

    def expand(self, hidden: np.ndarray, code0: np.ndarray) -> np.ndarray:
        """hidden [n, H], code0 [n] -> codes [n, num_code_groups]."""
        n = len(code0)
        if n == 0:
            return np.zeros((0, self.cfg.num_code_groups), np.int32)
        bucket = 1
        while bucket < n:
            bucket *= 2
        fn = self._fns.get(bucket)
        if fn is None:
            def run(params, table, h, c0):
                emb = jnp.take(table, jnp.clip(c0, 0, table.shape[0] - 1),
                               axis=0)
                return predict_residuals(self.cfg, params, h, emb, c0)

            fn = jax.jit(run)
            self._fns[bucket] = fn
        h_pad = np.zeros((bucket, hidden.shape[1]), np.float32)
        h_pad[:n] = hidden[:, : hidden.shape[1]]
        c_pad = np.zeros((bucket,), np.int32)
        c_pad[:n] = np.asarray(code0, np.int32)
        codes = fn(self.params, self.talker_embed, h_pad, c_pad)
        return np.asarray(codes)[:n]
