"""Qwen2/2.5/3 dense decoder in pure jax over stacked-layer pytrees.

Covers the AR text stages of the reference's Qwen families (thinker /
talker trunks; reference vllm_omni/model_executor/models/registry.py):
Qwen2 (attention bias), Qwen3 (q/k RMSNorm, no bias) via ModelArchConfig
flags.  All layers are stacked on a leading axis and executed with
``lax.scan`` so compile time stays flat in depth; the paged KV cache is
scanned alongside as per-layer xs/ys.

Weight layout is [in, out] (x @ w), transposed from HF's [out, in] at load
time (models/loader.py).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.models.layers import (
    apply_rope,
    apply_rope_gptj,
    rms_norm,
    rope_cos_sin,
)
from ht_vllm_omni_tpu.ops.flash_attention import flash_attention
from ht_vllm_omni_tpu.ops.paged_attention import (
    paged_attention_fresh,
    paged_decode_attention,
)


def _dtype(cfg: ModelArchConfig):
    return jnp.dtype(cfg.dtype)


def init_params(cfg: ModelArchConfig, key: jax.Array) -> dict:
    """Random init (benchmarks/tests run without checkpoints on this host)."""
    dt = _dtype(cfg)
    h, d = cfg.hidden_size, cfg.head_dim
    nq, nkv, nl = cfg.num_attention_heads, cfg.num_key_value_heads, (
        cfg.num_hidden_layers
    )
    inter = cfg.intermediate_size
    keys = iter(jax.random.split(key, 16))

    def w(k, shape, scale=None):
        scale = scale or (1.0 / (shape[-2] ** 0.5 if len(shape) > 1 else 1.0))
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    params = {
        "embed": w(next(keys), (cfg.vocab_size, h), 0.02),
        "ln1": jnp.ones((nl, h), dt),
        "ln2": jnp.ones((nl, h), dt),
        "wq": w(next(keys), (nl, h, nq * d)),
        "wk": w(next(keys), (nl, h, nkv * d)),
        "wv": w(next(keys), (nl, h, nkv * d)),
        "wo": w(next(keys), (nl, nq * d, h)),
        "gate": w(next(keys), (nl, h, inter)),
        "up": w(next(keys), (nl, h, inter)),
        "down": w(next(keys), (nl, inter, h)),
        "norm_f": jnp.ones((h,), dt),
    }
    if cfg.attention_bias:
        params["bq"] = jnp.zeros((nl, nq * d), dt)
        params["bk"] = jnp.zeros((nl, nkv * d), dt)
        params["bv"] = jnp.zeros((nl, nkv * d), dt)
    if cfg.qk_norm:
        params["q_norm"] = jnp.ones((nl, d), dt)
        params["k_norm"] = jnp.ones((nl, d), dt)
    if cfg.use_post_norms:
        params["post_ln1"] = jnp.ones((nl, h), dt)
        params["post_ln2"] = jnp.ones((nl, h), dt)
    if cfg.use_gen_mlp:
        # MammothModa2 dual-expert FFN: index 0 = understanding (text),
        # index 1 = generation (image tokens), routed by token id
        # (reference mammoth_moda2.py:75 moe_forward + Mammoth2DecoderLayer
        # :201 gen_mlp)
        params["dgate"] = w(next(keys), (nl, 2, h, inter))
        params["dup"] = w(next(keys), (nl, 2, h, inter))
        params["ddown"] = w(next(keys), (nl, 2, inter, h))
        params.pop("gate"), params.pop("up"), params.pop("down")
    if cfg.num_experts > 0:
        e, im = cfg.num_experts, cfg.moe_intermediate_size
        params["router"] = w(next(keys), (nl, h, e), 0.02)
        params["egate"] = w(next(keys), (nl, e, h, im))
        params["eup"] = w(next(keys), (nl, e, h, im))
        params["edown"] = w(next(keys), (nl, e, im, h))
        params.pop("gate"), params.pop("up"), params.pop("down")
        if cfg.shared_expert_intermediate_size > 0:
            ims = cfg.shared_expert_intermediate_size
            params["sgate"] = w(next(keys), (nl, h, ims))
            params["sup"] = w(next(keys), (nl, h, ims))
            params["sdown"] = w(next(keys), (nl, ims, h))
            params["shared_gate"] = w(next(keys), (nl, h, 1), 0.02)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w(next(keys), (h, cfg.vocab_size), 0.02)
    return params


_LAYER_KEYS = (
    "ln1", "ln2", "post_ln1", "post_ln2",
    "wq", "wk", "wv", "wo", "gate", "up", "down",
    "wqkv", "bqkv", "wgu",
    "bq", "bk", "bv", "q_norm", "k_norm",
    "router", "egate", "eup", "edown",
    "sgate", "sup", "sdown", "shared_gate",
    "dgate", "dup", "ddown",
)


def fuse_params(params: dict) -> dict:
    """Fuse per-projection weights into wider GEMMs: wq|wk|wv -> wqkv and
    gate|up -> wgu (the reference's QKVParallelLinear /
    MergedColumnParallelLinear packing done once at load).  Decode GEMMs
    at tiny row counts are dispatch-latency-bound; 6 dots/layer -> 4.

    Only valid BEFORE quantization/LoRA attach: already-suffixed params
    address projections by name, so fusion is skipped when any ``:``
    suffix key is present (quantize the fused leaves instead — the
    runner fuses first, then quantizes)."""
    if any(":" in k for k in params):
        return params
    if "wq" not in params:
        return params
    p = dict(params)
    p["wqkv"] = jnp.concatenate(
        [p.pop("wq"), p.pop("wk"), p.pop("wv")], axis=-1
    )
    if "bq" in p:
        p["bqkv"] = jnp.concatenate(
            [p.pop("bq"), p.pop("bk"), p.pop("bv")], axis=-1
        )
    if "gate" in p and "up" in p:
        p["wgu"] = jnp.concatenate([p.pop("gate"), p.pop("up")], axis=-1)
    return p


class _StackedQuant:
    """Quantized leaf handed to a scan layer body STACKED (full
    [L, ...]) with the layer index: the Pallas group-scale matmuls read
    their layer's blocks straight from HBM via a scalar-prefetched
    index (ops/quant_matmul.matmul_int4_stacked).  Slicing these leaves
    through scan xs instead makes XLA materialize a per-step copy of
    every layer's packed weights — custom-call operands cannot alias a
    slice (measured ~0.3 ms/step on a 0.5B int4 model)."""

    __slots__ = ("arr", "layer")

    def __init__(self, arr, layer):
        self.arr = arr
        self.layer = layer


# pallas-matmul leaves that should bypass scan slicing (int8/fp8 use
# XLA dots whose operand convert fuses — slices are free there)
_STACKED_Q_SUFFIXES = (":q4", ":s4", ":q4z", ":s4z", ":z4")


def split_stacked_quant(layer_leaves: dict) -> tuple[dict, dict]:
    """Partition scan xs leaves into (sliced, stacked-quant)."""
    stacked = {
        k: layer_leaves.pop(k)
        for k in [
            k
            for k in layer_leaves
            if k.endswith(_STACKED_Q_SUFFIXES)
        ]
    }
    return layer_leaves, stacked


def _layer_params(params: dict) -> dict:
    """The per-layer (stacked) subset of params, used as scan xs
    (including quantized name:q8/:q4/:s* and LoRA name:lora_a/b)."""
    out = {}
    for k, v in params.items():
        base = k.split(":", 1)[0]
        if base in _LAYER_KEYS:
            out[k] = v
    if "lora_scale" in params:
        # broadcast the scalar so scan can slice it per layer
        nl = out["ln1"].shape[0]
        out["lora_scale"] = jnp.broadcast_to(
            params["lora_scale"], (nl,)
        )
    return out



# FSDP (HSDP-equivalent) weight sharding: per-layer gather dims for the
# dp-sharded hidden-size axis of each stacked weight (parallel/mesh.py
# param_pspecs(fsdp=True)).  Gathered just-in-time at layer entry so at
# most one layer's full weights are live; XLA's latency-hiding scheduler
# overlaps the gather of layer l+1 with layer l's compute.
_FSDP_GATHER_DIM = {
    "wq": 0, "wk": 0, "wv": 0, "gate": 0, "up": 0, "sgate": 0, "sup": 0,
    "wo": 1, "down": 1, "sdown": 1,
    "egate": 1, "eup": 1, "edown": 2,
    "dgate": 1, "dup": 1, "ddown": 2,
    # int8/fp8 leaves gather like their bf16 twins (per-channel scales
    # stay replicated); packed int4/AWQ never combine with fsdp
    "wq:q8": 0, "wk:q8": 0, "wv:q8": 0, "gate:q8": 0, "up:q8": 0,
    "wo:q8": 1, "down:q8": 1,
    "wq:f8": 0, "wk:f8": 0, "wv:f8": 0, "gate:f8": 0, "up:f8": 0,
    "wo:f8": 1, "down:f8": 1,
}


def _gather_fsdp(lp: dict, axis: str | None) -> dict:
    if axis is None:
        return lp
    return {
        k: (
            jax.lax.all_gather(
                v, axis, axis=_FSDP_GATHER_DIM[k], tiled=True
            )
            if k in _FSDP_GATHER_DIM
            else v
        )
        for k, v in lp.items()
    }


def _linear(lp: dict, name: str, x: jax.Array) -> jax.Array:
    """x [T, K] @ weight ``name`` -> [T, N] f32, honouring weight-only
    quantization (quantization/weight_quant.py) and LoRA adapters
    (lora/manager.py: base + x @ A @ B * scale)."""
    y = _linear_base(lp, name, x)
    if name + ":lora_a" in lp:
        a = lp[name + ":lora_a"]
        b = lp[name + ":lora_b"]
        xa = jnp.dot(
            x.astype(jnp.float32), a.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        y = y + jnp.dot(
            xa, b.astype(jnp.float32), preferred_element_type=jnp.float32
        ) * lp["lora_scale"]
    return y


def _linear_base(lp: dict, name: str, x: jax.Array) -> jax.Array:
    if x.ndim > 2 and any(
        name + suf in lp for suf in (":q8", ":q4", ":f8", ":q4z")
    ):
        # quantized Pallas matmuls are 2-D; flatten batched prefill's
        # [B, S, H] rows and restore
        lead = x.shape[:-1]
        y = _linear_base(lp, name, x.reshape(-1, x.shape[-1]))
        return y.reshape(*lead, y.shape[-1])
    if name + ":q8" in lp:
        from ht_vllm_omni_tpu.ops.quant_matmul import matmul_int8

        return matmul_int8(
            x, lp[name + ":q8"], lp[name + ":s8"], out_dtype=jnp.float32
        )
    if name + ":q4" in lp:
        w = lp[name + ":q4"]
        if isinstance(w, _StackedQuant):
            from ht_vllm_omni_tpu.ops.quant_matmul import (
                matmul_int4_stacked,
            )

            return matmul_int4_stacked(
                x, w.arr, lp[name + ":s4"].arr, w.layer,
                out_dtype=jnp.float32,
            )
        from ht_vllm_omni_tpu.ops.quant_matmul import matmul_int4

        return matmul_int4(
            x, w, lp[name + ":s4"], out_dtype=jnp.float32
        )
    if name + ":f8" in lp:
        from ht_vllm_omni_tpu.ops.quant_matmul import matmul_fp8

        return matmul_fp8(
            x, lp[name + ":f8"], lp[name + ":sf8"], out_dtype=jnp.float32
        )
    if name + ":q4z" in lp:
        w = lp[name + ":q4z"]
        if isinstance(w, _StackedQuant):
            from ht_vllm_omni_tpu.ops.quant_matmul import (
                matmul_int4_zp_stacked,
            )

            return matmul_int4_zp_stacked(
                x, w.arr, lp[name + ":s4z"].arr, lp[name + ":z4"].arr,
                w.layer, out_dtype=jnp.float32,
            )
        from ht_vllm_omni_tpu.ops.quant_matmul import matmul_int4_zp

        return matmul_int4_zp(
            x, w, lp[name + ":s4z"], lp[name + ":z4"],
            out_dtype=jnp.float32,
        )
    return jnp.dot(x, lp[name], preferred_element_type=jnp.float32)


def _has_weight(lp: dict, name: str) -> bool:
    """True when ``name`` exists raw or under any quantized suffix."""
    return name in lp or any(
        name + s in lp for s in (":q8", ":q4", ":f8", ":q4z")
    )


def _maybe_post_norm(cfg, lp, name, delta):
    """GLM-4 sandwich norm: RMSNorm the sub-layer delta before the
    residual add (post_self_attn_layernorm / post_mlp_layernorm)."""
    if getattr(cfg, "use_post_norms", False):
        return rms_norm(delta, lp[name], cfg.rms_norm_eps)
    return delta


def _qkv(
    cfg: ModelArchConfig, lp: dict, x: jax.Array, cos: jax.Array,
    sin: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """x [T, H] -> q [T, QH, D], k/v [T, KVH, D] with norm+rope applied."""
    t = x.shape[0]
    d = cfg.head_dim
    if _has_weight(lp, "wqkv"):
        y = _linear(lp, "wqkv", x)
        if "bqkv" in lp:
            y = y + lp["bqkv"]
        nq = cfg.num_attention_heads * d
        nkv = cfg.num_key_value_heads * d
        q, k, v = (
            y[..., :nq], y[..., nq : nq + nkv], y[..., nq + nkv :]
        )
    else:
        q = _linear(lp, "wq", x)
        k = _linear(lp, "wk", x)
        v = _linear(lp, "wv", x)
        if "bq" in lp:
            q = q + lp["bq"]
            k = k + lp["bk"]
            v = v + lp["bv"]
    q = q.astype(x.dtype).reshape(t, cfg.num_attention_heads, d)
    k = k.astype(x.dtype).reshape(t, cfg.num_key_value_heads, d)
    v = v.astype(x.dtype).reshape(t, cfg.num_key_value_heads, d)
    if "q_norm" in lp:
        q = rms_norm(q, lp["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], cfg.rms_norm_eps)
    rope = (
        apply_rope_gptj if getattr(cfg, "rope_interleaved", False)
        else apply_rope
    )
    rd = cfg.rotary_dim
    if rd < d:
        # partial rotary (GLM-4): rotate the first rd dims, pass the rest
        q = jnp.concatenate(
            [rope(q[..., :rd], cos[:, None, :], sin[:, None, :]),
             q[..., rd:]], axis=-1,
        )
        k = jnp.concatenate(
            [rope(k[..., :rd], cos[:, None, :], sin[:, None, :]),
             k[..., rd:]], axis=-1,
        )
    else:
        q = rope(q, cos[:, None, :], sin[:, None, :])
        k = rope(k, cos[:, None, :], sin[:, None, :])
    return q, k, v


def embed_tokens(params: dict, token_ids: jax.Array) -> jax.Array:
    return jnp.take(params["embed"], token_ids, axis=0)


def compute_logits(
    cfg: ModelArchConfig, params: dict, hidden: jax.Array
) -> jax.Array:
    """hidden [..., H] -> logits [..., V] in fp32."""
    if any(
        "lm_head" + suf in params for suf in (":q8", ":q4", ":f8", ":q4z")
    ):
        # quantized output head (quantization/weight_quant.py — present
        # for tied embeddings too, as a dedicated [H, V] copy)
        return _linear_base(params, "lm_head", hidden)
    if cfg.tie_word_embeddings:
        return jnp.dot(
            hidden, params["embed"].T, preferred_element_type=jnp.float32
        )
    return jnp.dot(
        hidden, params["lm_head"], preferred_element_type=jnp.float32
    )



def _mlp(
    cfg: ModelArchConfig, lp: dict, x: jax.Array,
    ep_axis: str | None = None,
    gen_mask: jax.Array | None = None,
) -> jax.Array:
    """Dense SwiGLU or top-k MoE (qwen3-moe style), returns f32 [T, H].

    Expert parallelism: with ep_axis set (inside shard_map), the expert
    leaves arrive sharded over the axis; each shard evaluates its LOCAL
    experts against globally-routed gates (expert ids offset by
    shard * local_E) and the caller's existing per-layer psum sums the
    expert partials — no extra collectives (reference EP via
    vllm_parallel_state._EP, parallel_state.py:854-864).

    ep_axis may also be a TUPLE of axis names, e.g. ("ep", "tp") for a
    dedicated expert-parallel mesh axis (reference RankGenerator ep
    group excludes pp, parallel_state.py:256-263): the expert dim is
    sharded over the flattened axes (first axis major), the routed
    partial is psum'd over all but the LAST axis here (the caller still
    psums the last — its normal tp reduce), and the shared expert —
    tp-sharded, ep-replicated — is added after that inner psum.
    """
    if "dgate" in lp:
        # MammothModa2 dual-expert FFN: deterministic 2-way routing by
        # gen_mask (token id >= gen_vocab_start), over the same TPU
        # grouped-GEMM dispatch as the top-k MoE below (reference
        # moe_forward, mammoth_moda2.py:75 — permute/split/concat)
        t = x.shape[0]
        m = (
            gen_mask.astype(jnp.int32)
            if gen_mask is not None
            else jnp.zeros((t,), jnp.int32)
        )
        order = jnp.argsort(m)  # und rows first, gen rows second
        xs = x[order]
        gs = jnp.bincount(m, length=2)
        gg = jax.lax.ragged_dot(
            xs, lp["dgate"], gs, preferred_element_type=jnp.float32
        )
        uu = jax.lax.ragged_dot(
            xs, lp["dup"], gs, preferred_element_type=jnp.float32
        )
        act = (jax.nn.silu(gg) * uu).astype(x.dtype)
        rows = jax.lax.ragged_dot(
            act, lp["ddown"], gs, preferred_element_type=jnp.float32
        )
        return jnp.zeros((t, x.shape[-1]), jnp.float32).at[order].set(rows)
    if "router" not in lp:
        if (
            x.ndim == 2
            and "wgu:q4" in lp
            and "down:q4" in lp
            and isinstance(lp["wgu:q4"], _StackedQuant)
            and isinstance(lp["down:q4"], _StackedQuant)
            and "wgu:lora_a" not in lp
            and "down:lora_a" not in lp
            and os.environ.get("HT_FUSED_MLP") == "1"
        ):
            # opt-in: whole SwiGLU MLP in ONE kernel launch
            # (ops/quant_matmul.fused_mlp_int4_stacked).  Measured
            # parity-neutral on v5e decode (7,285 vs 7,313 tok/s bs8
            # int4): XLA already overlaps the split kernels' weight
            # streams, so saving the launch + activation round-trip
            # buys back what the fused kernel loses in MXU pipelining —
            # kept opt-in (HT_FUSED_MLP=1) as a documented result,
            # like the round-4 fused decode stack
            from ht_vllm_omni_tpu.ops.quant_matmul import (
                fused_mlp_int4_stacked,
            )

            out = fused_mlp_int4_stacked(
                x, lp["wgu:q4"].arr, lp["wgu:s4"].arr,
                lp["down:q4"].arr, lp["down:s4"].arr,
                lp["wgu:q4"].layer, out_dtype=jnp.float32,
            )
            if out is not None:
                return out
        if _has_weight(lp, "wgu"):
            gu = _linear(lp, "wgu", x)
            g, u = jnp.split(gu, 2, axis=-1)
        else:
            g = _linear(lp, "gate", x)
            u = _linear(lp, "up", x)
        act = (jax.nn.silu(g) * u).astype(x.dtype)
        return _linear(lp, "down", act)
    # MoE: softmax router, normalised top-k (HF Qwen3Moe norm_topk_prob)
    t = x.shape[0]
    logits = jnp.dot(
        x, lp["router"], preferred_element_type=jnp.float32
    )  # [T, E_global] — router is replicated
    probs = jax.nn.softmax(logits, axis=-1)
    k = cfg.num_experts_per_tok
    top_w, top_i = jax.lax.top_k(probs, k)  # [T, k]
    if cfg.norm_topk_prob:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)

    num_local = lp["egate"].shape[0]
    if isinstance(ep_axis, (tuple, list)):
        idx = jnp.zeros((), jnp.int32)
        for ax in ep_axis:
            idx = idx * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
        offset = idx * num_local
    elif ep_axis is not None:
        offset = jax.lax.axis_index(ep_axis) * num_local
    else:
        offset = 0

    # Grouped GEMM over top-k assignments only (O(T*k) expert FLOPs, not
    # O(T*E) like a dense all-experts sweep): sort the T*k (token,
    # expert) assignments by local expert id and run ragged matmuls
    # (lax.ragged_dot -> TPU grouped-GEMM lowering), then scatter-add the
    # weighted rows back per token.  With EP, assignments routed to other
    # shards keep weight 0 — their rows compute into local expert 0 and
    # vanish in the combine (the caller's psum sums shard partials).
    tk = t * k
    flat_e = top_i.reshape(tk) - offset
    valid = (flat_e >= 0) & (flat_e < num_local)
    w_flat = jnp.where(valid, top_w.reshape(tk), 0.0)
    e_local = jnp.where(valid, flat_e, 0).astype(jnp.int32)
    order = jnp.argsort(e_local)  # stable
    tok_sorted = order // k  # token of each sorted assignment
    xs = x[tok_sorted]  # [T*k, H]
    gs = jnp.bincount(e_local, length=num_local)
    gg = jax.lax.ragged_dot(
        xs, lp["egate"], gs, preferred_element_type=jnp.float32
    )
    uu = jax.lax.ragged_dot(
        xs, lp["eup"], gs, preferred_element_type=jnp.float32
    )
    act = (jax.nn.silu(gg) * uu).astype(x.dtype)
    rows = jax.lax.ragged_dot(
        act, lp["edown"], gs, preferred_element_type=jnp.float32
    )
    w_sorted = w_flat[order]
    acc = jnp.zeros((t, x.shape[-1]), jnp.float32)
    acc = acc.at[tok_sorted].add(rows * w_sorted[:, None])
    if isinstance(ep_axis, (tuple, list)) and len(ep_axis) > 1:
        # sum routed partials over the dedicated ep axes now; the
        # caller's psum covers only the last (tp) axis, over which the
        # shared expert below is sharded but ep-replicated.
        acc = jax.lax.psum(acc, tuple(ep_axis[:-1]))
    if "sgate" in lp:
        # Qwen2MoE-style shared expert, sigmoid-gated (HF Qwen3-Omni
        # talker Qwen3OmniMoeTalkerTextSparseMoeBlock).  Sharded like a
        # dense Megatron MLP over tp, so the caller's psum is exact.
        sg = _linear(lp, "sgate", x)
        su = _linear(lp, "sup", x)
        s_act = (jax.nn.silu(sg) * su).astype(x.dtype)
        shared = _linear(lp, "sdown", s_act)
        # gate is replicated; scaling the row-sharded partial by it is
        # psum-exact (psum is linear)
        gate_w = jax.nn.sigmoid(
            jnp.dot(x, lp["shared_gate"],
                    preferred_element_type=jnp.float32)
        )
        acc = acc + shared * gate_w
    return acc


def prefill(
    cfg: ModelArchConfig,
    params: dict,
    inputs_embeds: jax.Array,  # [S, H] (padded)
    positions: jax.Array,  # [S] int32
    prompt_len: jax.Array,  # scalar int32: valid tokens
    *,
    tp_axis: str | None = None,
    ep_axis: str | tuple | None = None,
    fsdp_axis: str | None = None,
    gen_mask: jax.Array | None = None,
    final_norm: bool = True,
    collect_layer_hiddens: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Run one request's prompt; returns (hidden [S, H] normed,
    kv_rows [L, S, 2F]).

    Attention is dense flash over this request's own K/V; the per-layer
    [K || V] rows are collected as scan outputs and flushed into the paged
    cache ONCE by the caller (ops/kv_cache_update.flush_kv_rows — the only
    composition where the cache write is copy-free).

    With ``collect_layer_hiddens`` the second return value becomes the
    per-layer residual stream [L, S, H] instead of KV rows — used by
    text-encoder consumers that stack intermediate layers (e.g. Flux2's
    Mistral-3 features from layers 10/20/30).
    """
    s = inputs_embeds.shape[0]
    f = cfg.num_key_value_heads * cfg.head_dim
    if positions.ndim == 2:  # [3, S] multimodal M-RoPE positions
        from ht_vllm_omni_tpu.models.mrope import mrope_cos_sin

        cos, sin = mrope_cos_sin(
            positions, cfg.head_dim, cfg.rope_theta,
            tuple(cfg.mrope_sections),
        )
    else:
        cos, sin = rope_cos_sin(positions, cfg.rotary_dim, cfg.rope_theta)
    lens = prompt_len[None].astype(jnp.int32)

    eax = ep_axis if ep_axis is not None else tp_axis

    def layer(h, lp):
        lp = _gather_fsdp(lp, fsdp_axis)
        x = rms_norm(h, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lp, x, cos, sin)
        row = jnp.concatenate([k.reshape(s, f), v.reshape(s, f)], axis=-1)
        # [1, heads, S, D] layout for the kernel
        o = flash_attention(
            q.transpose(1, 0, 2)[None],
            k.transpose(1, 0, 2)[None],
            v.transpose(1, 0, 2)[None],
            lens,
            causal=True,
        )[0].transpose(1, 0, 2).reshape(s, -1)
        delta = _linear(lp, "wo", o)
        if tp_axis is not None:
            delta = jax.lax.psum(delta, tp_axis)
        delta = _maybe_post_norm(cfg, lp, "post_ln1", delta)
        h = h + delta.astype(h.dtype)
        x = rms_norm(h, lp["ln2"], cfg.rms_norm_eps)
        delta = _mlp(cfg, lp, x, ep_axis=eax, gen_mask=gen_mask)
        if tp_axis is not None:
            delta = jax.lax.psum(delta, tp_axis)
        delta = _maybe_post_norm(cfg, lp, "post_ln2", delta)
        h = h + delta.astype(h.dtype)
        return h, (h if collect_layer_hiddens else row)

    h, aux = jax.lax.scan(layer, inputs_embeds, _layer_params(params))
    if final_norm:  # pp stages < last hand off the raw residual stream
        h = rms_norm(h, params["norm_f"], cfg.rms_norm_eps)
    return h, aux


def prefill_batch(
    cfg: ModelArchConfig,
    params: dict,
    inputs_embeds: jax.Array,  # [B, S, H] (padded)
    positions: jax.Array,  # [B, S] int32
    prompt_lens: jax.Array,  # [B] valid tokens per row
    *,
    tp_axis: str | None = None,
    ep_axis: str | tuple | None = None,
    fsdp_axis: str | None = None,
    gen_mask: jax.Array | None = None,
    final_norm: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Cross-request batched prefill: B prompts padded to one bucket run
    in a single dispatch (one flash kernel per layer over the whole
    batch) — the fix for one-at-a-time prefill stalls under load
    (reference runner batches prefills inside vLLM's persistent batch,
    gpu_model_runner._prepare_inputs).  Returns (hidden [B, S, H],
    kv_rows [L, B, S, 2F])."""
    b, s, _ = inputs_embeds.shape
    d = cfg.head_dim
    f = cfg.num_key_value_heads * d
    cos, sin = rope_cos_sin(
        positions.reshape(-1), cfg.rotary_dim, cfg.rope_theta
    )
    lens = prompt_lens.astype(jnp.int32)

    eax = ep_axis if ep_axis is not None else tp_axis

    def layer(h, lp):
        lp = _gather_fsdp(lp, fsdp_axis)
        x = rms_norm(h, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = _qkv(
            cfg, lp, x.reshape(b * s, -1), cos, sin
        )  # [B*S, heads, d]
        q = q.reshape(b, s, cfg.num_attention_heads, d)
        k = k.reshape(b, s, cfg.num_key_value_heads, d)
        v = v.reshape(b, s, cfg.num_key_value_heads, d)
        row = jnp.concatenate(
            [k.reshape(b, s, f), v.reshape(b, s, f)], axis=-1
        )
        o = flash_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            lens,
            causal=True,
        ).transpose(0, 2, 1, 3).reshape(b, s, -1)
        delta = _linear(lp, "wo", o)
        if tp_axis is not None:
            delta = jax.lax.psum(delta, tp_axis)
        delta = _maybe_post_norm(cfg, lp, "post_ln1", delta)
        h = h + delta.astype(h.dtype)
        x = rms_norm(h, lp["ln2"], cfg.rms_norm_eps)
        delta = _mlp_batched(cfg, lp, x, eax)
        if tp_axis is not None:
            delta = jax.lax.psum(delta, tp_axis)
        delta = _maybe_post_norm(cfg, lp, "post_ln2", delta)
        h = h + delta.astype(h.dtype)
        return h, row

    h, kv_rows = jax.lax.scan(layer, inputs_embeds, _layer_params(params))
    if final_norm:
        h = rms_norm(h, params["norm_f"], cfg.rms_norm_eps)
    return h, kv_rows


def _mlp_batched(cfg, lp, x, ep_axis, gen_mask=None):
    """_mlp over [B, S, H]: dense runs natively; MoE/dual routing
    flattens."""
    if "router" not in lp and "dgate" not in lp:
        return _mlp(cfg, lp, x, ep_axis=ep_axis)
    b, s, hdim = x.shape
    gm = gen_mask.reshape(b * s) if gen_mask is not None else None
    return _mlp(
        cfg, lp, x.reshape(b * s, hdim), ep_axis=ep_axis, gen_mask=gm
    ).reshape(b, s, hdim)


def decode(
    cfg: ModelArchConfig,
    params: dict,
    kv_cache: jax.Array,  # [L, NSLOTS, 2F] combined cache — READ ONLY
    fresh: jax.Array,  # [L, S*K, 2F] in-chunk rows (row b*K + j)
    inputs_embeds: jax.Array,  # [S, H] one token per sequence slot
    positions: jax.Array,  # [S] position of the input token
    step: jax.Array,  # scalar int32: chunk step index j
    written: jax.Array,  # [S, K] bool: fresh rows valid (incl. this step)
    block_tables: jax.Array,  # [S, P]
    seq_lens0: jax.Array,  # [S] tokens materialised in pages (chunk entry)
    *,
    page_size: int,
    chunk_steps: int,
    tp_axis: str | None = None,
    ep_axis: str | tuple | None = None,
    fsdp_axis: str | None = None,
    gen_mask: jax.Array | None = None,
    final_norm: bool = True,
    rope_delta: jax.Array | None = None,  # [S] M-RoPE decode offset
    kv_scales: tuple | None = None,  # (k_scale, v_scale) for int8 caches
) -> tuple[jax.Array, jax.Array]:
    """One batched decode step with deferred cache writes.

    The paged cache is read-only here (its contents are fixed for the
    whole chunk); K/V of tokens produced during the chunk live in
    ``fresh`` and enter attention as a dense block merged with the paged
    partials via logsumexp.  Returns (kv hidden [S, H], fresh').
    """
    s_slots = inputs_embeds.shape[0]
    kvh, d = cfg.num_key_value_heads, cfg.head_dim
    f = kvh * d
    rope_pos = (
        positions + rope_delta if rope_delta is not None else positions
    )
    cos, sin = rope_cos_sin(rope_pos, cfg.rotary_dim, cfg.rope_theta)
    row_idx = jnp.arange(s_slots) * chunk_steps + step  # this step's rows

    eax = ep_axis if ep_axis is not None else tp_axis

    def layer(h, xs):
        lp, li, fresh_l = xs
        lp = _gather_fsdp(lp, fsdp_axis)
        x = rms_norm(h, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lp, x, cos, sin)
        row = jnp.concatenate(
            [k.reshape(s_slots, f), v.reshape(s_slots, f)], axis=-1
        )
        fresh_l = fresh_l.at[row_idx].set(row.astype(fresh_l.dtype))

        # one fused kernel: paged context + in-chunk fresh rows, online
        # softmax across both sources, normalized output
        ks_, vs_ = kv_scales if kv_scales is not None else (1.0, 1.0)
        o = paged_attention_fresh(
            q, kv_cache, li,
            fresh_l.reshape(s_slots, chunk_steps, 2 * f),
            step, block_tables, seq_lens0,
            page_size=page_size, kv_heads=kvh,
            k_scale=ks_, v_scale=vs_,
        ).astype(h.dtype)
        o = o.reshape(s_slots, -1)

        delta = _linear(lp, "wo", o)
        if tp_axis is not None:
            delta = jax.lax.psum(delta, tp_axis)
        delta = _maybe_post_norm(cfg, lp, "post_ln1", delta)
        h = h + delta.astype(h.dtype)
        x = rms_norm(h, lp["ln2"], cfg.rms_norm_eps)
        delta = _mlp(cfg, lp, x, ep_axis=eax, gen_mask=gen_mask)
        if tp_axis is not None:
            delta = jax.lax.psum(delta, tp_axis)
        delta = _maybe_post_norm(cfg, lp, "post_ln2", delta)
        h = h + delta.astype(h.dtype)
        return h, fresh_l

    num_layers = kv_cache.shape[0]
    h, fresh = jax.lax.scan(
        layer,
        inputs_embeds,
        (
            _layer_params(params),
            jnp.arange(num_layers, dtype=jnp.int32),
            fresh,
        ),
    )
    if final_norm:
        h = rms_norm(h, params["norm_f"], cfg.rms_norm_eps)
    return h, fresh


def decode_direct(
    cfg: ModelArchConfig,
    params: dict,
    kv_cache: jax.Array,  # [L, NSLOTS, 2F] — scan-carried, written HERE
    inputs_embeds: jax.Array,  # [S, H] one token per sequence slot
    positions: jax.Array,  # [S] position of the input token
    active: jax.Array,  # [S] bool — inactive slots write nothing
    block_tables: jax.Array,  # [S, P]
    *,
    page_size: int,
    tp_axis: str | None = None,
    ep_axis: str | tuple | None = None,
    fsdp_axis: str | None = None,
    gen_mask: jax.Array | None = None,
    final_norm: bool = True,
    rope_delta: jax.Array | None = None,
    kv_scales: tuple | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One batched decode step with DIRECT paged-cache writes.

    Each layer scatters this token's [K‖V] row into the (donated,
    scan-carried) cache before attending, so attention is a single
    paged read (ops/paged_attention.paged_decode_attention) with
    seq_len = position + 1 — no fresh-row side buffer, no end-of-chunk
    flush.  The XLA scatter on the loop carry is in-place (~1.2 us
    measured); only Pallas custom calls with aliased OUTPUTS force
    cache copies inside scan (ops/kv_cache_update.py top note), and
    the kernel here only reads.  Replaces decode() in the decode hot
    loop; equivalent of vLLM's reshape_and_cache + paged attention
    per layer (SURVEY §2.9).  Returns (hidden [S, H], kv_cache)."""
    s_slots = inputs_embeds.shape[0]
    kvh, d = cfg.num_key_value_heads, cfg.head_dim
    f = kvh * d
    rope_pos = (
        positions + rope_delta if rope_delta is not None else positions
    )
    cos, sin = rope_cos_sin(rope_pos, cfg.rotary_dim, cfg.rope_theta)
    eax = ep_axis if ep_axis is not None else tp_axis

    page_col = jnp.clip(
        positions // page_size, 0, block_tables.shape[1] - 1
    )
    page = jnp.take_along_axis(
        block_tables, page_col[:, None], axis=1
    )[:, 0]
    # inactive slots scatter out-of-bounds -> dropped.  The sentinel
    # must be a POSITIVE out-of-range row: jnp normalizes negative
    # indices (adds n) before the scatter, so -1 silently wraps to the
    # last cache row and corrupts it (ops/paged_attention.py:788 note).
    rows = jnp.where(
        active,
        page * page_size + positions % page_size,
        kv_cache.shape[1],
    )
    seq_lens = jnp.where(active, positions + 1, 0)
    ks_, vs_ = kv_scales if kv_scales is not None else (1.0, 1.0)
    cache_dt = kv_cache.dtype

    sliced_leaves, stacked_q = split_stacked_quant(
        _layer_params(params)
    )

    def layer(carry, xs):
        h, kv_cache = carry
        lp, li = xs
        lp = _gather_fsdp(lp, fsdp_axis)
        if stacked_q:
            lp = dict(lp)
            lp.update(
                {k: _StackedQuant(v, li) for k, v in stacked_q.items()}
            )
        x = rms_norm(h, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lp, x, cos, sin)
        row = jnp.concatenate(
            [k.reshape(s_slots, f), v.reshape(s_slots, f)], axis=-1
        )
        if kv_scales is not None:
            from ht_vllm_omni_tpu.ops.kv_cache_update import quantize_rows

            row = quantize_rows(row, f, ks_, vs_, dtype=cache_dt)
        else:
            row = row.astype(cache_dt)
        if row.shape[-1] < kv_cache.shape[-1]:  # int8 alignment padding
            row = jnp.pad(
                row, ((0, 0), (0, kv_cache.shape[-1] - row.shape[-1]))
            )
        kv_cache = kv_cache.at[li, rows].set(row, mode="drop")
        o = paged_decode_attention(
            q, kv_cache, li, block_tables, seq_lens,
            page_size=page_size, kv_heads=kvh,
            k_scale=ks_, v_scale=vs_,
        ).astype(h.dtype)
        o = o.reshape(s_slots, -1)

        delta = _linear(lp, "wo", o)
        if tp_axis is not None:
            delta = jax.lax.psum(delta, tp_axis)
        delta = _maybe_post_norm(cfg, lp, "post_ln1", delta)
        h = h + delta.astype(h.dtype)
        x = rms_norm(h, lp["ln2"], cfg.rms_norm_eps)
        delta = _mlp(cfg, lp, x, ep_axis=eax, gen_mask=gen_mask)
        if tp_axis is not None:
            delta = jax.lax.psum(delta, tp_axis)
        delta = _maybe_post_norm(cfg, lp, "post_ln2", delta)
        h = h + delta.astype(h.dtype)
        return (h, kv_cache), ()

    num_layers = kv_cache.shape[0]
    (h, kv_cache), _ = jax.lax.scan(
        layer,
        (inputs_embeds, kv_cache),
        (sliced_leaves, jnp.arange(num_layers, dtype=jnp.int32)),
    )
    if final_norm:
        h = rms_norm(h, params["norm_f"], cfg.rms_norm_eps)
    return h, kv_cache


def spec_verify_forward(
    cfg: ModelArchConfig,
    params: dict,
    kv_cache: jax.Array,  # [L, NSLOTS, 2F] — READ ONLY
    fresh: jax.Array,  # [L, S*R, 2F] chunk rows (R rows per slot)
    inputs_embeds: jax.Array,  # [S*Q, H]: per slot [cur, draft_1..Q-1]
    positions: jax.Array,  # [S*Q] position of each query row
    fresh_base: jax.Array,  # [S] rows already written per slot
    block_tables: jax.Array,  # [S, P]
    seq_lens0: jax.Array,  # [S]
    *,
    page_size: int,
    q_per_seq: int,
    rows_per_slot: int,
    tp_axis: str | None = None,
    ep_axis: str | tuple | None = None,
    fsdp_axis: str | None = None,
    gen_mask: jax.Array | None = None,
    kv_scales: tuple | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One speculative-verification forward: Q query rows per slot (the
    current token + Q-1 draft proposals) in a single pass.  Candidate KV
    rows are written at fresh_base + j and each query row's fresh
    visibility is exactly its own row (prefix property: a row's output
    only matters when every earlier proposal was accepted — see
    worker/model_runner spec decode).  Returns (hidden [S*Q, H],
    fresh')."""
    sq = inputs_embeds.shape[0]
    s_slots = sq // q_per_seq
    kvh, d = cfg.num_key_value_heads, cfg.head_dim
    f = kvh * d
    cos, sin = rope_cos_sin(positions, cfg.rotary_dim, cfg.rope_theta)
    offs = jnp.tile(jnp.arange(q_per_seq, dtype=jnp.int32), s_slots)
    slot_of = jnp.repeat(
        jnp.arange(s_slots, dtype=jnp.int32), q_per_seq
    )
    # per-row fresh write index + visibility limit (its own row)
    row_limit = fresh_base[slot_of] + offs  # [S*Q]
    write_idx = jnp.clip(
        slot_of * rows_per_slot + row_limit,
        0,
        s_slots * rows_per_slot - 1,
    )
    tables_rep = block_tables[slot_of]
    lens_rep = seq_lens0[slot_of]

    eax = ep_axis if ep_axis is not None else tp_axis

    def layer(h, xs):
        lp, li, fresh_l = xs
        lp = _gather_fsdp(lp, fsdp_axis)
        x = rms_norm(h, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lp, x, cos, sin)
        row = jnp.concatenate([k.reshape(sq, f), v.reshape(sq, f)], axis=-1)
        fresh_l = fresh_l.at[write_idx].set(row.astype(fresh_l.dtype))

        ks_, vs_ = kv_scales if kv_scales is not None else (1.0, 1.0)
        o = paged_attention_fresh(
            q, kv_cache, li,
            fresh_l.reshape(s_slots, rows_per_slot, 2 * f),
            row_limit, tables_rep, lens_rep,
            page_size=page_size, kv_heads=kvh, q_per_seq=q_per_seq,
            k_scale=ks_, v_scale=vs_,
        ).astype(h.dtype)
        o = o.reshape(sq, -1)
        delta = _linear(lp, "wo", o)
        if tp_axis is not None:
            delta = jax.lax.psum(delta, tp_axis)
        delta = _maybe_post_norm(cfg, lp, "post_ln1", delta)
        h = h + delta.astype(h.dtype)
        x = rms_norm(h, lp["ln2"], cfg.rms_norm_eps)
        delta = _mlp(cfg, lp, x, ep_axis=eax, gen_mask=gen_mask)
        if tp_axis is not None:
            delta = jax.lax.psum(delta, tp_axis)
        delta = _maybe_post_norm(cfg, lp, "post_ln2", delta)
        h = h + delta.astype(h.dtype)
        return h, fresh_l

    num_layers = kv_cache.shape[0]
    h, fresh = jax.lax.scan(
        layer,
        inputs_embeds,
        (
            _layer_params(params),
            jnp.arange(num_layers, dtype=jnp.int32),
            fresh,
        ),
    )
    h = rms_norm(h, params["norm_f"], cfg.rms_norm_eps)
    return h, fresh


def prefill_chunk(
    cfg: ModelArchConfig,
    params: dict,
    kv_cache: jax.Array,  # [L, NSLOTS, 2F] — READ ONLY here
    inputs_embeds: jax.Array,  # [T_pad, H] chunk (padded)
    positions: jax.Array,  # [T_pad]
    ctx_len: jax.Array,  # scalar: tokens already in pages
    page_table: jax.Array,  # [P] this sequence's pages
    valid_len: jax.Array,  # scalar: real tokens in this chunk
    *,
    page_size: int,
    tp_axis: str | None = None,
    ep_axis: str | tuple | None = None,
    fsdp_axis: str | None = None,
    gen_mask: jax.Array | None = None,
    kv_scales: tuple | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One prompt chunk with paged context attention (chunked prefill).

    Attention = logsumexp-merge of (a) the Pallas paged-context partial
    over pages [0, ctx_len) and (b) dense causal self-attention within
    the chunk (ops/paged_prefill.py).  Returns (hidden [T_pad, H],
    kv_rows [L, T_pad, 2F]) — the caller flushes rows once, top-level.
    """
    from ht_vllm_omni_tpu.ops.paged_prefill import (
        chunk_self_partial,
        merge_partials,
        paged_context_partial,
    )

    t = inputs_embeds.shape[0]
    kvh, d = cfg.num_key_value_heads, cfg.head_dim
    f = kvh * d
    group = cfg.num_attention_heads // kvh
    cos, sin = rope_cos_sin(positions, cfg.rotary_dim, cfg.rope_theta)

    eax = ep_axis if ep_axis is not None else tp_axis

    def layer(h, xs):
        lp, li = xs
        lp = _gather_fsdp(lp, fsdp_axis)
        x = rms_norm(h, lp["ln1"], cfg.rms_norm_eps)
        q, k, v = _qkv(cfg, lp, x, cos, sin)
        row = jnp.concatenate([k.reshape(t, f), v.reshape(t, f)], axis=-1)
        ks_, vs_ = kv_scales if kv_scales is not None else (1.0, 1.0)
        acc_c, m_c, l_c = paged_context_partial(
            q, kv_cache, li, page_table, ctx_len,
            page_size=page_size, kv_heads=kvh,
            k_scale=ks_, v_scale=vs_,
        )
        acc_s, m_s, l_s = chunk_self_partial(
            q, k, v, valid_len, kv_heads=kvh
        )
        o = merge_partials(
            [
                (acc_c[:, :, :group], m_c[:, :, :group], l_c[:, :, :group]),
                (acc_s, m_s, l_s),
            ]
        ).astype(h.dtype).reshape(t, -1)
        delta = _linear(lp, "wo", o)
        if tp_axis is not None:
            delta = jax.lax.psum(delta, tp_axis)
        delta = _maybe_post_norm(cfg, lp, "post_ln1", delta)
        h = h + delta.astype(h.dtype)
        x = rms_norm(h, lp["ln2"], cfg.rms_norm_eps)
        delta = _mlp(cfg, lp, x, ep_axis=eax, gen_mask=gen_mask)
        if tp_axis is not None:
            delta = jax.lax.psum(delta, tp_axis)
        delta = _maybe_post_norm(cfg, lp, "post_ln2", delta)
        h = h + delta.astype(h.dtype)
        return h, row

    num_layers = kv_cache.shape[0]
    h, kv_rows = jax.lax.scan(
        layer,
        inputs_embeds,
        (
            _layer_params(params),
            jnp.arange(num_layers, dtype=jnp.int32),
        ),
    )
    h = rms_norm(h, params["norm_f"], cfg.rms_norm_eps)
    return h, kv_rows
