"""T5 / UMT5 text encoder in jax.

TPU-native counterpart of the reference's TP'd T5 encoder
(reference vllm_omni/diffusion/models/t5_encoder/t5_encoder.py:25-351),
which several diffusion families (SD3, Wan2.2 via UMT5-XXL, LTX-2, …)
use as their prompt encoder.  Semantics match HF ``T5EncoderModel`` /
``UMT5EncoderModel``:

- relative-position bucketed attention bias (bidirectional), *no*
  1/sqrt(d_kv) score scaling (T5 folds it into the weights);
- pre-RMSNorm residual blocks, gated (wi_0/wi_1) or plain FFN;
- T5 computes the bias once in block 0 and reuses it everywhere;
  UMT5 owns one bias table per layer (``per_layer_relative_bias``).

Layers are stacked on a leading axis and run under ``lax.scan``; TP
shards the head and d_ff dimensions via PartitionSpec when run under a
mesh (heads stay whole per shard — same contract as the reference's
QKVParallelLinear head split).
"""

from __future__ import annotations

import dataclasses
import glob
import math
import os

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5EncoderConfig:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    num_heads: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    is_gated_act: bool = True
    dense_act_fn: str = "gelu_new"  # or "relu"
    per_layer_relative_bias: bool = False  # True => UMT5
    dtype: str = "float32"

    @staticmethod
    def tiny(**kw) -> "T5EncoderConfig":
        base = dict(
            vocab_size=96, d_model=32, d_kv=8, num_heads=4, d_ff=64,
            num_layers=3, relative_attention_num_buckets=8,
            relative_attention_max_distance=32,
        )
        base.update(kw)
        return T5EncoderConfig(**base)

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv


def _dt(cfg: T5EncoderConfig):
    return jnp.dtype(cfg.dtype)


def init_params(cfg: T5EncoderConfig, key: jax.Array) -> dict:
    dt = _dt(cfg)
    L, d, dff = cfg.num_layers, cfg.d_model, cfg.d_ff
    inner = cfg.inner_dim
    keys = iter(jax.random.split(key, 16))

    def w(shape, scale=None):
        scale = scale or (1.0 / math.sqrt(shape[-2] if len(shape) > 1 else 1))
        return (
            jax.random.normal(next(keys), shape, jnp.float32) * scale
        ).astype(dt)

    nb = L if cfg.per_layer_relative_bias else 1
    p = {
        "embed": w((cfg.vocab_size, d), scale=1.0),
        "rel_bias": w(
            (nb, cfg.relative_attention_num_buckets, cfg.num_heads),
            scale=0.02,
        ),
        "qkv_w": w((L, d, 3 * inner)),
        "o_w": w((L, inner, d)),
        "ln1": jnp.ones((L, d), dt),
        "ln2": jnp.ones((L, d), dt),
        "final_ln": jnp.ones((d,), dt),
    }
    if cfg.is_gated_act:
        p["wi_w"] = w((L, d, 2 * dff))
    else:
        p["wi_w"] = w((L, d, dff))
    p["wo_w"] = w((L, dff, d))
    return p


def _rms_norm(x: jax.Array, gamma: jax.Array, eps: float) -> jax.Array:
    # HF T5LayerNorm: normalize in fp32, scale, cast back
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * gamma


def _act(name: str, x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    if name == "relu":
        y = jax.nn.relu(xf)
    else:  # gelu_new
        y = jax.nn.gelu(xf, approximate=True)
    return y.astype(x.dtype)


def relative_position_buckets(cfg: T5EncoderConfig, seq_len: int) -> jax.Array:
    """Bidirectional bucket indices [S, S] (HF `_relative_position_bucket`)."""
    nb = cfg.relative_attention_num_buckets
    maxd = cfg.relative_attention_max_distance
    ctx = jnp.arange(seq_len, dtype=jnp.int32)[:, None]
    mem = jnp.arange(seq_len, dtype=jnp.int32)[None, :]
    rel = mem - ctx
    half = nb // 2
    buckets = jnp.where(rel > 0, half, 0)
    rel = jnp.abs(rel)
    max_exact = half // 2
    large = max_exact + (
        jnp.log(rel.astype(jnp.float32) / max_exact)
        / math.log(maxd / max_exact)
        * (half - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, half - 1)
    return buckets + jnp.where(rel < max_exact, rel, large)


def forward(
    cfg: T5EncoderConfig,
    params: dict,
    input_ids: jax.Array,  # [B, S] int32
    attention_mask: jax.Array | None = None,  # [B, S] 1=keep
) -> jax.Array:
    """Last hidden state [B, S, d_model]."""
    dt = _dt(cfg)
    b, s = input_ids.shape
    nh, dk = cfg.num_heads, cfg.d_kv

    x = params["embed"][input_ids].astype(dt)

    if attention_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        mask = (1.0 - attention_mask.astype(jnp.float32)) * neg
        mask = mask[:, None, None, :]  # [B,1,1,S]
    else:
        mask = jnp.zeros((b, 1, 1, s), jnp.float32)

    buckets = relative_position_buckets(cfg, s)  # [S, S]

    rel = params["rel_bias"]
    if not cfg.per_layer_relative_bias:
        rel = jnp.broadcast_to(rel, (cfg.num_layers,) + rel.shape[1:])

    def block(x, lp):
        # bias for this layer: [1, H, S, S]
        bias = lp["rel"][buckets]  # [S, S, H]
        bias = bias.astype(jnp.float32).transpose(2, 0, 1)[None]
        bias = bias + mask  # [B, H, S, S]

        h = _rms_norm(x, lp["ln1"], cfg.layer_norm_epsilon)
        qkv = jnp.dot(h, lp["qkv_w"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, nh, dk).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, nh, dk).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, nh, dk).transpose(0, 2, 1, 3)
        # NOTE: no 1/sqrt(d_kv) — T5 semantics
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(scores + bias, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, nh * dk)
        x = x + jnp.dot(o, lp["o_w"])

        h = _rms_norm(x, lp["ln2"], cfg.layer_norm_epsilon)
        if cfg.is_gated_act:
            gate_up = jnp.dot(h, lp["wi_w"])
            gate, up = jnp.split(gate_up, 2, axis=-1)
            h = _act(cfg.dense_act_fn, gate) * up
        else:
            h = _act(cfg.dense_act_fn, jnp.dot(h, lp["wi_w"]))
        x = x + jnp.dot(h, lp["wo_w"])
        return x, None

    tree = {
        "rel": rel,
        "qkv_w": params["qkv_w"],
        "o_w": params["o_w"],
        "ln1": params["ln1"],
        "ln2": params["ln2"],
        "wi_w": params["wi_w"],
        "wo_w": params["wo_w"],
    }
    x, _ = jax.lax.scan(block, x, tree)
    return _rms_norm(x, params["final_ln"], cfg.layer_norm_epsilon)


# ----------------------------------------------------------------- loading
def config_from_hf(hf_cfg) -> T5EncoderConfig:
    """Map a transformers T5Config/UMT5Config."""
    return T5EncoderConfig(
        vocab_size=hf_cfg.vocab_size,
        d_model=hf_cfg.d_model,
        d_kv=hf_cfg.d_kv,
        num_heads=hf_cfg.num_heads,
        d_ff=hf_cfg.d_ff,
        num_layers=hf_cfg.num_layers,
        relative_attention_num_buckets=hf_cfg.relative_attention_num_buckets,
        relative_attention_max_distance=(
            hf_cfg.relative_attention_max_distance
        ),
        layer_norm_epsilon=hf_cfg.layer_norm_epsilon,
        is_gated_act=getattr(hf_cfg, "is_gated_act", False),
        dense_act_fn=getattr(hf_cfg, "dense_act_fn", "relu"),
        per_layer_relative_bias=hf_cfg.model_type == "umt5",
    )


def _f32(t: np.ndarray) -> np.ndarray:
    if t.dtype == np.uint16:  # bf16 via safetensors.numpy
        return np.asarray(jnp.asarray(t).view(jnp.bfloat16), dtype=np.float32)
    return t.astype(np.float32)


def load_hf_params(
    cfg: T5EncoderConfig,
    tensors: dict[str, np.ndarray] | str,
    dtype=None,
) -> dict:
    """HF ``T5EncoderModel``/``UMT5EncoderModel`` state dict -> pytree.

    HF layout: ``shared.weight``,
    ``encoder.block.{i}.layer.0.SelfAttention.{q,k,v,o}.weight``
    (+ ``relative_attention_bias`` in block 0 for T5, in every block for
    UMT5), ``layer.0.layer_norm``, ``layer.1.DenseReluDense.{wi|wi_0,
    wi_1,wo}``, ``layer.1.layer_norm``, ``encoder.final_layer_norm``.
    """
    if isinstance(tensors, str):
        from safetensors.numpy import load_file

        merged: dict[str, np.ndarray] = {}
        for f in sorted(glob.glob(os.path.join(tensors, "*.safetensors"))):
            merged.update(load_file(f))
        tensors = merged
    dt = jnp.dtype(dtype or cfg.dtype)
    g = lambda k: _f32(tensors[k])  # noqa: E731
    L = cfg.num_layers

    def stack(fn):
        return jnp.asarray(np.stack([fn(i) for i in range(L)]), dt)

    pre = "encoder.block.{i}.layer.{j}."
    attn = pre + "SelfAttention.{n}.weight"

    def qkv(i):
        return np.concatenate(
            [
                g(attn.format(i=i, j=0, n=n)).T  # HF [out,in] -> [in,out]
                for n in ("q", "k", "v")
            ],
            axis=1,
        )

    nb = L if cfg.per_layer_relative_bias else 1
    rel = np.stack(
        [
            g(attn.format(i=i, j=0, n="relative_attention_bias"))
            for i in range(nb)
        ]
    )
    p = {
        "embed": jnp.asarray(g("shared.weight"), dt),
        "rel_bias": jnp.asarray(rel, dt),
        "qkv_w": stack(qkv),
        "o_w": stack(lambda i: g(attn.format(i=i, j=0, n="o")).T),
        "ln1": stack(lambda i: g(pre.format(i=i, j=0) + "layer_norm.weight")),
        "ln2": stack(lambda i: g(pre.format(i=i, j=1) + "layer_norm.weight")),
        "final_ln": jnp.asarray(g("encoder.final_layer_norm.weight"), dt),
        "wo_w": stack(
            lambda i: g(
                pre.format(i=i, j=1) + "DenseReluDense.wo.weight"
            ).T
        ),
    }
    if cfg.is_gated_act:
        p["wi_w"] = stack(
            lambda i: np.concatenate(
                [
                    g(pre.format(i=i, j=1) + "DenseReluDense.wi_0.weight").T,
                    g(pre.format(i=i, j=1) + "DenseReluDense.wi_1.weight").T,
                ],
                axis=1,
            )
        )
    else:
        p["wi_w"] = stack(
            lambda i: g(pre.format(i=i, j=1) + "DenseReluDense.wi.weight").T
        )
    return p


def param_partition_specs(cfg: T5EncoderConfig, tp_axis: str = "tp") -> dict:
    """PartitionSpecs sharding heads (qkv/o) and d_ff (wi/wo) over TP —
    the reference's ColumnParallel/RowParallel split
    (t5_encoder.py:48-64,171-183) expressed as GSPMD annotations."""
    P = jax.sharding.PartitionSpec
    return {
        "embed": P(),
        "rel_bias": P(None, None, tp_axis),
        "qkv_w": P(None, None, tp_axis),
        "o_w": P(None, tp_axis, None),
        "ln1": P(),
        "ln2": P(),
        "wi_w": P(None, None, tp_axis),
        "wo_w": P(None, tp_axis, None),
        "final_ln": P(),
    }
