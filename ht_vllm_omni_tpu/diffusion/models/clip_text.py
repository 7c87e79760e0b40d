"""CLIP text encoder in jax (pooled-projection provider for SD3/Flux).

The reference consumes diffusers' CLIPTextModelWithProjection inside its
SD3/Flux pipelines (reference
vllm_omni/diffusion/models/sd3/pipeline_sd3.py:150-260 prompt encoding);
this is the TPU-native equivalent.  Semantics match HF ``CLIPTextModel``:

- learned token + absolute position embeddings;
- pre-LN transformer with causal mask, quick-GELU MLP;
- final LayerNorm; "pooled" output = hidden state at each sequence's
  EOT token (argmax of ids == eos_token_id, HF convention);
- optional text_projection (CLIPTextModelWithProjection).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    projection_dim: int = 0  # 0 = no text_projection head
    hidden_act: str = "quick_gelu"  # or "gelu"
    dtype: str = "float32"

    @staticmethod
    def tiny(**kw) -> "CLIPTextConfig":
        base = dict(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=24, eos_token_id=98,
        )
        base.update(kw)
        return CLIPTextConfig(**base)


def _dt(cfg: CLIPTextConfig):
    return jnp.dtype(cfg.dtype)


def init_params(cfg: CLIPTextConfig, key: jax.Array) -> dict:
    dt = _dt(cfg)
    L, d, f = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    keys = iter(jax.random.split(key, 12))

    def w(shape, scale=0.02):
        return (
            jax.random.normal(next(keys), shape, jnp.float32) * scale
        ).astype(dt)

    p = {
        "tok_embed": w((cfg.vocab_size, d)),
        "pos_embed": w((cfg.max_position_embeddings, d)),
        "qkv_w": w((L, d, 3 * d)), "qkv_b": jnp.zeros((L, 3 * d), dt),
        "o_w": w((L, d, d)), "o_b": jnp.zeros((L, d), dt),
        "ln1_w": jnp.ones((L, d), dt), "ln1_b": jnp.zeros((L, d), dt),
        "ln2_w": jnp.ones((L, d), dt), "ln2_b": jnp.zeros((L, d), dt),
        "fc1_w": w((L, d, f)), "fc1_b": jnp.zeros((L, f), dt),
        "fc2_w": w((L, f, d)), "fc2_b": jnp.zeros((L, d), dt),
        "final_ln_w": jnp.ones((d,), dt),
        "final_ln_b": jnp.zeros((d,), dt),
    }
    if cfg.projection_dim:
        p["text_proj"] = w((d, cfg.projection_dim))
    return p


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)) * w + b


def forward(
    cfg: CLIPTextConfig,
    params: dict,
    input_ids: jax.Array,  # [B, S]
) -> tuple[jax.Array, jax.Array]:
    """Returns (last_hidden_state [B,S,d], pooled [B, d or projection])."""
    dt = _dt(cfg)
    b, s = input_ids.shape
    d = cfg.hidden_size
    nh = cfg.num_attention_heads
    hd = d // nh
    eps = cfg.layer_norm_eps

    x = params["tok_embed"][input_ids].astype(dt)
    x = x + params["pos_embed"][:s][None]

    causal = jnp.where(
        jnp.arange(s)[None, :] <= jnp.arange(s)[:, None],
        0.0,
        jnp.finfo(jnp.float32).min,
    )

    def block(x, lp):
        h = _ln(x, lp["ln1_w"], lp["ln1_b"], eps)
        qkv = jnp.dot(h, lp["qkv_w"]) + lp["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / math.sqrt(hd))
        attn = jax.nn.softmax(scores + causal, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        x = x + jnp.dot(o, lp["o_w"]) + lp["o_b"]

        h = _ln(x, lp["ln2_w"], lp["ln2_b"], eps)
        h = jnp.dot(h, lp["fc1_w"]) + lp["fc1_b"]
        hf = h.astype(jnp.float32)
        if cfg.hidden_act == "quick_gelu":
            hf = hf * jax.nn.sigmoid(1.702 * hf)
        else:
            hf = jax.nn.gelu(hf, approximate=False)
        h = hf.astype(x.dtype)
        x = x + jnp.dot(h, lp["fc2_w"]) + lp["fc2_b"]
        return x, None

    tree = {
        k: params[k]
        for k in (
            "qkv_w", "qkv_b", "o_w", "o_b", "ln1_w", "ln1_b",
            "ln2_w", "ln2_b", "fc1_w", "fc1_b", "fc2_w", "fc2_b",
        )
    }
    x, _ = jax.lax.scan(block, x, tree)
    x = _ln(x, params["final_ln_w"], params["final_ln_b"], eps)

    # pooled = hidden at the EOT position (HF: argmax over ids==eos)
    eot = jnp.argmax(
        (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1
    )
    pooled = x[jnp.arange(b), eot]
    if "text_proj" in params:
        pooled = jnp.dot(pooled, params["text_proj"])
    return x, pooled


# ------------------------------------------------------------------ loading
def config_from_hf(hf_cfg) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=hf_cfg.vocab_size,
        hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        layer_norm_eps=hf_cfg.layer_norm_eps,
        eos_token_id=hf_cfg.eos_token_id,
        projection_dim=getattr(hf_cfg, "projection_dim", 0) or 0,
        hidden_act=hf_cfg.hidden_act,
    )


def load_hf_params(
    cfg: CLIPTextConfig,
    tensors: dict[str, np.ndarray],
    dtype=None,
    with_projection: bool = False,
) -> dict:
    """HF ``CLIPTextModel(WithProjection)`` state dict -> pytree."""
    dt = jnp.dtype(dtype or cfg.dtype)

    def f32(t):
        if t.dtype == np.uint16:
            return np.asarray(
                jnp.asarray(t).view(jnp.bfloat16), dtype=np.float32
            )
        return t.astype(np.float32)

    g = lambda k: f32(tensors[k])  # noqa: E731
    L = cfg.num_hidden_layers
    pre = "text_model.encoder.layers.{i}."

    def st(suffix, transpose=False):
        out = []
        for i in range(L):
            t = g(pre.format(i=i) + suffix)
            out.append(t.T if transpose else t)
        return jnp.asarray(np.stack(out), dt)

    def qkv(i, kind):
        parts = [
            g(pre.format(i=i) + f"self_attn.{n}_proj.{kind}")
            for n in ("q", "k", "v")
        ]
        if kind == "weight":
            parts = [t.T for t in parts]
        return np.concatenate(parts, axis=-1)

    p = {
        "tok_embed": jnp.asarray(
            g("text_model.embeddings.token_embedding.weight"), dt
        ),
        "pos_embed": jnp.asarray(
            g("text_model.embeddings.position_embedding.weight"), dt
        ),
        "qkv_w": jnp.asarray(
            np.stack([qkv(i, "weight") for i in range(L)]), dt
        ),
        "qkv_b": jnp.asarray(
            np.stack([qkv(i, "bias") for i in range(L)]), dt
        ),
        "o_w": st("self_attn.out_proj.weight", transpose=True),
        "o_b": st("self_attn.out_proj.bias"),
        "ln1_w": st("layer_norm1.weight"),
        "ln1_b": st("layer_norm1.bias"),
        "ln2_w": st("layer_norm2.weight"),
        "ln2_b": st("layer_norm2.bias"),
        "fc1_w": st("mlp.fc1.weight", transpose=True),
        "fc1_b": st("mlp.fc1.bias"),
        "fc2_w": st("mlp.fc2.weight", transpose=True),
        "fc2_b": st("mlp.fc2.bias"),
        "final_ln_w": jnp.asarray(
            g("text_model.final_layer_norm.weight"), dt
        ),
        "final_ln_b": jnp.asarray(g("text_model.final_layer_norm.bias"), dt),
    }
    if with_projection and "text_projection.weight" in tensors:
        p["text_proj"] = jnp.asarray(g("text_projection.weight").T, dt)
    return p
