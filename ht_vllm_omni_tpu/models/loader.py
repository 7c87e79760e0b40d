"""HF checkpoint loading (safetensors) into stacked-layer pytrees.

Replaces the reference's reliance on vLLM/diffusers model loaders
(reference vllm_omni/diffusion/model_loader/diffusers_loader.py:50 and the
upstream vLLM weight loader).  Weights are read with safetensors.numpy
(no torch on the hot path), transposed to [in, out], and stacked across
layers to match ht_vllm_omni_tpu.models.qwen2 param layout.
"""

from __future__ import annotations

import glob
import json
import os

import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig


def config_from_hf(path: str) -> ModelArchConfig:
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    mt = hf.get("model_type", "qwen2")
    return ModelArchConfig(
        model_type=mt,
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_hidden_layers=hf["num_hidden_layers"],
        num_attention_heads=hf["num_attention_heads"],
        num_key_value_heads=hf.get(
            "num_key_value_heads", hf["num_attention_heads"]
        ),
        head_dim=hf.get("head_dim"),
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        max_position_embeddings=hf.get("max_position_embeddings", 32768),
        qk_norm=mt in ("qwen3", "qwen3_moe"),
        attention_bias=hf.get("attention_bias", mt == "qwen2"),
        partial_rotary_factor=hf.get("partial_rotary_factor", 1.0),
        use_post_norms=mt in ("glm4", "glm_image"),
        rope_interleaved=mt in ("glm4", "glm_image"),
        eos_token_id=hf.get("eos_token_id", 151645),
        bos_token_id=hf.get("bos_token_id"),
        num_experts=hf.get("num_experts", 0) if mt.endswith("_moe") else 0,
        num_experts_per_tok=hf.get("num_experts_per_tok", 0),
        moe_intermediate_size=hf.get("moe_intermediate_size", 0),
        shared_expert_intermediate_size=hf.get(
            "shared_expert_intermediate_size", 0
        ),
        norm_topk_prob=hf.get("norm_topk_prob", True),
        # MammothModa2 (reference transformers_utils/configs/
        # mammoth_moda2.py:91-135): dual und/gen FFN routed by token id
        use_gen_mlp=mt.startswith("mammothmoda2"),
        gen_vocab_start=hf.get("gen_vocab_start_index", 0) or 0,
    )


def _read_all_tensors(path: str) -> dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    tensors: dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {path}")
    for f in files:
        tensors.update(load_file(f))
    return tensors


def load_hf_params(cfg: ModelArchConfig, path: str, dtype=None) -> dict:
    """Load a HF Qwen2/Qwen3-style checkpoint directory (or a .gguf
    file / directory containing one — quantization/gguf.py)."""
    if path.endswith(".gguf"):
        from ht_vllm_omni_tpu.quantization.gguf import load_gguf_params

        return load_gguf_params(cfg, path, dtype)
    ggufs = sorted(glob.glob(os.path.join(path, "*.gguf")))
    if ggufs and not glob.glob(os.path.join(path, "*.safetensors")):
        from ht_vllm_omni_tpu.quantization.gguf import load_gguf_params

        return load_gguf_params(cfg, ggufs[0], dtype)
    dt = jnp.dtype(dtype or cfg.dtype)
    raw = _read_all_tensors(path)
    nl = cfg.num_hidden_layers

    def get(name: str) -> np.ndarray:
        t = raw[name]
        if t.dtype == np.uint16:  # safetensors.numpy surfaces bf16 as u16
            t = t.view(np.uint16)
            return np.asarray(
                jnp.asarray(t).view(jnp.bfloat16), dtype=np.float32
            )
        return t.astype(np.float32)

    def stack(fmt: str, transpose: bool) -> jnp.ndarray:
        mats = []
        for i in range(nl):
            m = get(fmt.format(i))
            mats.append(m.T if transpose else m)
        return jnp.asarray(np.stack(mats), dtype=dt)

    p = "model.layers.{}."
    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dt),
        "ln1": stack(p + "input_layernorm.weight", False),
        "ln2": stack(p + "post_attention_layernorm.weight", False),
        "wq": stack(p + "self_attn.q_proj.weight", True),
        "wk": stack(p + "self_attn.k_proj.weight", True),
        "wv": stack(p + "self_attn.v_proj.weight", True),
        "wo": stack(p + "self_attn.o_proj.weight", True),
        "norm_f": jnp.asarray(get("model.norm.weight"), dt),
    }
    if cfg.num_experts > 0:
        params["router"] = stack(p + "mlp.gate.weight", True)
        for our, hfname in (
            ("egate", "gate_proj"), ("eup", "up_proj"), ("edown", "down_proj")
        ):
            mats = []
            for i in range(nl):
                layer_mats = [
                    get(
                        f"model.layers.{i}.mlp.experts.{e}."
                        f"{hfname}.weight"
                    ).T
                    for e in range(cfg.num_experts)
                ]
                mats.append(np.stack(layer_mats))
            params[our] = jnp.asarray(np.stack(mats), dtype=dt)
        if cfg.shared_expert_intermediate_size > 0:
            params["sgate"] = stack(
                p + "mlp.shared_expert.gate_proj.weight", True
            )
            params["sup"] = stack(
                p + "mlp.shared_expert.up_proj.weight", True
            )
            params["sdown"] = stack(
                p + "mlp.shared_expert.down_proj.weight", True
            )
            params["shared_gate"] = stack(
                p + "mlp.shared_expert_gate.weight", True
            )
    elif cfg.use_gen_mlp:
        # MammothModa2 dual FFN: index 0 = mlp (und), index 1 = gen_mlp;
        # layers shipped without gen_mlp replicate the und weights so
        # routing is a no-op there (moe_enable layer ranges,
        # reference mammoth_moda2.py:54)
        for our, hfname in (
            ("dgate", "gate_proj"), ("dup", "up_proj"),
            ("ddown", "down_proj"),
        ):
            mats = []
            for i in range(nl):
                und = get(f"model.layers.{i}.mlp.{hfname}.weight").T
                gen_key = f"model.layers.{i}.gen_mlp.{hfname}.weight"
                gen = raw.get(gen_key)
                gen = gen.T if gen is not None else und
                mats.append(np.stack([und, gen]))
            params[our] = jnp.asarray(np.stack(mats), dtype=dt)
    else:
        if any("mlp.gate_up_proj.weight" in k for k in raw):
            # GLM-4 ships a fused gate|up projection
            gu = stack(p + "mlp.gate_up_proj.weight", True)
            inter = cfg.intermediate_size
            params["gate"] = gu[:, :, :inter]
            params["up"] = gu[:, :, inter:]
        else:
            params["gate"] = stack(p + "mlp.gate_proj.weight", True)
            params["up"] = stack(p + "mlp.up_proj.weight", True)
        params["down"] = stack(p + "mlp.down_proj.weight", True)
    if cfg.attention_bias:
        params["bq"] = stack(p + "self_attn.q_proj.bias", False)
        params["bk"] = stack(p + "self_attn.k_proj.bias", False)
        params["bv"] = stack(p + "self_attn.v_proj.bias", False)
    if cfg.qk_norm:
        params["q_norm"] = stack(p + "self_attn.q_norm.weight", False)
        params["k_norm"] = stack(p + "self_attn.k_norm.weight", False)
    if cfg.use_post_norms:
        params["post_ln1"] = stack(
            p + "post_self_attn_layernorm.weight", False
        )
        params["post_ln2"] = stack(p + "post_mlp_layernorm.weight", False)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dt)
    return params
