"""HF-parity: the Qwen3-Omni talker trunk (Qwen3-MoE + shared expert)
runs on our qwen2.py stack; numerics vs transformers TalkerModel.

The talker's attention/rope are the thinker-text ones our trunk already
implements; what this pins down is the Qwen2MoE-style sparse block with
the sigmoid-gated shared expert (reference qwen3_omni_moe_talker.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.models import qwen2


def _tiny():
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeTalkerTextConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeTalkerModel,
    )

    hf_cfg = Qwen3OmniMoeTalkerTextConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=16,
        shared_expert_intermediate_size=24,
        # equal t/h/w positions make interleaved mrope == standard rope,
        # so the 1D-position jax trunk is directly comparable
        rope_scaling={"rope_type": "default", "mrope_section": [1, 1, 2]},
    )
    torch.manual_seed(23)
    hf = Qwen3OmniMoeTalkerModel(hf_cfg).eval()

    cfg = ModelArchConfig(
        model_type="qwen3_moe",
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        dtype="float32",
        qk_norm=True,
        attention_bias=hf_cfg.attention_bias,
        rms_norm_eps=hf_cfg.rms_norm_eps,
        rope_theta=hf_cfg.rope_theta,
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=16,
        shared_expert_intermediate_size=24,
        norm_topk_prob=hf_cfg.norm_topk_prob,
        tie_word_embeddings=True,
    )

    # map HF talker names to loader-style stacked params
    sd = hf.state_dict()

    def stack(fmt, transpose=True):
        return np.stack([
            np.asarray(sd[fmt.format(i)].float()).T if transpose
            else np.asarray(sd[fmt.format(i)].float())
            for i in range(cfg.num_hidden_layers)
        ])

    import jax.numpy as jnp

    params = {
        "embed": np.asarray(sd["codec_embedding.weight"].float()),
        "ln1": stack("layers.{}.input_layernorm.weight", False),
        "ln2": stack("layers.{}.post_attention_layernorm.weight", False),
        "wq": stack("layers.{}.self_attn.q_proj.weight"),
        "wk": stack("layers.{}.self_attn.k_proj.weight"),
        "wv": stack("layers.{}.self_attn.v_proj.weight"),
        "wo": stack("layers.{}.self_attn.o_proj.weight"),
        "q_norm": stack("layers.{}.self_attn.q_norm.weight", False),
        "k_norm": stack("layers.{}.self_attn.k_norm.weight", False),
        "router": stack("layers.{}.mlp.gate.weight"),
        "sgate": stack("layers.{}.mlp.shared_expert.gate_proj.weight"),
        "sup": stack("layers.{}.mlp.shared_expert.up_proj.weight"),
        "sdown": stack("layers.{}.mlp.shared_expert.down_proj.weight"),
        "shared_gate": stack("layers.{}.mlp.shared_expert_gate.weight"),
        "norm_f": np.asarray(sd["norm.weight"].float()),
    }
    for our, hfname in (
        ("egate", "gate_proj"), ("eup", "up_proj"), ("edown", "down_proj")
    ):
        params[our] = np.stack([
            np.stack([
                np.asarray(
                    sd[f"layers.{i}.mlp.experts.{e}.{hfname}.weight"].float()
                ).T
                for e in range(cfg.num_experts)
            ])
            for i in range(cfg.num_hidden_layers)
        ])
    params = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
    return hf, cfg, params


def test_talker_trunk_matches_hf():
    hf, cfg, params = _tiny()
    rng = np.random.default_rng(9)
    s = 7
    embeds = rng.standard_normal((s, cfg.hidden_size), dtype=np.float32)

    with torch.no_grad():
        want = hf(
            inputs_embeds=torch.from_numpy(embeds)[None],
        ).last_hidden_state[0].numpy()

    import jax.numpy as jnp

    hidden, _ = qwen2.prefill(
        cfg, params, jnp.asarray(embeds),
        jnp.arange(s, dtype=jnp.int32), jnp.int32(s),
    )
    got = np.asarray(hidden)
    np.testing.assert_allclose(got, want, atol=6e-4, rtol=3e-3)


def test_talker_codec_embedding_roundtrip():
    hf, cfg, params = _tiny()
    ids = np.array([1, 5, 9], np.int64)
    want = hf.codec_embedding(torch.from_numpy(ids)).detach().numpy()
    got = np.asarray(qwen2.embed_tokens(params, ids))
    np.testing.assert_allclose(got, want, atol=1e-6)
