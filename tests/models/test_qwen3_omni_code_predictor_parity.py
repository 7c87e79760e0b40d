"""HF-parity: jax code predictor (talker MTP head) vs transformers
greedy generate, tiny-random."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ht_vllm_omni_tpu.models.qwen3_omni import code_predictor as cp


def _tiny():
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeTalkerCodePredictorConfig,
    )
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeTalkerCodePredictorModelForConditionalGeneration,
    )

    hf_cfg = Qwen3OmniMoeTalkerCodePredictorConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=8,
        intermediate_size=64,
        vocab_size=32,
        num_code_groups=5,
    )
    torch.manual_seed(41)
    hf = Qwen3OmniMoeTalkerCodePredictorModelForConditionalGeneration(
        hf_cfg
    ).eval()
    cfg = cp.CodePredictorConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, intermediate_size=64,
        vocab_size=32, num_code_groups=5,
        rms_norm_eps=hf_cfg.rms_norm_eps, rope_theta=hf_cfg.rope_theta,
    )
    params = cp.load_hf_state(cfg, hf.state_dict())
    return hf, cfg, params


def test_code_predictor_greedy_matches_hf():
    hf, cfg, params = _tiny()
    rng = np.random.default_rng(19)
    n = 3
    hidden = rng.standard_normal((n, 32), dtype=np.float32)
    code0 = rng.integers(0, 32, size=n).astype(np.int32)
    # the group-0 code is embedded by the TALKER's table (external to
    # this module) — any fixed table works for parity
    talker_table = rng.standard_normal((32, 32), dtype=np.float32)
    code0_embed = talker_table[code0]

    # HF: step-wise greedy expansion with a KV cache, mirroring the
    # model's generate() contract (prefill [hidden, talker_emb(code0)],
    # then lm_head[g] -> embeds[g-1] feedback)
    want = np.zeros((n, cfg.num_code_groups), np.int64)
    want[:, 0] = code0
    with torch.no_grad():
        emb0 = torch.from_numpy(code0_embed)
        inputs = torch.stack(
            [torch.from_numpy(hidden), emb0], dim=1
        )  # [n, 2, h]
        out = hf(inputs_embeds=inputs, use_cache=True)
        past = out.past_key_values
        gen_steps = out.generation_steps  # 1 after prefill
        code = out.logits[:, -1].argmax(-1)
        want[:, 1] = code.numpy()
        for g in range(2, cfg.num_code_groups):
            out = hf(
                input_ids=code[:, None],
                past_key_values=past,
                use_cache=True,
                generation_steps=gen_steps,
            )
            past = out.past_key_values
            gen_steps = out.generation_steps
            code = out.logits[:, -1].argmax(-1)
            want[:, g] = code.numpy()

    got = np.asarray(
        cp.predict_residuals(cfg, params, hidden, code0_embed, code0)
    )
    np.testing.assert_array_equal(got, want)
