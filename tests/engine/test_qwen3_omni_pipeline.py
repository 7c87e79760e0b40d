"""3-stage thinker -> talker -> code2wav pipeline (tiny models):
thinker text streams to the client while talker codec tokens stream to
the vocoder; final audio is chunk-exact."""

import numpy as np

from ht_vllm_omni_tpu.config.stage_config import (
    builtin_pipeline_path,
    load_pipeline_config,
)
from ht_vllm_omni_tpu.engine.stage_factory import build_stages
from ht_vllm_omni_tpu.entrypoints.omni import Omni
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def _tiny_cfg(moe: bool):
    cfg = dict(
        model_type="qwen3", vocab_size=128, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, dtype="float32", qk_norm=True,
        attention_bias=False, tie_word_embeddings=True, eos_token_id=1,
    )
    if moe:
        cfg.update(
            model_type="qwen3_moe", num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=16,
        )
    return cfg


def _pipeline():
    cfg = load_pipeline_config(builtin_pipeline_path("qwen3_omni"))
    assert [s.model_stage for s in cfg.stages] == [
        "qwen3_omni_thinker", "qwen3_omni_talker", "code2wav",
    ]
    thinker = cfg.stage(0)
    thinker.engine_args["model_arch_config"] = _tiny_cfg(moe=True)
    thinker.engine_args.update(num_pages=64, page_size=16, max_model_len=128)
    thinker.default_sampling_params.update(
        temperature=0.0, max_tokens=6, stop_token_ids=[]
    )
    talker = cfg.stage(1)
    talker.engine_args["model_arch_config"] = _tiny_cfg(moe=False)
    talker.engine_args.update(num_pages=64, page_size=16, max_model_len=256)
    talker.default_sampling_params.update(
        temperature=0.0, max_tokens=55, stop_token_ids=[]
    )
    c2w = cfg.stage(2)
    c2w.engine_args["code2wav"] = dict(
        vocab_size=128, channels=32, num_blocks=3, hop=16, sample_rate=8000
    )
    return cfg


def test_three_stage_omni_pipeline():
    cfg = _pipeline()
    stages = build_stages(cfg)
    omni = Omni(pipeline=cfg, stages=stages)
    out = omni.generate([[5, 9, 12]])[0]
    assert out.finished and out.final_output
    audio = out.consolidated_multimodal("audio")
    assert audio is not None and audio.shape == (55 * 16,)

    # audio equals running the vocoder over the talker's full stream
    stages2 = build_stages(_pipeline())
    thinker_out = stages2[0].engine.generate(
        [[5, 9, 12]],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                       return_hidden_states=True),
    )[0]
    talker_out = stages2[1].engine.generate(
        [__import__("ht_vllm_omni_tpu.inputs", fromlist=["OmniPrompt"])
         .OmniPrompt(
             token_ids=thinker_out.outputs[0].token_ids,
             embeds=thinker_out.outputs[0].hidden_states,
         )],
        SamplingParams(temperature=0.0, max_tokens=55, ignore_eos=True),
    )[0]
    ref = stages[2].engine.model(
        talker_out.outputs[0].token_ids, None, {}, {}
    )["audio"]
    np.testing.assert_allclose(audio, ref, atol=1e-6)
