"""Full TTS pipeline from the bundled qwen3_tts pipeline.yaml (tiny talker
weights): async-chunked talker -> code2wav with audio streaming."""

import numpy as np

from ht_vllm_omni_tpu.config.stage_config import (
    builtin_pipeline_path,
    load_pipeline_config,
)
from ht_vllm_omni_tpu.engine.stage_factory import build_stages
from ht_vllm_omni_tpu.entrypoints.omni import Omni
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def _tiny_pipeline():
    cfg = load_pipeline_config(builtin_pipeline_path("qwen3_tts"))
    talker = cfg.stage(0)
    talker.engine_args["model_arch_config"] = dict(
        model_type="qwen3", vocab_size=128, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, dtype="float32", qk_norm=True,
        attention_bias=False, tie_word_embeddings=True, eos_token_id=1,
    )
    talker.engine_args["num_pages"] = 64
    talker.engine_args["page_size"] = 16
    talker.engine_args["max_model_len"] = 256
    talker.default_sampling_params["max_tokens"] = 60
    talker.default_sampling_params["temperature"] = 0.0
    talker.default_sampling_params["stop_token_ids"] = []
    c2w = cfg.stage(1)
    c2w.engine_args["code2wav"] = dict(
        vocab_size=128, channels=32, num_blocks=3, hop=16, sample_rate=8000
    )
    # chunk window from the yaml stays 25 with 25 left context
    return cfg


def test_tts_pipeline_streams_chunked_audio():
    cfg = _tiny_pipeline()
    stages = build_stages(cfg)
    omni = Omni(pipeline=cfg, stages=stages)
    out = omni.generate(
        [[5, 9, 12, 40]],
        SamplingParams(
            temperature=0.0, max_tokens=60, ignore_eos=True,
            return_hidden_states=True,
        ),
    )[0]
    audio = out.consolidated_multimodal("audio")
    assert audio is not None
    assert audio.shape == (60 * 16,)  # 60 codec frames * hop
    assert int(out.multimodal_output["sample_rate"]) == 8000
    # audio arrived in multiple chunks (async streaming), not one blob
    assert isinstance(out.multimodal_output["audio"], list)
    assert len(out.multimodal_output["audio"]) >= 2

    # chunked output must equal running the vocoder over all tokens at once
    from ht_vllm_omni_tpu.models.tts.code2wav import Code2WavModel

    talker_tokens = None
    # re-run the talker alone for the reference token stream
    stages2 = build_stages(_tiny_pipeline())
    talker_out = stages2[0].engine.generate(
        [[5, 9, 12, 40]],
        SamplingParams(temperature=0.0, max_tokens=60, ignore_eos=True),
    )[0]
    talker_tokens = talker_out.outputs[0].token_ids
    ref_model = stages[1].engine.model  # same params
    full = ref_model(talker_tokens, None, {}, {})["audio"]
    np.testing.assert_allclose(audio, full, atol=1e-6)


def test_code2wav_run_batch_matches_per_item():
    """Batched vocoder decode (one vmapped dispatch across requests)
    must equal per-request calls exactly — strict causality makes the
    length-bucketed tail padding inert."""
    import numpy as np

    from ht_vllm_omni_tpu.models.tts.code2wav import (
        Code2WavConfig,
        Code2WavModel,
    )

    m = Code2WavModel(Code2WavConfig(
        vocab_size=64, channels=32, num_blocks=2, hop=16,
    ))
    items = [
        ([1, 2, 3, 4, 5], None, {}, {}),
        ([9, 8, 7], None, {"new_tokens": 2}, {}),
        ([], None, {}, {}),
        (list(range(11)), None, {}, {}),
    ]
    batched = m.run_batch(items)
    for item, got in zip(items, batched):
        want = m(item[0] or None, None, item[2], dict(item[3]))
        np.testing.assert_allclose(
            got["audio"], want["audio"], rtol=1e-6, atol=1e-6
        )
        assert int(got["sample_rate"]) == int(want["sample_rate"])
