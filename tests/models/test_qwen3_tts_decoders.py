"""Qwen3-TTS speech-tokenizer decoders (25 Hz v1 / 12.5 Hz v2),
voice cache, and stage builders."""

import numpy as np
import pytest

import jax

from ht_vllm_omni_tpu.models.qwen2_5_omni.config import (
    BigVGANConfig,
    DiTConfig,
)
from ht_vllm_omni_tpu.models.qwen3_omni.code2wav import Code2WavConfig
from ht_vllm_omni_tpu.models.qwen3_tts.tokenizer_decoders import (
    Qwen3TTSTokenizer12HzDecoder,
    Qwen3TTSTokenizer25HzDecoder,
    v1_bigvgan_config,
    v1_dit_config,
)


def _tiny_25hz():
    return Qwen3TTSTokenizer25HzDecoder(
        dit_cfg=DiTConfig.tiny(),
        bigvgan_cfg=BigVGANConfig.tiny(),
        num_steps=3,
    )


def _tiny_12hz():
    cfg = Code2WavConfig(
        hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        num_key_value_heads=2, intermediate_size=32, sliding_window=8,
        codebook_size=17, num_quantizers=2, upsampling_ratios=(2,),
        upsample_rates=(2, 2), decoder_dim=8,
    )
    return Qwen3TTSTokenizer12HzDecoder(cfg=cfg)


def test_v1_config_translation():
    cfg = v1_dit_config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        head_dim=8, mel_dim=8, emb_dim=16, num_embeds=33, enc_dim=12,
        enc_emb_dim=6, block_size=4, look_ahead_layers=[1],
        look_backward_layers=[0], unknown_reference_field=123,
        enc_channels=[8, 8, 8, 16], enc_kernel_sizes=[5, 3, 3, 1],
        enc_dilations=[1, 2, 3, 1], enc_res2net_scale=2,
        enc_se_channels=4, enc_attention_channels=4,
    )
    assert cfg.look_ahead_layers == (1,)
    b = v1_bigvgan_config(
        mel_dim=8, upsample_initial_channel=16, upsample_rates=[2, 2],
        upsample_kernel_sizes=[4, 4], resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 3, 5]],
    )
    assert b.resblock_dilation_sizes == ((1, 3, 5),)


def test_25hz_decoder_chunked_equals_full():
    """Euler flow with global-frame-keyed noise: chunked decode with
    enough left context reproduces the full pass on the kept frames
    (same invariant as the Qwen2.5-Omni token2wav)."""
    model = _tiny_25hz()
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 32, size=24).astype(np.int32)

    full = model(None, None, {"codes": toks}, {})["audio"]
    spt = model.samples_per_token

    model2 = _tiny_25hz()
    st = {}
    w1 = model2(None, None, {"codes": toks[:16]}, st)["audio"]
    w2 = model2(
        None, None, {"codes": toks[8:], "left_context": 8}, st
    )["audio"]
    assert len(w1) == 16 * spt and len(w2) == 8 * spt
    # the DiT attends across look-ahead blocks, so seams are
    # approximate; the bulk of overlapping frames must agree
    mid = np.concatenate([w1, w2])
    assert mid.shape == full.shape
    err = np.abs(mid[: 8 * spt] - full[: 8 * spt]).max()
    assert np.isfinite(mid).all() and err < 1e-3


def test_12hz_decoder_shapes_and_left_context():
    model = _tiny_12hz()
    spt = model.samples_per_token
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 17, size=(2, 10)).astype(np.int32)
    full = model(None, None, {"codes": codes}, {})["audio"]
    # causal decoder trims a fixed tail below T * total_upsample
    assert 9 * spt <= len(full) <= 10 * spt
    out2 = model(None, None, {"codes": codes, "left_context": 3}, {})
    np.testing.assert_allclose(
        out2["audio"], full[3 * spt:], rtol=1e-5, atol=1e-6
    )
    # single-codebook stream broadcasts across quantizers
    out3 = model(None, None, {"codes": codes[0]}, {})
    assert out3["audio"].shape == full.shape


def test_voice_cache_roundtrip(tmp_path):
    from ht_vllm_omni_tpu.models.qwen3_tts.voice_cache import (
        VoiceCacheManager,
        VoiceClonePromptItem,
    )

    mgr = VoiceCacheManager(str(tmp_path))
    items = [
        VoiceClonePromptItem(
            ref_spk_embedding=np.arange(6, dtype=np.float32),
            ref_code=np.arange(10, dtype=np.int32),
            ref_text="hello there",
            icl_mode=True,
        ),
        VoiceClonePromptItem(
            ref_spk_embedding=np.ones(6, np.float32),
            x_vector_only_mode=True,
        ),
    ]
    assert mgr.save_voice_cache("alice", items)
    assert mgr.list_speakers() == ["alice"]

    # a fresh manager reads the persisted metadata + safetensors
    mgr2 = VoiceCacheManager(str(tmp_path))
    loaded = mgr2.load_cached_voice_prompt("alice")
    assert loaded is not None and len(loaded) == 2
    np.testing.assert_array_equal(
        loaded[0].ref_spk_embedding, items[0].ref_spk_embedding
    )
    np.testing.assert_array_equal(loaded[0].ref_code, items[0].ref_code)
    assert loaded[0].ref_text == "hello there"
    assert loaded[0].icl_mode and not loaded[0].x_vector_only_mode
    assert loaded[1].ref_code is None
    assert loaded[1].x_vector_only_mode
    assert mgr2.load_cached_voice_prompt("bob") is None


def test_stage_builders():
    from ht_vllm_omni_tpu.config.stage_config import StageConfig
    from ht_vllm_omni_tpu.engine.stage_factory import (
        _GENERATION_BUILDERS,
    )

    cfg = StageConfig(
        stage_id=1, model_stage="qwen3_tts_code2wav_25hz",
        engine_args={
            "tokenizer_25hz": {
                "dit": dict(
                    mel_dim=8, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, head_dim=8, emb_dim=16,
                    num_embeds=33, enc_dim=12, enc_emb_dim=6,
                    block_size=4, look_ahead_layers=[1],
                    look_backward_layers=[0],
                    enc_channels=[8, 8, 8, 16],
                    enc_kernel_sizes=[5, 3, 3, 1],
                    enc_dilations=[1, 2, 3, 1], enc_res2net_scale=2,
                    enc_se_channels=4, enc_attention_channels=4,
                ),
                "bigvgan": dict(
                    mel_dim=8, upsample_initial_channel=16,
                    upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4],
                    resblock_kernel_sizes=[3],
                    resblock_dilation_sizes=[[1, 3, 5]],
                ),
                "num_steps": 2,
            },
        },
    )
    eng = _GENERATION_BUILDERS["qwen3_tts_code2wav_25hz"](cfg, None)
    model = cfg.runtime["code2wav_model"]
    out = model(None, None, {"codes": np.arange(8, dtype=np.int32)}, {})
    assert out["audio"].shape == (8 * model.samples_per_token,)

    cfg2 = StageConfig(
        stage_id=1, model_stage="qwen3_tts_code2wav_12hz",
        engine_args={
            "tokenizer_12hz": dict(
                hidden_size=16, num_hidden_layers=1,
                num_attention_heads=2, num_key_value_heads=2,
                intermediate_size=32, sliding_window=8,
                codebook_size=17, num_quantizers=2,
                upsampling_ratios=[2], upsample_rates=[2, 2],
                decoder_dim=8,
            ),
        },
    )
    _GENERATION_BUILDERS["qwen3_tts_code2wav_12hz"](cfg2, None)
    model2 = cfg2.runtime["code2wav_model"]
    out2 = model2(
        None, None,
        {"codes": np.zeros((2, 6), np.int32)}, {},
    )
    spt = model2.samples_per_token
    assert 5 * spt <= len(out2["audio"]) <= 6 * spt
