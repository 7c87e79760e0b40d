"""Qwen2.5-Omni token2wav: HF-golden parity for the ECAPA speaker
encoder, the DiT velocity forward, the BigVGAN vocoder, plus the
chunked stage adapter and pipeline config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.models.qwen2_5_omni import (
    token2wav_bigvgan as bigvgan,
)
from ht_vllm_omni_tpu.models.qwen2_5_omni import token2wav_dit as dit
from ht_vllm_omni_tpu.models.qwen2_5_omni.config import (
    BigVGANConfig,
    DiTConfig,
    Token2WavConfig,
)

torch = pytest.importorskip("torch")
hf = pytest.importorskip(
    "transformers.models.qwen2_5_omni.modeling_qwen2_5_omni"
)


def _hf_dit(cfg: DiTConfig):
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniDiTConfig,
    )

    hcfg = Qwen2_5OmniDiTConfig(
        mel_dim=cfg.mel_dim, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        head_dim=cfg.head_dim, ff_mult=cfg.ff_mult,
        emb_dim=cfg.emb_dim, num_embeds=cfg.num_embeds,
        repeats=cfg.repeats, enc_dim=cfg.enc_dim,
        enc_emb_dim=cfg.enc_emb_dim, block_size=cfg.block_size,
        look_ahead_layers=list(cfg.look_ahead_layers),
        look_backward_layers=list(cfg.look_backward_layers),
        enc_channels=list(cfg.enc_channels),
        enc_kernel_sizes=list(cfg.enc_kernel_sizes),
        enc_dilations=list(cfg.enc_dilations),
        enc_res2net_scale=cfg.enc_res2net_scale,
        enc_se_channels=cfg.enc_se_channels,
        enc_attention_channels=cfg.enc_attention_channels,
        dropout=0.0,
    )
    m = hf.Qwen2_5OmniToken2WavDiTModel._from_config(
        hcfg, attn_implementation="sdpa"
    )
    m.eval()
    return m


def test_dit_velocity_matches_hf():
    cfg = DiTConfig.tiny()
    m = _hf_dit(cfg)
    state = {k: v.numpy() for k, v in m.state_dict().items()}
    params = dit.load_hf_state(cfg, state)

    rng = np.random.default_rng(0)
    T_code, T_ref = 6, 10
    T = T_code * cfg.repeats
    x = rng.normal(size=(1, T, cfg.mel_dim)).astype(np.float32)
    codes = rng.integers(1, cfg.num_embeds, size=(1, T_code))
    spk = rng.normal(size=(1, cfg.enc_emb_dim)).astype(np.float32)
    ref_mel = rng.normal(size=(1, T_ref, cfg.mel_dim)).astype(np.float32)
    t = np.asarray([0.4], np.float32)

    with torch.no_grad():
        ref = m(
            hidden_states=torch.from_numpy(x),
            condition_vector=torch.from_numpy(ref_mel),
            speaker_embedding=torch.from_numpy(spk)
            .unsqueeze(1)
            .repeat(1, T, 1),
            quantized_code=torch.from_numpy(codes),
            time_step=torch.from_numpy(t),
            apply_cfg=False,
        ).numpy()

    spk_code = dit.spk_encode(cfg, params["spk"], jnp.asarray(ref_mel))
    code_embed = jnp.repeat(
        params["codec_embed"][jnp.asarray(codes)], cfg.repeats, axis=1
    )
    spk_rep = jnp.broadcast_to(
        jnp.asarray(spk)[:, None], (1, T, cfg.enc_emb_dim)
    )
    out = dit.forward(
        cfg, params, jnp.asarray(x), spk_code, code_embed, spk_rep,
        jnp.asarray(t),
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_bigvgan_matches_hf():
    cfg = BigVGANConfig.tiny()
    from transformers.models.qwen2_5_omni.configuration_qwen2_5_omni import (
        Qwen2_5OmniBigVGANConfig,
    )

    hcfg = Qwen2_5OmniBigVGANConfig(
        mel_dim=cfg.mel_dim,
        upsample_initial_channel=cfg.upsample_initial_channel,
        upsample_rates=list(cfg.upsample_rates),
        upsample_kernel_sizes=list(cfg.upsample_kernel_sizes),
        resblock_kernel_sizes=list(cfg.resblock_kernel_sizes),
        resblock_dilation_sizes=[
            list(d) for d in cfg.resblock_dilation_sizes
        ],
    )
    m = hf.Qwen2_5OmniToken2WavBigVGANModel._from_config(hcfg)
    m.eval()
    state = {k: v.numpy() for k, v in m.state_dict().items()}
    params = bigvgan.load_hf_state(cfg, state)

    rng = np.random.default_rng(1)
    mel = rng.normal(size=(1, cfg.mel_dim, 12)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(mel)).numpy().reshape(-1)
    out = np.asarray(
        bigvgan.mel_to_wav(
            cfg, params, jnp.asarray(mel.transpose(0, 2, 1))
        )
    )[0]
    assert out.shape == ref.shape == (12 * cfg.hop_length,)
    np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-4)


def test_sample_shapes_and_determinism():
    cfg = DiTConfig.tiny()
    params = dit.init_params(cfg, jax.random.PRNGKey(0))
    codes = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    spk = jnp.zeros((1, cfg.enc_emb_dim))
    ref_mel = jax.random.normal(jax.random.PRNGKey(1), (1, 8, cfg.mel_dim))
    y0 = jax.random.normal(
        jax.random.PRNGKey(2), (1, 4 * cfg.repeats, cfg.mel_dim)
    )
    mel = dit.sample(cfg, params, codes, spk, ref_mel, y0, num_steps=3)
    assert mel.shape == (1, 4 * cfg.repeats, cfg.mel_dim)
    mel2 = dit.sample(cfg, params, codes, spk, ref_mel, y0, num_steps=3)
    np.testing.assert_array_equal(np.asarray(mel), np.asarray(mel2))


def test_token2wav_model_adapter_chunks():
    from ht_vllm_omni_tpu.models.qwen2_5_omni.token2wav_model import (
        Qwen2_5OmniToken2WavModel,
    )

    model = Qwen2_5OmniToken2WavModel(
        Token2WavConfig.tiny(), num_steps=2
    )
    per_tok = model.cfg.dit.repeats * model.cfg.bigvgan.hop_length
    state = {}
    out = model([1, 2, 3, 4], None, {}, state)
    assert len(out["audio"]) == 4 * per_tok
    assert np.isfinite(out["audio"]).all()
    # second chunk: 2 left-context tokens re-sent + 2 new
    out2 = model([3, 4, 5, 6], None, {"left_context": 2}, state)
    assert len(out2["audio"]) == 2 * per_tok


def test_pipeline_config_loads():
    from ht_vllm_omni_tpu.config.stage_config import (
        builtin_pipeline_path,
        load_pipeline_config,
    )

    cfg = load_pipeline_config(builtin_pipeline_path("qwen2_5_omni"))
    assert len(cfg.stages) == 3
    assert cfg.stage(2).model_stage == "qwen2_5_omni_token2wav"


def test_pipeline_e2e_streaming_audio():
    from ht_vllm_omni_tpu.config.stage_config import (
        builtin_pipeline_path,
        load_pipeline_config,
    )
    from ht_vllm_omni_tpu.engine.stage_factory import build_stages
    from ht_vllm_omni_tpu.entrypoints.omni import Omni
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    cfg = load_pipeline_config(builtin_pipeline_path("qwen2_5_omni"))
    tiny_arch = dict(
        model_type="qwen2", vocab_size=64, hidden_size=16,
        intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, dtype="float32",
        tie_word_embeddings=True, eos_token_id=60,
    )
    cfg.stage(0).engine_args["model_arch_config"] = dict(tiny_arch)
    cfg.stage(0).engine_args.pop("mm_encoder", None)
    cfg.stage(0).engine_args["num_pages"] = 64
    cfg.stage(1).engine_args["model_arch_config"] = dict(
        tiny_arch, vocab_size=72, eos_token_id=66,
    )
    cfg.stage(1).engine_args["num_pages"] = 64
    cfg.stage(1).default_sampling_params.update(
        stop_token_ids=[66], allowed_token_range=[0, 33], max_tokens=30,
    )
    cfg.stage(2).engine_args["token2wav"] = dict(
        dit=dict(
            mel_dim=8, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, head_dim=8, emb_dim=16,
            num_embeds=33, enc_dim=12, enc_emb_dim=6, block_size=4,
            look_ahead_layers=[1], look_backward_layers=[0],
            enc_channels=[8, 8, 8, 16], enc_kernel_sizes=[5, 3, 3, 1],
            enc_dilations=[1, 2, 3, 1], enc_res2net_scale=2,
            enc_se_channels=4, enc_attention_channels=4,
        ),
        bigvgan=dict(
            mel_dim=8, upsample_initial_channel=16,
            upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4],
            resblock_kernel_sizes=[3],
            resblock_dilation_sizes=[[1, 3, 5]],
        ),
        num_steps=2,
    )
    omni = Omni(pipeline=cfg, stages=build_stages(cfg))
    sp = SamplingParams(
        temperature=0.0, max_tokens=10, ignore_eos=True,
        allowed_token_range=(0, 33),
    )
    outs = omni.generate([[3, 7, 11]], sp)
    audio = outs[0].consolidated_multimodal("audio")
    assert audio is not None and len(audio) > 0
    assert np.isfinite(np.asarray(audio, np.float32)).all()
