"""MiMo-Audio family: local-decode parity vs a step-by-step replay of
the reference base_local_forward loop, reembed invariants, step-adapter
in-loop == edge-expand, code2wav ISTFT parity vs torch, pipeline e2e."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.models.mimo_audio import code2wav, local_model
from ht_vllm_omni_tpu.models.mimo_audio.config import (
    MiMoAudioAdapterConfig,
    MiMoCode2WavConfig,
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def acfg():
    return MiMoAudioAdapterConfig.tiny()


@pytest.fixture(scope="module")
def params(acfg):
    return local_model.init_params(acfg, jax.random.PRNGKey(0))


# ------------------------------------------------------------ local trunk
def test_trunk_step_matches_full(acfg, params):
    lc = acfg.local
    s, t = 2, 5
    xs = jax.random.normal(jax.random.PRNGKey(1), (s, t, lc.dim)) * 0.1
    full = local_model.trunk_forward(lc, params["local"], xs, causal=True)

    kv_k = jnp.zeros((lc.layers, s, t, lc.dim))
    kv_v = jnp.zeros_like(kv_k)
    outs = []
    for i in range(t):
        h, kv_k, kv_v = local_model._trunk_step(
            lc, params["local"], xs[:, i], kv_k, kv_v, i
        )
        outs.append(h)
    inc = jnp.stack(outs, 1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(inc), rtol=2e-4, atol=2e-4
    )


def _replay_local_decode(acfg, p, seed_emb):
    """Reference base_local_forward replay (mimo_audio_llm.py:787-839):
    full causal re-forward each iteration + greedy per-channel heads
    under the delay pattern, empty id masked out."""
    g, c = acfg.group_size, acfg.audio_channels
    s = seed_emb.shape[0]
    codes = np.full((s, g, c), 0, np.int64)
    for si in range(s):
        xs = [np.asarray(seed_emb[si], np.float32)]
        for t in range(acfg.delay_iters):
            h = local_model.trunk_forward(
                acfg.local, p["local"],
                jnp.asarray(np.stack(xs))[None], causal=True,
            )[0, -1]
            h = np.asarray(h)
            nxt = np.zeros_like(xs[0])
            for idx in range(c):
                d0 = acfg.delay_pattern[idx]
                if not (d0 <= t < d0 + g):
                    continue
                w = np.asarray(p["lm_heads"][idx], np.float32)
                scores = h @ w
                scores[acfg.speech_empty_ids[idx]] = -np.inf
                scores[acfg.speech_vocab_sizes[idx]:] = -np.inf
                tok = int(np.argmax(scores))
                codes[si, t - d0, idx] = tok
                e = np.asarray(p["speech_emb"][idx][tok], np.float32)
                if "emb_to_local" in p:
                    e = e @ np.asarray(p["emb_to_local"], np.float32)
                nxt += e
            xs.append(nxt)
    # channels that never fired in a frame hold the empty id
    return codes


def test_local_decode_matches_reference_replay(acfg, params):
    seed = jax.random.normal(
        jax.random.PRNGKey(2), (2, acfg.local.dim)
    ) * 0.3
    ours = np.asarray(local_model.local_decode(acfg, params, seed))
    ref = _replay_local_decode(acfg, params, seed)
    np.testing.assert_array_equal(ours, ref)
    # every code in its channel's live vocab, never the empty id
    for idx in range(acfg.audio_channels):
        ch = ours[:, :, idx]
        assert (ch < acfg.speech_vocab_sizes[idx]).all()
        assert (ch != acfg.speech_empty_ids[idx]).all()


def test_reembed_zero_for_all_empty(acfg, params):
    empty = np.asarray(acfg.speech_empty_ids)
    codes = np.broadcast_to(
        empty[None, None], (2, acfg.group_size, acfg.audio_channels)
    ).copy()
    fb = np.asarray(
        local_model.reembed(acfg, params, jnp.asarray(codes))
    )
    np.testing.assert_allclose(fb, 0.0, atol=1e-6)
    # non-empty codes give non-zero feedback
    codes[0, 0, 0] = 1
    fb2 = np.asarray(
        local_model.reembed(acfg, params, jnp.asarray(codes))
    )
    assert np.abs(fb2[0]).max() > 0
    np.testing.assert_allclose(fb2[1], 0.0, atol=1e-6)


# ----------------------------------------------------------- step adapter
def _tiny_engine():
    from ht_vllm_omni_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelArchConfig,
        SchedulerConfig,
    )
    from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine

    arch = ModelArchConfig(
        model_type="qwen2", vocab_size=128, hidden_size=16,
        intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        attention_bias=False, dtype="float32", eos_token_id=2,
        tie_word_embeddings=True,
    )
    cfg = EngineConfig(
        model=arch,
        cache=CacheConfig(page_size=16, num_pages=32),
        scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=256),
        step_adapter_spec={
            "name": "mimo_audio",
            "adapter": {
                "group_size": 2, "audio_channels": 3,
                "speech_vocab_sizes": [17, 9, 9],
                "speech_empty_ids": [16, 8, 8],
                "delay_pattern": [0, 1, 2],
                "empty_token_id": 5,
                "local": {"dim": 16, "layers": 2, "heads": 2,
                          "ffn": 32},
                "input_local": {"dim": 16, "layers": 1, "heads": 2,
                                "ffn": 32},
            },
        },
    )
    return LLMEngine(cfg)


def test_step_adapter_inloop_matches_edge_expand():
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    eng = _tiny_engine()
    sp = SamplingParams(
        temperature=0.0, max_tokens=7, ignore_eos=True,
        return_hidden_states=True,
    )
    out = eng.generate([[5, 9, 11]], sp)[0]
    comp = out.outputs[0]
    assert comp.hidden_states is not None
    assert len(comp.hidden_states) == len(comp.token_ids)

    adapter = eng.runner.step_adapter
    patches = adapter.expand(np.asarray(comp.hidden_states, np.float32))
    assert patches.shape == (len(comp.token_ids), 2, 3)

    # the device aux row holds the LAST in-loop patch -> must equal the
    # edge recompute (greedy local decode is deterministic)
    aux = np.asarray(eng.runner.aux_state)[0]
    assert aux[0] == 1
    np.testing.assert_array_equal(
        aux[1:].reshape(2, 3), patches[-1]
    )

    # determinism across a fresh engine
    eng2 = _tiny_engine()
    out2 = eng2.generate([[5, 9, 11]], sp)[0]
    np.testing.assert_allclose(
        np.asarray(out2.outputs[0].hidden_states),
        np.asarray(comp.hidden_states), rtol=1e-5, atol=1e-5,
    )


def test_adapter_embed_feedback_only_on_empty_token():
    eng = _tiny_engine()
    adapter = eng.runner.step_adapter
    params = eng.runner.params
    aux = np.zeros((2, adapter.aux_width), np.int32)
    aux[:, 0] = 1
    aux[:, 1:] = 1  # some non-empty codes
    toks = jnp.asarray([5, 9], jnp.int32)  # empty vs plain token
    emb = np.asarray(adapter.embed(params, toks, jnp.asarray(aux)))
    from ht_vllm_omni_tpu.models import qwen2

    plain = np.asarray(qwen2.embed_tokens(params, toks))
    assert not np.allclose(emb[0], plain[0])  # feedback applied
    np.testing.assert_allclose(emb[1], plain[1])  # untouched


# --------------------------------------------------------------- code2wav
def test_istft_matches_torch_reference():
    """Our overlap-add ISTFT == the reference's irfft+fold version
    (modeling_audio_tokenizer.py:163-245)."""
    cfg = MiMoCode2WavConfig.tiny()
    n_fft, hop, t = cfg.n_fft, cfg.hop_length, 9
    rng = np.random.default_rng(0)
    re = rng.normal(size=(n_fft // 2 + 1, t)).astype(np.float32)
    im = rng.normal(size=(n_fft // 2 + 1, t)).astype(np.float32)
    ours = np.asarray(code2wav._istft(
        jnp.asarray(re), jnp.asarray(im), n_fft, hop
    ))

    spec = torch.from_numpy(re) + 1j * torch.from_numpy(im)
    window = torch.hann_window(n_fft, periodic=True)
    ifft = torch.fft.irfft(spec[None], n_fft, dim=1, norm="backward")
    ifft = ifft * window[None, :, None]
    out_size = (t - 1) * hop + n_fft
    y = torch.nn.functional.fold(
        ifft, output_size=(1, out_size), kernel_size=(1, n_fft),
        stride=(1, hop),
    )
    pad = (n_fft - hop) // 2
    y = y[:, 0, 0, pad:-pad]
    wsq = window.square().expand(1, t, -1).transpose(1, 2)
    env = torch.nn.functional.fold(
        wsq, output_size=(1, out_size), kernel_size=(1, n_fft),
        stride=(1, hop),
    ).squeeze()[pad:-pad]
    ref = (y / env).numpy()[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_code2wav_shapes_and_stage_model():
    from ht_vllm_omni_tpu.models.mimo_audio.code2wav_model import (
        MiMoAudioCode2WavModel,
    )

    cfg = MiMoCode2WavConfig.tiny()
    model = MiMoAudioCode2WavModel(cfg, seed=0)
    t = 8
    codes = np.random.default_rng(1).integers(
        0, cfg.codebook_size, size=(cfg.num_quantizers, t)
    )
    out = model(None, None, {"codes": codes}, None)
    assert out["sample_rate"] == cfg.sampling_rate
    assert out["audio"].shape == (t * model.samples_per_frame,)
    assert np.isfinite(out["audio"]).all()
    # left-context trim
    out2 = model(None, None, {"codes": codes, "left_context": 2}, None)
    assert out2["audio"].shape == ((t - 2) * model.samples_per_frame,)
    np.testing.assert_allclose(
        out2["audio"], out["audio"][2 * model.samples_per_frame:],
        rtol=1e-5, atol=1e-6,
    )


# ------------------------------------------------------------ pipeline e2e
def test_pipeline_e2e_streaming_audio():
    from ht_vllm_omni_tpu.config.stage_config import (
        builtin_pipeline_path,
        load_pipeline_config,
    )
    from ht_vllm_omni_tpu.engine.stage_factory import build_stages
    from ht_vllm_omni_tpu.entrypoints.omni import Omni
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    cfg = load_pipeline_config(builtin_pipeline_path("mimo_audio"))
    st0 = cfg.stage(0)
    st0.engine_args["model_arch_config"] = dict(
        model_type="qwen2", vocab_size=128, hidden_size=16,
        intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        attention_bias=False, dtype="float32", tie_word_embeddings=True,
        eos_token_id=2,
    )
    st0.engine_args["num_pages"] = 64
    st0.engine_args["step_adapter"] = {
        "name": "mimo_audio",
        "adapter": {
            "group_size": 2, "audio_channels": 3,
            "speech_vocab_sizes": [17, 9, 9],
            "speech_empty_ids": [16, 8, 8],
            "delay_pattern": [0, 1, 2],
            "empty_token_id": 0,
            "local": {"dim": 16, "layers": 2, "heads": 2, "ffn": 32},
            "input_local": {"dim": 16, "layers": 1, "heads": 2,
                            "ffn": 32},
        },
    }
    cfg.stage(1).engine_args["code2wav"] = dict(
        num_quantizers=3, codebook_size=17, d_model=16,
        decoder_layers=1, decoder_heads=2, decoder_ffn=32, n_mels=8,
        vocos_layers=1, vocos_heads=2, vocos_ffn=32, n_fft=16,
        hop_length=4,
    )
    stages = build_stages(cfg)
    # zero the tied embed/LM-head: every greedy logit ties at 0 so the
    # argmax token is id 0 == the spec's empty token, i.e. the whole
    # stream is speech steps (with trained weights the model emits
    # <|empty|> through speech spans on its own)
    eng0 = stages[0].engine
    eng0.runner.params["embed"] = eng0.runner.params["embed"] * 0.0
    omni = Omni(pipeline=cfg, stages=stages)
    sp = SamplingParams(
        temperature=0.0, max_tokens=10, ignore_eos=True,
        return_hidden_states=True,
    )
    outs = omni.generate([[3, 7, 11]], sp)
    audio = outs[0].consolidated_multimodal("audio")
    assert audio is not None and len(audio) > 0
    assert np.isfinite(np.asarray(audio, np.float32)).all()
