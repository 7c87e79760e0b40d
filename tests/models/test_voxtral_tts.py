"""Voxtral TTS family: acoustic-flow + codec-decoder parity vs torch
replicas of the reference modules, in-loop adapter vs stage-edge code
reproduction, and pipeline e2e."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.models.voxtral_tts import acoustic_flow, codec
from ht_vllm_omni_tpu.models.voxtral_tts.config import (
    AcousticFlowConfig,
    NUM_SPECIAL,
    VoxtralCodecConfig,
)

torch = pytest.importorskip("torch")


TINY_FLOW = AcousticFlowConfig(
    input_dim=16, dim=32, n_layers=2, head_dim=8, hidden_dim=64,
    n_heads=4, n_kv_heads=2, semantic_codebook_size=50,
    acoustic_codebook_size=5, n_acoustic_codebook=6, decode_iters=4,
)

TINY_CODEC = VoxtralCodecConfig(
    patch_size=4, patch_proj_kernel_size=3, semantic_codebook_size=20,
    semantic_dim=6, acoustic_codebook_size=5, acoustic_dim=4,
    dim=16, hidden_dim=32, head_dim=4, n_heads=4, n_kv_heads=2,
    decoder_transformer_lengths=(1, 1, 1, 1),
)


def _torch_flow_decode(cfg, params, llm_hidden, x0):
    """Replica of FlowMatchingAudioTransformer.forward + decode_one_frame
    (reference voxtral_tts_audio_generation.py:393-607) with injected
    flow noise x0."""
    import torch.nn.functional as F

    p = {k: torch.from_numpy(np.asarray(v, np.float32))
         for k, v in params.items()}
    h_llm = torch.from_numpy(np.asarray(llm_hidden, np.float32))
    n = h_llm.shape[0]

    def rms(x, w, eps=cfg.norm_eps):
        v = x.pow(2).mean(-1, keepdim=True)
        return w * (x * torch.rsqrt(v + eps))

    def blocks(x):
        nq, nk, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
        for li in range(cfg.n_layers):
            h = rms(x, p["ln1"][li])
            b, s, _ = h.shape
            q = (h @ p["wq"][li]).view(b, s, nq, hd)
            k = (h @ p["wk"][li]).view(b, s, nk, hd)
            v = (h @ p["wv"][li]).view(b, s, nk, hd)
            k = k.repeat_interleave(nq // nk, dim=2)
            v = v.repeat_interleave(nq // nk, dim=2)
            att = torch.softmax(
                torch.einsum("bqhd,bkhd->bhqk", q, k) * hd**-0.5, -1
            )
            o = torch.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s, -1)
            x = x + o @ p["wo"][li]
            h = rms(x, p["ln2"][li])
            x = x + (F.silu(h @ p["w1"][li]) * (h @ p["w3"][li])) @ p["w2"][li]
        return x

    def velocity(x_t, llm, t_emb):
        toks = torch.stack(
            [x_t @ p["w_input"], t_emb @ p["w_time"], llm @ p["w_llm"]],
            dim=1,
        )
        h = rms(blocks(toks), p["norm"])
        return h[:, 0] @ p["w_ac_out"]

    # semantic head: masked argmax
    logits = h_llm @ p["w_sem_out"]
    logits[:, 0] = -float("inf")
    logits[:, NUM_SPECIAL + cfg.semantic_codebook_size:] = -float("inf")
    sem = logits.argmax(-1)

    ts = torch.linspace(0, 1, cfg.decode_iters)
    sampled = torch.from_numpy(np.asarray(x0, np.float32))
    zero = torch.zeros_like(h_llm)
    for i in range(cfg.decode_iters - 1):
        t, dt = ts[i], ts[i + 1] - ts[i]
        emb = t.view(-1, 1).repeat(n, 1) @ p["time_inv_freq"][None, :]
        t_emb = torch.cat([emb.cos(), emb.sin()], -1)
        v = velocity(
            torch.cat([sampled, sampled]),
            torch.cat([h_llm, zero]),
            torch.cat([t_emb, t_emb]),
        )
        v = cfg.cfg_alpha * v[:n] + (1 - cfg.cfg_alpha) * v[n:]
        sampled = sampled + v * dt
    sampled = sampled.clamp(-1, 1)
    ac = (((sampled + 1) / 2) * (cfg.acoustic_codebook_size - 1)).round()
    ac = ac.long()
    ac[sem == 1] = 0
    return torch.cat([sem[:, None], ac + NUM_SPECIAL], 1).numpy()


def test_acoustic_flow_parity_vs_torch():
    cfg = TINY_FLOW
    params = acoustic_flow.init_params(cfg, jax.random.PRNGKey(0))
    h = np.random.default_rng(1).normal(size=(3, cfg.input_dim))
    h = h.astype(np.float32)
    keys = acoustic_flow.frame_keys(7, jnp.asarray([4, 5, 6]))
    codes = np.asarray(
        acoustic_flow.decode_frames(cfg, params, jnp.asarray(h), keys)
    )
    # replay the exact same flow noise through the torch replica
    x0 = cfg.noise_scale * np.asarray(
        jax.vmap(
            lambda k: jax.random.normal(k, (cfg.n_acoustic_codebook,))
        )(keys)
    )
    ref = _torch_flow_decode(cfg, params, h, x0)
    np.testing.assert_array_equal(codes, ref)


def _torch_codec_decode(cfg, params, latent):
    """Replica of VoxtralTTSAudioTokenizer._forward_decoder (reference
    voxtral_tts_audio_tokenizer.py:1086) over the same params."""
    import math

    import torch.nn.functional as F

    p = {k: torch.from_numpy(np.asarray(v, np.float32))
         for k, v in params.items()}
    x = torch.from_numpy(np.asarray(latent, np.float32))  # [B, T, C]

    def causal_conv(x, w, pad_mode):
        # reference CausalConv1d.forward: pad_total left + extra right
        wt = w.permute(2, 1, 0)  # [k,in,out] -> [out,in,k]
        k = wt.shape[-1]
        stride, pad_total = 1, k - 1
        xc = x.transpose(1, 2)  # [B, C, T]
        n_frames = (xc.shape[-1] - k + pad_total) / stride + 1
        target = (math.ceil(n_frames) - 1) * stride + (k - pad_total)
        extra = target - xc.shape[-1]
        xc = F.pad(xc, (pad_total, extra), mode=pad_mode)
        return F.conv1d(xc, wt).transpose(1, 2)

    def conv_transpose(x, w, stride):
        wt = w.permute(1, 2, 0)  # [k,in,out] -> [in,out,k]
        k = wt.shape[-1]
        out = F.conv_transpose1d(x.transpose(1, 2), wt, stride=stride)
        total = k - stride
        return out[..., : out.shape[-1] - total].transpose(1, 2)

    def rms(x, w, eps):
        v = x.pow(2).mean(-1, keepdim=True)
        return w * (x * torch.rsqrt(v + eps))

    def attention(x, li, window):
        nq, nk, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
        q, k, v = x @ p["wq"][li], x @ p["wk"][li], x @ p["wv"][li]
        q = rms(q, p["q_norm"][li], cfg.qk_norm_eps)
        k = rms(k, p["k_norm"][li], cfg.qk_norm_eps)
        b, t, _ = x.shape
        q = q.view(b, t, nq, hd).transpose(1, 2)
        k = k.view(b, t, nk, hd).transpose(1, 2)
        v = v.view(b, t, nk, hd).transpose(1, 2)
        k = k.repeat_interleave(nq // nk, dim=1)
        v = v.repeat_interleave(nq // nk, dim=1)
        pos = torch.arange(t)
        rel = pos[None, :] - pos[:, None]
        slopes = torch.from_numpy(codec._alibi_slopes(nq))
        bias = slopes.view(nq, 1, 1) * rel[None].float()
        bias = bias.masked_fill(rel[None] > 0, -float("inf"))
        bias = bias.masked_fill(rel[None] < -window, -float("inf"))
        o = F.scaled_dot_product_attention(q, k, v, attn_mask=bias[None])
        o = o.transpose(1, 2).reshape(b, t, nq * hd)
        return o @ p["wo"][li]

    def layer(x, li, window):
        r = attention(rms(x, p["ln1"][li], cfg.norm_eps), li, window)
        x = x + p["attn_scale"][li] * r
        h = rms(x, p["ln2"][li], cfg.norm_eps)
        r = (F.silu(h @ p["w1"][li]) * (h @ p["w3"][li])) @ p["w2"][li]
        return x + p["ffn_scale"][li] * r

    x = causal_conv(x, p["conv_in"], "replicate")
    wins = codec.layer_windows(cfg)
    li = up = 0
    n_groups = len(cfg.decoder_transformer_lengths)
    for g in range(n_groups):
        for _ in range(cfg.decoder_transformer_lengths[g]):
            x = layer(x, li, wins[li])
            li += 1
        if g + 1 < n_groups:
            x = conv_transpose(
                x, p["upconvs"][up], cfg.decoder_convs_strides[g + 1]
            )
            up += 1
    x = causal_conv(x, p["conv_out"], "reflect")
    b, t, h = x.shape
    return x.reshape(b, t * h).numpy()


def test_codec_decoder_parity_vs_torch():
    cfg = TINY_CODEC
    params = codec.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    latent = rng.normal(size=(2, 6, cfg.latent_dim)).astype(np.float32)
    wav = np.asarray(codec.decode_latent(cfg, params, jnp.asarray(latent)))
    ref = _torch_codec_decode(cfg, params, latent)
    assert wav.shape == ref.shape == (2, 6 * cfg.downsample_factor)
    np.testing.assert_allclose(wav, ref, rtol=2e-4, atol=2e-4)


def test_codec_windows_follow_reference_construction():
    # encoder halves 16 -> 2; decoder doubles back 2,4,8,16
    assert VoxtralCodecConfig().decoder_windows == (2, 4, 8, 16)


def _tiny_engine(parallel=None):
    from ht_vllm_omni_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelArchConfig,
        ParallelConfig,
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
        scheduler=SchedulerConfig(
            max_num_seqs=2, max_model_len=256,
        ),
        parallel=parallel or ParallelConfig(),
        step_adapter_spec={
            "name": "voxtral_tts",
            "audio_token_id": 24,
            "eos_token_id": 2,
            "acoustic": {
                "dim": 32, "n_layers": 2, "n_heads": 4, "n_kv_heads": 2,
                "head_dim": 8, "hidden_dim": 64,
                "semantic_codebook_size": 50,
                "acoustic_codebook_size": 5, "n_acoustic_codebook": 6,
                "decode_iters": 4,
            },
        },
    )
    return LLMEngine(cfg)


def test_step_adapter_inloop_matches_edge_expand():
    """The invariant the whole design rests on: codes computed inside
    the compiled decode loop (feeding back into the next embedding)
    must equal codes regenerated at the stage edge from exported hidden
    states."""
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    eng = _tiny_engine()
    sp = SamplingParams(
        temperature=0.0, max_tokens=9, ignore_eos=True,
        return_hidden_states=True,
    )
    out = eng.generate([[5, 9, 11]], sp)[0]
    comp = out.outputs[0]
    # forced token stream: audio placeholders (EOS suppressed via
    # ignore_eos would still record token ids)
    assert set(comp.token_ids) <= {24, 2}
    assert comp.hidden_states is not None
    assert len(comp.hidden_states) == len(comp.token_ids)

    adapter = eng.runner.step_adapter
    n_prompt = 3
    codes = adapter.expand(
        np.asarray(comp.hidden_states, np.float32), n_prompt - 1
    )
    assert codes.shape == (len(comp.token_ids), 7)

    # the device aux row holds the LAST in-loop frame -> must equal the
    # edge recompute of the same frame (identical position-keyed noise)
    slot = 0
    aux = np.asarray(eng.runner.aux_state)[slot]
    assert aux[0] == 1
    np.testing.assert_array_equal(aux[1:], codes[-1])

    # determinism across a fresh engine: same request, same codes
    eng2 = _tiny_engine()
    out2 = eng2.generate([[5, 9, 11]], sp)[0]
    np.testing.assert_allclose(
        np.asarray(out2.outputs[0].hidden_states),
        np.asarray(comp.hidden_states), rtol=1e-5, atol=1e-5,
    )


def test_step_adapter_feedback_changes_trunk_inputs():
    """mm-code feedback must actually reach the trunk: zeroing the
    MultiVocab embedding table changes the hidden stream after the
    first decode step."""
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    sp = SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True,
        return_hidden_states=True,
    )
    eng = _tiny_engine()
    h1 = np.asarray(
        eng.generate([[5, 9, 11]], sp)[0].outputs[0].hidden_states
    )
    eng2 = _tiny_engine()
    eng2.runner.params["step_adapter/mm_embed"] = (
        eng2.runner.params["step_adapter/mm_embed"] * 0.0
    )
    h2 = np.asarray(
        eng2.generate([[5, 9, 11]], sp)[0].outputs[0].hidden_states
    )
    # first frame comes from the prompt (same), later frames diverge
    np.testing.assert_allclose(h1[0], h2[0], rtol=1e-5, atol=1e-6)
    assert not np.allclose(h1[1:], h2[1:])


def test_pipeline_e2e_streaming_audio():
    from ht_vllm_omni_tpu.config.stage_config import (
        builtin_pipeline_path,
        load_pipeline_config,
    )
    from ht_vllm_omni_tpu.engine.stage_factory import build_stages
    from ht_vllm_omni_tpu.entrypoints.omni import Omni
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    cfg = load_pipeline_config(builtin_pipeline_path("voxtral_tts"))
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
        "name": "voxtral_tts", "audio_token_id": 24, "eos_token_id": 2,
        "acoustic": {
            "dim": 32, "n_layers": 2, "n_heads": 4, "n_kv_heads": 2,
            "head_dim": 8, "hidden_dim": 64,
            "semantic_codebook_size": 20,
            "acoustic_codebook_size": 5, "n_acoustic_codebook": 4,
            "decode_iters": 3,
        },
    }
    cfg.stage(1).engine_args["codec"] = dict(
        patch_size=4, patch_proj_kernel_size=3,
        semantic_codebook_size=20, semantic_dim=6,
        acoustic_codebook_size=5, acoustic_dim=4,
        dim=16, hidden_dim=32, head_dim=4, n_heads=4, n_kv_heads=2,
        decoder_transformer_lengths=(1, 1, 1, 1),
    )
    omni = Omni(pipeline=cfg, stages=build_stages(cfg))
    sp = SamplingParams(
        temperature=0.0, max_tokens=12, ignore_eos=True,
        return_hidden_states=True,
    )
    outs = omni.generate([[3, 7, 11]], sp)
    audio = outs[0].consolidated_multimodal("audio")
    assert audio is not None and len(audio) > 0
    assert np.isfinite(np.asarray(audio, np.float32)).all()


def test_step_adapter_under_pipeline_parallelism():
    """Step adapters under pp>1 (worker/pp_programs.py): the adapter
    head runs on the last pp stage and its aux row rides the microbatch
    ring back to stage 0's adapter embedding — greedy codes must match
    the single-device engine exactly."""
    import jax

    from ht_vllm_omni_tpu.config import ParallelConfig
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    assert len(jax.devices()) >= 2
    sp = SamplingParams(
        temperature=0.0, max_tokens=9, ignore_eos=True,
        return_hidden_states=True,
    )
    prompts = [[5, 9, 12], [7, 3]]
    ref = _tiny_engine().generate(prompts, sp)
    eng = _tiny_engine(parallel=ParallelConfig(pipeline_parallel_size=2))
    got = eng.generate(prompts, sp)
    for r, g in zip(ref, got):
        assert r.outputs[0].token_ids == g.outputs[0].token_ids
        np.testing.assert_allclose(
            r.outputs[0].hidden_states, g.outputs[0].hidden_states,
            rtol=2e-5, atol=2e-5,
        )
