"""Build live stage engines from a PipelineConfig.

Counterpart of the reference's stage bring-up (reference
vllm_omni/engine/stage_init_utils.py + async_omni_engine._initialize_stages
:451-580) minus the process topology: every stage engine shares this
process and the jax runtime.
"""

from __future__ import annotations

import logging
from typing import Any

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.config.stage_config import (
    PipelineConfig,
    StageConfig,
    StageType,
)
from ht_vllm_omni_tpu.engine.orchestrator import StageHandle

logger = logging.getLogger(__name__)

# model_stage name -> callable(stage_cfg, model_path) -> engine
_GENERATION_BUILDERS: dict[str, Any] = {}


def _build_code2wav(cfg: StageConfig, model_path: str | None):
    from ht_vllm_omni_tpu.engine.generation_engine import GenerationEngine
    from ht_vllm_omni_tpu.models.tts.code2wav import (
        Code2WavConfig,
        Code2WavModel,
    )

    c2w = Code2WavConfig(**cfg.engine_args.get("code2wav", {}))
    return GenerationEngine(
        Code2WavModel(c2w),
        max_batch_size=cfg.engine_args.get("max_num_seqs", 1),
    )


def register_generation_model(name: str):
    def deco(fn):
        _GENERATION_BUILDERS[name] = fn
        return fn

    return deco


def engine_config_from_stage(
    cfg: StageConfig, model_path: str | None
) -> EngineConfig:
    args = dict(cfg.engine_args)
    arch_kwargs = args.pop("model_arch_config", {})
    model = (
        ModelArchConfig(**arch_kwargs)
        if arch_kwargs
        else None
    )
    if model is None:
        if model_path is not None:
            from ht_vllm_omni_tpu.models.loader import config_from_hf

            model = config_from_hf(model_path)
        else:
            raise ValueError(
                f"stage {cfg.stage_id}: need model_arch_config or model path"
            )
    sched = SchedulerConfig(
        max_num_seqs=args.get("max_num_seqs", 16),
        max_num_batched_tokens=args.get("max_num_batched_tokens", 8192),
        max_model_len=args.get("max_model_len", 4096),
    )
    cache = CacheConfig(
        page_size=args.get("page_size", 128),
        num_pages=args.get("num_pages"),
        kv_cache_dtype=args.get("kv_cache_dtype", "auto"),
        memory_utilization=args.get("gpu_memory_utilization", 0.9),
    )
    from ht_vllm_omni_tpu.config import ParallelConfig

    par = ParallelConfig(
        tensor_parallel_size=args.get("tensor_parallel_size", 1),
        data_parallel_size=args.get("data_parallel_size", 1),
        pipeline_parallel_size=args.get("pipeline_parallel_size", 1),
        expert_parallel_size=args.get("expert_parallel_size", 1),
        weight_sharding=args.get("weight_sharding", "replicated"),
    )
    return EngineConfig(
        model=model,
        cache=cache,
        scheduler=sched,
        parallel=par,
        model_path=args.get("model", model_path),
        seed=args.get("seed", 0),
        mm_encoder_spec=args.get("mm_encoder"),
        step_adapter_spec=args.get("step_adapter"),
    )


_GENERATION_BUILDERS["code2wav"] = _build_code2wav


def _build_qwen3_omni_code2wav(cfg: StageConfig, model_path: str | None):
    """Real Qwen3-Omni vocoder stage (models/qwen3_omni/code2wav.py)."""
    from ht_vllm_omni_tpu.engine.generation_engine import GenerationEngine
    from ht_vllm_omni_tpu.models.qwen3_omni import code2wav as c2w

    kwargs = dict(cfg.engine_args.get("code2wav", {}))
    for tup in ("upsampling_ratios", "upsample_rates"):
        if tup in kwargs:
            kwargs[tup] = tuple(kwargs[tup])
    c2w_cfg = c2w.Code2WavConfig(**kwargs)
    model = c2w.Qwen3OmniCode2WavModel(
        c2w_cfg, seed=cfg.engine_args.get("seed", 0)
    )
    cfg.runtime["code2wav_model"] = model
    return GenerationEngine(
        model, max_batch_size=cfg.engine_args.get("max_num_seqs", 1)
    )


_GENERATION_BUILDERS["qwen3_omni_code2wav"] = _build_qwen3_omni_code2wav


def _build_fish_speech_dac(cfg: StageConfig, model_path: str | None):
    """Fish-Speech DAC decode stage (models/fish_speech/dac_model.py)."""
    from ht_vllm_omni_tpu.engine.generation_engine import GenerationEngine
    from ht_vllm_omni_tpu.models.fish_speech.dac_decoder import (
        DacDecoderConfig,
    )
    from ht_vllm_omni_tpu.models.fish_speech.dac_model import (
        FishSpeechDacModel,
    )

    kwargs = dict(cfg.engine_args.get("dac", {}))
    if "upsampling_ratios" in kwargs:
        kwargs["upsampling_ratios"] = tuple(kwargs["upsampling_ratios"])
    sample_rate = kwargs.pop("sample_rate", 44100)
    model = FishSpeechDacModel(
        DacDecoderConfig(**kwargs),
        seed=cfg.engine_args.get("seed", 0),
        sample_rate=sample_rate,
    )
    cfg.runtime["dac_model"] = model
    return GenerationEngine(
        model, max_batch_size=cfg.engine_args.get("max_num_seqs", 1)
    )


_GENERATION_BUILDERS["fish_speech_dac"] = _build_fish_speech_dac


def _build_cosyvoice3_code2wav(cfg: StageConfig, model_path: str | None):
    """CosyVoice3 CFM flow + HiFT vocoder stage
    (models/cosyvoice3/code2wav_model.py)."""
    from ht_vllm_omni_tpu.engine.generation_engine import GenerationEngine
    from ht_vllm_omni_tpu.models.cosyvoice3.code2wav_model import (
        CosyVoice3Code2WavModel,
    )
    from ht_vllm_omni_tpu.models.cosyvoice3.config import (
        CosyVoice3Config,
        FlowConfig,
        HiftConfig,
    )

    spec = dict(cfg.engine_args.get("code2wav", {}))
    fkw = dict(spec.get("flow", {}))
    hkw = dict(spec.get("hift", {}))
    for tkey in (
        "upsample_rates", "upsample_kernel_sizes",
        "resblock_kernel_sizes", "source_resblock_kernel_sizes",
    ):
        if tkey in hkw:
            hkw[tkey] = tuple(hkw[tkey])
    for tkey in ("resblock_dilation_sizes", "source_resblock_dilation_sizes"):
        if tkey in hkw:
            hkw[tkey] = tuple(tuple(v) for v in hkw[tkey])
    model = CosyVoice3Code2WavModel(
        CosyVoice3Config(flow=FlowConfig(**fkw), hift=HiftConfig(**hkw)),
        seed=cfg.engine_args.get("seed", 0),
    )
    cfg.runtime["code2wav_model"] = model
    return GenerationEngine(
        model, max_batch_size=cfg.engine_args.get("max_num_seqs", 1)
    )


_GENERATION_BUILDERS["cosyvoice3_code2wav"] = _build_cosyvoice3_code2wav


def _build_voxtral_tts_codec(cfg: StageConfig, model_path: str | None):
    """Voxtral TTS audio-tokenizer decoder stage
    (models/voxtral_tts/codec.py)."""
    from ht_vllm_omni_tpu.engine.generation_engine import GenerationEngine
    from ht_vllm_omni_tpu.models.voxtral_tts.codec import VoxtralCodecModel
    from ht_vllm_omni_tpu.models.voxtral_tts.config import (
        VoxtralCodecConfig,
    )

    kwargs = dict(cfg.engine_args.get("codec", {}))
    for tkey in (
        "encoder_convs_strides", "decoder_transformer_lengths",
        "decoder_convs_kernels", "decoder_convs_strides",
    ):
        if tkey in kwargs:
            kwargs[tkey] = tuple(kwargs[tkey])
    model = VoxtralCodecModel(
        VoxtralCodecConfig(**kwargs), seed=cfg.engine_args.get("seed", 0)
    )
    cfg.runtime["codec_model"] = model
    return GenerationEngine(
        model, max_batch_size=cfg.engine_args.get("max_num_seqs", 1)
    )


_GENERATION_BUILDERS["voxtral_tts_codec"] = _build_voxtral_tts_codec


def _build_mimo_audio_code2wav(cfg: StageConfig, model_path: str | None):
    """MiMo-Audio tokenizer-decoder stage
    (models/mimo_audio/code2wav_model.py)."""
    from ht_vllm_omni_tpu.engine.generation_engine import GenerationEngine
    from ht_vllm_omni_tpu.models.mimo_audio.code2wav_model import (
        MiMoAudioCode2WavModel,
    )
    from ht_vllm_omni_tpu.models.mimo_audio.config import (
        MiMoCode2WavConfig,
    )

    kwargs = dict(cfg.engine_args.get("code2wav", {}))
    model = MiMoAudioCode2WavModel(
        MiMoCode2WavConfig(**kwargs), seed=cfg.engine_args.get("seed", 0)
    )
    cfg.runtime["code2wav_model"] = model
    return GenerationEngine(
        model, max_batch_size=cfg.engine_args.get("max_num_seqs", 1)
    )


_GENERATION_BUILDERS["mimo_audio_code2wav"] = _build_mimo_audio_code2wav


def _build_qwen3_tts_code2wav_25hz(cfg: StageConfig, model_path):
    """Qwen3-TTS 25 Hz tokenizer decoder stage (v1: DiT flow + BigVGAN;
    models/qwen3_tts/tokenizer_decoders.py)."""
    from ht_vllm_omni_tpu.engine.generation_engine import GenerationEngine
    from ht_vllm_omni_tpu.models.qwen3_tts.tokenizer_decoders import (
        Qwen3TTSTokenizer25HzDecoder,
        v1_bigvgan_config,
        v1_dit_config,
    )

    spec = dict(cfg.engine_args.get("tokenizer_25hz", {}))
    model = Qwen3TTSTokenizer25HzDecoder(
        dit_cfg=v1_dit_config(**spec.get("dit", {})),
        bigvgan_cfg=v1_bigvgan_config(**spec.get("bigvgan", {})),
        seed=cfg.engine_args.get("seed", 0),
        num_steps=spec.get("num_steps", 10),
        guidance_scale=spec.get("guidance_scale", 0.5),
    )
    cfg.runtime["code2wav_model"] = model
    return GenerationEngine(
        model, max_batch_size=cfg.engine_args.get("max_num_seqs", 1)
    )


_GENERATION_BUILDERS["qwen3_tts_code2wav_25hz"] = (
    _build_qwen3_tts_code2wav_25hz
)


def _build_qwen3_tts_code2wav_12hz(cfg: StageConfig, model_path):
    """Qwen3-TTS 12.5 Hz tokenizer decoder stage (v2: causal
    pre-transformer + ConvNeXt + SnakeBeta decoder)."""
    from ht_vllm_omni_tpu.engine.generation_engine import GenerationEngine
    from ht_vllm_omni_tpu.models.qwen3_omni.code2wav import Code2WavConfig
    from ht_vllm_omni_tpu.models.qwen3_tts.tokenizer_decoders import (
        Qwen3TTSTokenizer12HzDecoder,
    )

    spec = dict(cfg.engine_args.get("tokenizer_12hz", {}))
    for tkey in ("upsampling_ratios", "upsample_rates"):
        if tkey in spec:
            spec[tkey] = tuple(spec[tkey])
    model = Qwen3TTSTokenizer12HzDecoder(
        cfg=Code2WavConfig(**spec),
        seed=cfg.engine_args.get("seed", 0),
    )
    cfg.runtime["code2wav_model"] = model
    return GenerationEngine(
        model, max_batch_size=cfg.engine_args.get("max_num_seqs", 1)
    )


_GENERATION_BUILDERS["qwen3_tts_code2wav_12hz"] = (
    _build_qwen3_tts_code2wav_12hz
)


def _build_qwen2_5_omni_token2wav(cfg: StageConfig, model_path: str | None):
    """Qwen2.5-Omni DiT + BigVGAN stage
    (models/qwen2_5_omni/token2wav_model.py)."""
    from ht_vllm_omni_tpu.engine.generation_engine import GenerationEngine
    from ht_vllm_omni_tpu.models.qwen2_5_omni.config import (
        BigVGANConfig,
        DiTConfig,
        Token2WavConfig,
    )
    from ht_vllm_omni_tpu.models.qwen2_5_omni.token2wav_model import (
        Qwen2_5OmniToken2WavModel,
    )

    spec = dict(cfg.engine_args.get("token2wav", {}))
    dkw = dict(spec.pop("dit", {}))
    bkw = dict(spec.pop("bigvgan", {}))
    for tkey in (
        "look_ahead_layers", "look_backward_layers", "enc_channels",
        "enc_kernel_sizes", "enc_dilations",
    ):
        if tkey in dkw:
            dkw[tkey] = tuple(dkw[tkey])
    for tkey in ("upsample_rates", "upsample_kernel_sizes",
                 "resblock_kernel_sizes"):
        if tkey in bkw:
            bkw[tkey] = tuple(bkw[tkey])
    if "resblock_dilation_sizes" in bkw:
        bkw["resblock_dilation_sizes"] = tuple(
            tuple(v) for v in bkw["resblock_dilation_sizes"]
        )
    t2w = Token2WavConfig(
        dit=DiTConfig(**dkw), bigvgan=BigVGANConfig(**bkw),
        sample_rate=spec.pop("sample_rate", 24000),
    )
    model = Qwen2_5OmniToken2WavModel(
        t2w, seed=cfg.engine_args.get("seed", 0), **spec
    )
    cfg.runtime["token2wav_model"] = model
    return GenerationEngine(
        model, max_batch_size=cfg.engine_args.get("max_num_seqs", 1)
    )


_GENERATION_BUILDERS["qwen2_5_omni_token2wav"] = (
    _build_qwen2_5_omni_token2wav
)


def _attach_fast_ar(cfg: StageConfig, engine) -> None:
    """Build the Fish-Speech Fast AR (residual-codebook predictor) and
    hang it on the slow-AR stage config so the fish_speech_slow2dac
    processor can expand codes."""
    import jax as _jax

    from ht_vllm_omni_tpu.models.fish_speech import fast_ar as fa
    from ht_vllm_omni_tpu.models.fish_speech.config import (
        FishSpeechFastConfig,
    )

    spec = dict(cfg.engine_args["fast_ar"])
    fcfg = FishSpeechFastConfig(**spec)
    params = fa.init_params(
        fcfg, _jax.random.PRNGKey(cfg.engine_args.get("seed", 0) + 11)
    )
    cfg.runtime["fast_ar"] = fa.FastARRuntime(fcfg, params)


def _attach_code_predictor(cfg: StageConfig, engine) -> None:
    """Build the talker's MTP residual-code predictor and hang it on the
    stage config so the talker2code2wav processor can expand codes
    (models/stage_input_processors.py)."""
    from ht_vllm_omni_tpu.models.qwen3_omni import code_predictor as cp

    spec = dict(cfg.engine_args["code_predictor"])
    pcfg = cp.CodePredictorConfig(**spec)
    params = cp.init_params(
        pcfg, __import__("jax").random.PRNGKey(
            cfg.engine_args.get("seed", 0) + 7
        )
    )
    cfg.runtime["code_predictor"] = cp.CodePredictorRuntime(
        pcfg, params, engine.runner.params["embed"]
    )


def build_stages(
    pipeline: PipelineConfig, model_path: str | None = None
) -> list[StageHandle]:
    handles: list[StageHandle] = []
    for cfg in pipeline.stages:
        if cfg.stage_type == StageType.DIFFUSION:
            from ht_vllm_omni_tpu.diffusion.engine_adapter import (
                build_diffusion_stage,
            )

            engine = build_diffusion_stage(cfg, model_path)
        elif cfg.worker_type == "generation":
            builder = _GENERATION_BUILDERS.get(cfg.model_stage)
            if builder is None:
                raise ValueError(
                    f"no generation model registered for {cfg.model_stage!r}"
                )
            engine = builder(cfg, model_path)
        else:
            from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine

            engine = LLMEngine(
                engine_config_from_stage(cfg, model_path),
                decode_horizon=cfg.engine_args.get("decode_horizon", 16),
                decode_horizon_max=cfg.engine_args.get(
                    "decode_horizon_max"
                ),
            )
            if "code_predictor" in cfg.engine_args:
                _attach_code_predictor(cfg, engine)
            if "fast_ar" in cfg.engine_args:
                _attach_fast_ar(cfg, engine)
            if engine.runner.step_adapter is not None:
                # stage edges regenerate per-frame codes from exported
                # hidden states through the same adapter
                cfg.runtime["step_adapter"] = engine.runner.step_adapter
        handles.append(StageHandle(cfg, engine))
    return handles
