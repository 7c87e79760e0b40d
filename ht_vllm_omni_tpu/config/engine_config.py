from __future__ import annotations

import dataclasses

from ht_vllm_omni_tpu.utils import cdiv


@dataclasses.dataclass
class ModelArchConfig:
    """Transformer architecture hyper-parameters (HF-config compatible).

    Built either from a HF config.json (models/loader.py) or directly for
    tests/benchmarks with random weights.
    """

    model_type: str = "qwen2"
    vocab_size: int = 151936
    hidden_size: int = 896
    intermediate_size: int = 4864
    num_hidden_layers: int = 24
    num_attention_heads: int = 14
    num_key_value_heads: int = 2
    head_dim: int | None = None
    rope_theta: float = 1000000.0
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = True
    max_position_embeddings: int = 32768
    dtype: str = "bfloat16"
    # qwen3-style q/k RMSNorm
    qk_norm: bool = False
    attention_bias: bool = True
    # MoE (qwen3-moe style); 0 experts == dense
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    # Qwen2MoE-style always-on expert beside the routed ones (the
    # Qwen3-Omni talker uses this; 0 = absent)
    shared_expert_intermediate_size: int = 0
    # renormalise top-k router weights to sum 1 (HF norm_topk_prob)
    norm_topk_prob: bool = True
    # sliding window / misc left for later model families
    eos_token_id: int | list[int] = 151645
    bos_token_id: int | None = None
    # weight-only quantization: None | "int8" | "int4"
    quantization: str | None = None
    # also quantize the output head (tied embeddings get a separate
    # quantized head copy; the gather-side embedding stays fp).  At
    # decode the head is the single largest weight stream — on a 0.5B
    # model it is ~28% of all bytes/step — so this defaults ON;
    # per-channel int8 logits are accuracy-safe, flip off for
    # logprob-sensitive serving.
    quantize_lm_head: bool = True
    # M-RoPE half-dim section sizes (t, h, w); None = standard RoPE
    mrope_sections: tuple | None = None
    # GPT-J interleaved rotation (HF is_neox_style=False); Fish-Speech
    rope_interleaved: bool = False
    # rotate only the first head_dim * factor dims (GLM-4: 0.5)
    partial_rotary_factor: float = 1.0
    # GLM-4 sandwich norms: extra RMSNorm on the attention and MLP
    # deltas before each residual add (post_self_attn_layernorm /
    # post_mlp_layernorm)
    use_post_norms: bool = False
    # MammothModa2 dual-expert FFN (und/gen MLP per layer, routed by
    # token id >= gen_vocab_start; reference mammoth_moda2.py:201)
    use_gen_mlp: bool = False
    gen_vocab_start: int = 0
    image_token_id: int | None = None
    audio_token_id: int | None = None

    def __post_init__(self) -> None:
        if self.head_dim is None:
            self.head_dim = self.hidden_size // self.num_attention_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    @property
    def eos_token_ids(self) -> list[int]:
        e = self.eos_token_id
        return list(e) if isinstance(e, (list, tuple)) else [e]


@dataclasses.dataclass
class CacheConfig:
    """Paged KV cache layout.

    The reference inherits vLLM's block manager (16-token CUDA blocks);
    on TPU larger pages amortise DMA setup and line up with the (8,128)
    tile, so the default page is 64 tokens.
    """

    page_size: int = 128
    num_pages: int | None = None  # None: derived from gpu_memory_utilization
    kv_cache_dtype: str = "auto"  # "auto" | "bfloat16" | "float32" | "int8"
    # per-tensor symmetric scales for int8 KV (value = q * scale); folded
    # into the attention kernels as static constants
    kv_scale_k: float = 0.05
    kv_scale_v: float = 0.05
    memory_utilization: float = 0.9

    def pages_for(self, num_tokens: int) -> int:
        return cdiv(num_tokens, self.page_size)


@dataclasses.dataclass
class SchedulerConfig:
    """Continuous-batching limits (vLLM v1 scheduler semantics)."""

    max_num_seqs: int = 16
    max_num_batched_tokens: int = 8192
    max_model_len: int = 4096
    # chunked prefill: cap on tokens of a single prefill chunk.
    # None disables chunking (whole prompt in one pass).
    prefill_chunk_size: int | None = None
    # content-addressed page reuse across requests (vLLM prefix caching)
    enable_prefix_caching: bool = False

    @property
    def effective_prefill_chunk(self) -> int:
        return self.prefill_chunk_size or self.max_model_len


@dataclasses.dataclass
class ParallelConfig:
    """Intra-stage device mesh shape (axes over ICI).

    TPU-native counterpart of DiffusionParallelConfig /vLLM parallel args
    (reference vllm_omni/diffusion/data.py:34): instead of NCCL process
    groups, one jax.sharding.Mesh per stage with named axes.
    """

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    pipeline_parallel_size: int = 1
    # sequence parallel (Ulysses-style all_to_all over heads) for DiT
    sequence_parallel_size: int = 1
    cfg_parallel_size: int = 1
    expert_parallel_size: int = 1
    # "replicated" | "fsdp": fsdp additionally shards every stacked layer
    # weight over the dp axis and all-gathers it just-in-time inside the
    # layer scan (the reference's HSDP, distributed/hsdp.py:30 — shard
    # within the replica group, replicate across groups; here the mesh's
    # dp axis IS the shard group and XLA overlaps the gathers)
    weight_sharding: str = "replicated"
    # --- multi-host (DCN) SPMD: every process runs the same engine over
    # one global mesh (jax multi-controller).  The dp axis is leading,
    # so with process-ordered jax.devices() it is the axis that spans
    # hosts — dp traffic (none at inference steady state) rides DCN
    # while tp/pp/ep collectives stay on intra-host ICI
    # (parallel/multihost.py).  The reference reaches multi-node via
    # Ray + NCCL groups (vllm_omni serving args / mooncake transport).
    num_processes: int = 1
    process_id: int = 0
    coordinator_address: str | None = None  # "host:port" of process 0

    @property
    def world_size(self) -> int:
        return (
            self.tensor_parallel_size
            * self.data_parallel_size
            * self.pipeline_parallel_size
            * self.sequence_parallel_size
            * self.cfg_parallel_size
        )


@dataclasses.dataclass
class EngineConfig:
    """Everything one AR stage engine needs."""

    model: ModelArchConfig
    cache: CacheConfig = dataclasses.field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = dataclasses.field(
        default_factory=SchedulerConfig
    )
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)
    # path to HF checkpoint dir (safetensors); None = random init
    model_path: str | None = None
    seed: int = 0
    enforce_eager: bool = False
    # multimodal perception adapter spec, e.g.
    # {"name": "qwen3_omni", "vision": {...}, "audio": {...}} — resolved
    # by models/mm_registry.py; None = legacy mean-colour fallback
    mm_encoder_spec: dict | None = None
    # speculative decoding: number of Medusa-style draft tokens per
    # verification forward (0 = off).  Greedy-only; the engine falls back
    # to normal decode when a batch wants sampling or hidden states.
    spec_num_draft: int = 0
    # draft proposer: "medusa" (trained heads in params["spec_heads"],
    # random heads otherwise) or "ngram" (prompt-lookup: propose the
    # tokens that followed the last occurrence of the current bigram in
    # the sequence's own history — no extra weights, the reference's
    # vLLM ngram spec mode)
    spec_method: str = "medusa"
    # per-step decode adapter spec, e.g. {"name": "voxtral_tts", ...} —
    # resolved by worker/step_adapter.py.  Replaces the decode loop's
    # token embedding + logits sampling with model-specific hooks (the
    # reference's make_omni_output / embed_multimodal feedback,
    # vllm_omni voxtral_tts.py:286).  None = plain LM decode.
    step_adapter_spec: dict | None = None
