"""Two-process (multi-controller) decode dryrun on CPU devices.

Each process plays one "host" with 2 local devices; the global mesh is
dp2 (across the two processes, the DCN axis) x tp2 (intra-process).
Both run the SAME engine SPMD; the decode pack is all-gathered over dp
so each controller sees every request's tokens.  Prints one line of
greedy tokens — the launcher (tests/parallel/test_multihost.py)
asserts both processes agree with a single-process reference.

Usage: python examples/multihost_dryrun.py <process_id> <num_processes>
       [coordinator_port]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3] if len(sys.argv) > 3 else "9977"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from ht_vllm_omni_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelArchConfig,
        ParallelConfig,
        SchedulerConfig,
    )
    from ht_vllm_omni_tpu.parallel import multihost

    pcfg = ParallelConfig(
        tensor_parallel_size=2,
        data_parallel_size=2,
        num_processes=nproc,
        process_id=pid,
        coordinator_address=f"127.0.0.1:{port}",
    )
    # join the multi-controller runtime BEFORE any jax computation
    # (backend init is one-shot); the engine's own call is idempotent
    multihost.ensure_initialized(pcfg)
    from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
    from ht_vllm_omni_tpu.models import qwen2
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    cfg = ModelArchConfig(
        model_type="qwen2",
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        dtype="float32",
        tie_word_embeddings=True,
        eos_token_id=1,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(7))
    engine = LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=16),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=64),
            parallel=pcfg,
        ),
        params=params,
        decode_horizon=4,
    )
    assert jax.process_count() == nproc, jax.process_count()
    outs = engine.generate(
        [[2, 3, 4], [9, 8, 7, 6], [5, 4], [11, 12, 13]],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
    )
    toks = [o.outputs[0].token_ids for o in outs]
    print(f"MULTIHOST_TOKENS rank={pid} {toks}", flush=True)


if __name__ == "__main__":
    main()
