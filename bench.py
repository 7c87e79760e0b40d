"""Headline benchmark: AR decode throughput per chip.

Measures steady-state batched decode (tokens/s/chip) of a
Qwen2.5-0.5B-shaped bf16 model (BASELINE.json config 1) with the full
engine loop (paged KV, continuous batching, on-device sampling).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against 3000 tok/s — a vLLM-on-A100 ballpark for the
same 0.5B bf16 model at batch 8 (the reference publishes no directly
comparable number; its Qwen3-Omni TPOT table is for a 3-stage 30B MoE
pipeline on H800, BASELINE.md).
"""

import json
import time

BASELINE_TOKS_PER_S = 3000.0


def main() -> None:
    import numpy as np

    from ht_vllm_omni_tpu.config import (
        CacheConfig,
        EngineConfig,
        ModelArchConfig,
        SchedulerConfig,
    )
    from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    batch = 8
    decode_tokens = 256
    cfg = ModelArchConfig()  # defaults = Qwen2.5-0.5B shape, bf16
    engine = LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=128, num_pages=1024),
            scheduler=SchedulerConfig(max_num_seqs=batch, max_model_len=2048),
        ),
        # throughput-tuned: one long device-resident chunk amortises the
        # per-chunk host sync + dispatch (~30 ms on a tunneled link);
        # serving deployments trade this down for streaming granularity
        decode_horizon=256,
    )
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(0, 1000, size=64)) for _ in range(batch)]
    sp = SamplingParams(
        temperature=0.0, max_tokens=decode_tokens, ignore_eos=True
    )
    # warmup (compiles — run the full decode length so every live-page
    # width bucket the timed run will hit is already compiled)
    engine.generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=decode_tokens,
                                ignore_eos=True)
    )
    t0 = time.time()
    outs = engine.generate(prompts, sp)
    dt = time.time() - t0
    total = sum(len(o.outputs[0].token_ids) for o in outs)
    assert total == batch * decode_tokens, total
    toks_per_s = total / dt
    print(
        json.dumps(
            {
                "metric": "qwen2.5-0.5b-bf16 decode throughput (bs8, chunked engine)",
                "value": round(toks_per_s, 1),
                "unit": "tok/s/chip",
                "vs_baseline": round(toks_per_s / BASELINE_TOKS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
