"""CLI: serve / generate (reference ``vllm serve <model> --omni``,
vllm_omni/entrypoints/cli/serve.py:45-63)."""

from __future__ import annotations

import argparse
import logging


def _add_serve(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("serve", help="start the OpenAI-compatible server")
    p.add_argument("model", nargs="?", help="HF checkpoint dir / model name")
    p.add_argument("--pipeline", help="pipeline.yaml path")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument(
        "--storage-dir",
        help="persist uploaded voices + video jobs here (survive "
        "server restarts; reference storage.py/stores.py)",
    )
    p.add_argument(
        "--stage-override",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="per-stage engine arg override, e.g. stage_0.max_num_seqs=4",
    )


def _add_generate(sub: argparse._SubParsersAction) -> None:
    """Offline one-shot generation (reference `vllm generate`-style use of
    the Omni offline API, entrypoints/omni.py:61)."""
    p = sub.add_parser("generate", help="offline generation via Omni")
    p.add_argument("model", nargs="?", help="HF checkpoint dir / model name")
    p.add_argument("--pipeline", help="pipeline.yaml path")
    p.add_argument(
        "--prompt", action="append", default=[], help="prompt text (repeat)"
    )
    p.add_argument("--max-tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--output-audio", help="write first audio output (WAV)")
    p.add_argument(
        "--stage-override", action="append", default=[], metavar="KEY=VALUE"
    )


def _add_bench(sub: argparse._SubParsersAction) -> None:
    """`vllm bench serve` equivalent (reference cli/benchmark/serve.py) —
    delegates to benchmarks/serve_bench.py's TTFP/RTF/ITL client."""
    p = sub.add_parser("bench", help="serving benchmark (TTFP/RTF/ITL)")
    p.add_argument("--base-url", default="http://127.0.0.1:8000")
    p.add_argument("--num-prompts", type=int, default=8)
    p.add_argument("--concurrency", type=int, default=1)
    p.add_argument("--mode", choices=["speech", "chat"], default="speech")
    p.add_argument("--max-tokens", type=int, default=64)


def _parse_overrides(pairs: list[str]) -> dict:
    overrides = {}
    for kv in pairs:
        key, _, value = kv.partition("=")
        try:
            value = int(value)
        except ValueError:
            pass
        overrides[key] = value
    return overrides


def _build_pipeline(args):
    from ht_vllm_omni_tpu.config.stage_config import (
        PipelineConfig,
        StageConfig,
        apply_stage_overrides,
        load_pipeline_config,
    )

    if args.pipeline:
        pipeline = load_pipeline_config(args.pipeline)
    else:
        pipeline = PipelineConfig(
            model_type="llm",
            stages=[
                StageConfig(
                    stage_id=0, model_stage="llm", worker_type="ar",
                    final_output=True, final_output_type="text",
                )
            ],
        )
        pipeline.validate()
    apply_stage_overrides(pipeline, _parse_overrides(args.stage_override))
    return pipeline


def main(argv: list[str] | None = None) -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(prog="ht-omni")
    sub = parser.add_subparsers(dest="command", required=True)
    _add_serve(sub)
    _add_generate(sub)
    _add_bench(sub)
    args = parser.parse_args(argv)

    if args.command == "serve":
        from ht_vllm_omni_tpu.engine.async_omni_engine import AsyncOmniEngine
        from ht_vllm_omni_tpu.engine.stage_factory import build_stages
        from ht_vllm_omni_tpu.entrypoints.openai.api_server import run_server

        pipeline = _build_pipeline(args)
        stages = build_stages(pipeline, model_path=args.model)
        engine = AsyncOmniEngine(pipeline, stages)
        tokenizer = None
        for h in stages:
            tokenizer = getattr(h.engine, "tokenizer", None)
            if tokenizer is not None:
                break
        run_server(
            engine, tokenizer, host=args.host, port=args.port,
            storage_dir=args.storage_dir,
        )

    elif args.command == "generate":
        from ht_vllm_omni_tpu.engine.stage_factory import build_stages
        from ht_vllm_omni_tpu.entrypoints.omni import Omni
        from ht_vllm_omni_tpu.sampling_params import SamplingParams

        pipeline = _build_pipeline(args)
        stages = build_stages(pipeline, model_path=args.model)
        omni = Omni(pipeline=pipeline, stages=stages)
        prompts = args.prompt or ["Hello"]
        tokenizer = None
        for h in stages:
            tokenizer = getattr(h.engine, "tokenizer", None)
            if tokenizer is not None:
                break
        inputs: list = []
        for text in prompts:
            if tokenizer is not None:
                inputs.append(tokenizer.encode(text))
            else:  # random-init / tokenizer-free configs: raw token ids
                inputs.append([int(t) for t in text.split()] or [1])
        sp = SamplingParams(
            temperature=args.temperature,
            top_k=args.top_k,
            max_tokens=args.max_tokens,
        )
        for text, out in zip(prompts, omni.generate(inputs, sp)):
            token_ids = out.outputs[0].token_ids if out.outputs else []
            decoded = (
                tokenizer.decode(token_ids) if tokenizer and token_ids
                else str(token_ids)
            )
            print(f"prompt: {text!r}\noutput: {decoded}")
            audio = out.consolidated_multimodal("audio")
            if audio is not None and args.output_audio:
                import numpy as np

                from ht_vllm_omni_tpu.entrypoints.openai.audio_utils import (
                    float_to_pcm16,
                    wav_header,
                )

                pcm = float_to_pcm16(np.asarray(audio).reshape(-1))
                with open(args.output_audio, "wb") as f:
                    f.write(wav_header(24000, data_size=len(pcm)))
                    f.write(pcm)
                print(f"audio written to {args.output_audio}")

    elif args.command == "bench":
        import importlib.util
        import pathlib
        import sys

        # benchmarks/ lives at the repo root, not inside the package
        root = pathlib.Path(__file__).resolve().parents[3]
        spec = importlib.util.spec_from_file_location(
            "serve_bench", root / "benchmarks" / "serve_bench.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.argv = [
            "serve_bench",
            "--base-url", args.base_url,
            "--num-prompts", str(args.num_prompts),
            "--concurrency", str(args.concurrency),
            "--mode", args.mode,
            "--max-tokens", str(args.max_tokens),
        ]
        mod.main()


if __name__ == "__main__":
    main()
