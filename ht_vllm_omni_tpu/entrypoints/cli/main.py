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
        "--stage-override",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="per-stage engine arg override, e.g. stage_0.max_num_seqs=4",
    )


def main(argv: list[str] | None = None) -> None:
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(prog="ht-omni")
    sub = parser.add_subparsers(dest="command", required=True)
    _add_serve(sub)
    args = parser.parse_args(argv)

    if args.command == "serve":
        from ht_vllm_omni_tpu.config.stage_config import (
            apply_stage_overrides,
            load_pipeline_config,
        )
        from ht_vllm_omni_tpu.engine.async_omni_engine import AsyncOmniEngine
        from ht_vllm_omni_tpu.engine.stage_factory import build_stages
        from ht_vllm_omni_tpu.entrypoints.openai.api_server import run_server

        if args.pipeline:
            pipeline = load_pipeline_config(args.pipeline)
        else:
            from ht_vllm_omni_tpu.config.stage_config import (
                PipelineConfig,
                StageConfig,
            )

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
        overrides = {}
        for kv in args.stage_override:
            key, _, value = kv.partition("=")
            try:
                value = int(value)
            except ValueError:
                pass
            overrides[key] = value
        apply_stage_overrides(pipeline, overrides)
        stages = build_stages(pipeline, model_path=args.model)
        engine = AsyncOmniEngine(pipeline, stages)
        tokenizer = None
        for h in stages:
            tokenizer = getattr(h.engine, "tokenizer", None)
            if tokenizer is not None:
                break
        run_server(engine, tokenizer, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
