"""CLI subcommand tests (reference `vllm serve --omni` / `vllm bench serve`,
vllm_omni/entrypoints/cli/serve.py:45-63, cli/benchmark/serve.py)."""

from __future__ import annotations

import numpy as np

PIPELINE_YAML = """
model_type: llm
stages:
  - stage_id: 0
    model_stage: llm
    stage_type: llm
    worker_type: ar
    final_output: true
    final_output_type: text
    engine_args:
      max_num_seqs: 4
      max_model_len: 256
      num_pages: 32
      page_size: 16
      model_arch_config:
        model_type: qwen2
        vocab_size: 512
        hidden_size: 64
        intermediate_size: 128
        num_hidden_layers: 2
        num_attention_heads: 4
        num_key_value_heads: 2
        head_dim: 16
        dtype: float32
        eos_token_id: 1
"""


def test_cli_generate_offline(tmp_path, capsys):
    from ht_vllm_omni_tpu.entrypoints.cli.main import main

    ppath = tmp_path / "pipeline.yaml"
    ppath.write_text(PIPELINE_YAML)
    main(
        [
            "generate",
            "--pipeline", str(ppath),
            "--prompt", "5 6 7",
            "--max-tokens", "4",
        ]
    )
    out = capsys.readouterr().out
    assert "prompt: '5 6 7'" in out
    assert "output:" in out


def test_cli_generate_writes_wav(tmp_path, capsys, monkeypatch):
    """--output-audio path: patch Omni.generate to return one audio
    output and check a valid RIFF file lands on disk."""
    from ht_vllm_omni_tpu.entrypoints.cli import main as cli_main
    from ht_vllm_omni_tpu.outputs import OmniRequestOutput

    ppath = tmp_path / "pipeline.yaml"
    ppath.write_text(PIPELINE_YAML)
    wav_path = tmp_path / "out.wav"

    audio = np.sin(np.linspace(0, 40, 2400)).astype(np.float32)

    from ht_vllm_omni_tpu.outputs import CompletionOutput

    def fake_generate(self, prompts, sp):
        return [
            OmniRequestOutput(
                request_id="r0", finished=True, final_output=True,
                outputs=[CompletionOutput(index=0, token_ids=[3, 4])],
                multimodal_output={"audio": [audio]},
            )
            for _ in prompts
        ]

    from ht_vllm_omni_tpu.entrypoints.omni import Omni

    monkeypatch.setattr(Omni, "generate", fake_generate)
    cli_main.main(
        [
            "generate",
            "--pipeline", str(ppath),
            "--prompt", "1 2",
            "--output-audio", str(wav_path),
        ]
    )
    raw = wav_path.read_bytes()
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    assert len(raw) == 44 + 2 * len(audio)


def test_cli_parser_surface():
    """serve/generate/bench all parse their documented flags."""
    import argparse

    from ht_vllm_omni_tpu.entrypoints.cli.main import (
        _add_bench,
        _add_generate,
        _add_serve,
    )

    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="command")
    _add_serve(sub)
    _add_generate(sub)
    _add_bench(sub)
    args = parser.parse_args(
        ["serve", "m", "--port", "9000", "--stage-override", "a=1"]
    )
    assert args.port == 9000
    args = parser.parse_args(["bench", "--mode", "chat", "--concurrency", "4"])
    assert args.mode == "chat" and args.concurrency == 4
    args = parser.parse_args(["generate", "--prompt", "x", "--top-k", "5"])
    assert args.top_k == 5
