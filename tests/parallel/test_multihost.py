"""Multi-host (multi-controller) bring-up: two CPU processes form one
dp2 x tp2 mesh (dp = the DCN axis) and greedy decode must match the
single-process engine exactly (parallel/multihost.py)."""

import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest

import jax

REPO = Path(__file__).resolve().parent.parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_decode_matches_single_process():
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "examples/multihost_dryrun.py",
             str(pid), "2", str(port)],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        assert p.returncode == 0, out[-2000:]
        m = re.search(r"MULTIHOST_TOKENS rank=\d (\[.*\])", out)
        assert m, out[-2000:]
        outs.append(eval(m.group(1)))  # list-of-int-lists literal
    assert outs[0] == outs[1], (outs[0], outs[1])

    # single-process reference on the same dp2 x tp2 mesh shape
    from ht_vllm_omni_tpu.config import (
        CacheConfig, EngineConfig, ModelArchConfig, ParallelConfig,
        SchedulerConfig,
    )
    from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
    from ht_vllm_omni_tpu.models import qwen2
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=128, hidden_size=64,
        intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, dtype="float32",
        tie_word_embeddings=True, eos_token_id=1,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(7))
    eng = LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=16),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=64),
            parallel=ParallelConfig(
                tensor_parallel_size=2, data_parallel_size=2
            ),
        ),
        params=params, decode_horizon=4,
    )
    ref = eng.generate(
        [[2, 3, 4], [9, 8, 7, 6], [5, 4], [11, 12, 13]],
        SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True),
    )
    assert [o.outputs[0].token_ids for o in ref] == outs[0]


def test_host_locality_validation():
    from ht_vllm_omni_tpu.parallel import multihost
    from ht_vllm_omni_tpu.parallel.mesh import MeshConfig

    # single-process: validation is a no-op
    multihost.validate_host_locality(
        MeshConfig(tensor_parallel_size=8)
    )


def test_connector_for_peer_locality():
    from ht_vllm_omni_tpu.parallel.multihost import connector_for_peer

    assert connector_for_peer(None) == "SharedMemoryConnector"
    assert connector_for_peer("localhost") == "SharedMemoryConnector"
    assert connector_for_peer("10.0.0.7") == "TcpConnector"
