"""PD disaggregation: prefill on engine A, decode on engine B — the
token stream must match a single-engine run exactly (greedy).

Mirrors the reference's MockConnector KV-flow test strategy (reference
tests/distributed/omni_connectors/test_kv_flow.py)."""

import jax

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.distributed.connectors import OmniConnectorFactory
from ht_vllm_omni_tpu.distributed.kv_transfer import OmniKVTransferManager
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def _cfg():
    return ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=1,
    )


def _engine(params):
    return LLMEngine(
        EngineConfig(
            model=_cfg(),
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
        ),
        params=params,
        decode_horizon=4,
    )


def test_prefill_decode_disaggregation():
    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(21))
    prompt = [7, 3, 11, 30, 4]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)

    # reference: one engine does everything
    want = _engine(params).generate([prompt], sp)[0].outputs[0].token_ids

    # prefill instance: run exactly the prompt + first token
    prefill_engine = _engine(params)
    sp_pref = SamplingParams(temperature=0.0, max_tokens=1, ignore_eos=True)
    rid = prefill_engine.add_request(prompt, sp_pref, request_id="pd-0")
    prefill_engine.scheduler.requests[rid].needs_kv_transfer = True
    while prefill_engine.has_unfinished_requests():
        outs = prefill_engine.step()
    req = prefill_engine.scheduler.requests[rid]
    assert req.num_computed_tokens == len(prompt)

    mgr = OmniKVTransferManager(OmniConnectorFactory.create("MockConnector"))
    payload = mgr.extract(prefill_engine, rid)
    assert prefill_engine.scheduler.pool.num_free == 64  # pages released
    assert payload.kv_rows.shape[1] == len(prompt)
    assert len(payload.token_ids) == len(prompt) + 1
    mgr.put(0, 1, "pd-0", payload)

    # decode instance: import + continue, no prefill pass
    decode_engine = _engine(params)
    got_payload = mgr.get(0, 1, "pd-0")
    sp_dec = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    mgr.inject(decode_engine, got_payload, "pd-0", sp_dec)

    tokens = list(got_payload.token_ids[len(prompt):])  # first sampled
    while decode_engine.has_unfinished_requests():
        for out in decode_engine.step():
            if out.finished:
                tokens = out.outputs[0].token_ids
    assert tokens == want


def test_int8_kv_transfer_dequantizes_once():
    """Producer has an int8 KV cache: extract must hand over DEQUANTIZED
    rows so the consumer's flush quantizes exactly once (a second
    divide-by-scale corrupts the transfer)."""
    import numpy as np

    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(21))

    def int8_engine():
        return LLMEngine(
            EngineConfig(
                model=_cfg(),
                cache=CacheConfig(
                    page_size=16, num_pages=64, kv_cache_dtype="int8",
                    kv_scale_k=0.05, kv_scale_v=0.05,
                ),
                scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
            ),
            params=params,
            decode_horizon=4,
        )

    prompt = [7, 3, 11, 30, 4]
    sp1 = SamplingParams(temperature=0.0, max_tokens=1, ignore_eos=True)
    prefill_engine = int8_engine()
    rid = prefill_engine.add_request(prompt, sp1, request_id="pd-q")
    prefill_engine.scheduler.requests[rid].needs_kv_transfer = True
    while prefill_engine.has_unfinished_requests():
        prefill_engine.step()

    mgr = OmniKVTransferManager(OmniConnectorFactory.create("MockConnector"))
    payload = mgr.extract(prefill_engine, rid)
    # quantized producer ships RAW codes + scales (4x fewer wire bytes);
    # canonical rows stay unpadded [L, T, 2*KVH*D]
    assert payload.kv_rows.dtype == np.int8
    assert payload.kv_rows.shape[-1] == 2 * 2 * 32 // 4  # 2*KVH*D = 32
    assert payload.extra == {
        "kv_dtype": "int8", "k_scale": 0.05, "v_scale": 0.05,
    }

    # inject into a fresh int8 engine; its cache rows must equal the
    # producer's rows (quantized once with the same scales)
    decode_engine = int8_engine()
    sp2 = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    rid2 = mgr.inject(decode_engine, payload, "pd-q2", sp2)
    req = decode_engine.scheduler.requests[rid2]
    n = len(prompt)
    idx = np.arange(n)
    pages = np.asarray(req.page_ids)
    slots = pages[idx // 16] * 16 + idx % 16
    src = np.asarray(prefill_engine.runner.kv_cache)[:, :n]  # pages 0.. dense
    dst = np.asarray(decode_engine.runner.kv_cache)[:, slots]
    np.testing.assert_array_equal(src, dst)


def test_put_retries_with_backoff_and_get_polls():
    """put() retries transient connector failures with backoff
    (reference kv_transfer_manager.py:325-361); get() polls until the
    payload lands when given a timeout (:363-436)."""
    import threading
    import time as _time

    import numpy as np
    import pytest

    from ht_vllm_omni_tpu.distributed.kv_transfer import (
        KVLoadError,
        KVPayload,
        OmniKVTransferManager,
    )

    class Flaky:
        def __init__(self, fail_times):
            self.fail_times = fail_times
            self.calls = 0
            self.store = {}

        def put(self, f, t, key, data):
            self.calls += 1
            if self.calls <= self.fail_times:
                raise OSError("transient")
            self.store[key] = data

        def get(self, f, t, key):
            return self.store.get(key), 0

    payload = KVPayload(
        token_ids=[1, 2, 3], kv_rows=np.zeros((1, 3, 4), np.float32)
    )
    conn = Flaky(fail_times=2)
    mgr = OmniKVTransferManager(conn)
    mgr.put(0, 1, "r1", payload, backoff_s=0.001)
    assert conn.calls == 3
    assert mgr.get(0, 1, "r1").token_ids == [1, 2, 3]

    # permanent failure surfaces as KVLoadError after max attempts
    conn2 = Flaky(fail_times=99)
    mgr2 = OmniKVTransferManager(conn2)
    with pytest.raises(KVLoadError):
        mgr2.put(0, 1, "r2", payload, max_attempts=2, backoff_s=0.001)

    # polling get: payload arrives 30ms in
    conn3 = Flaky(fail_times=0)
    mgr3 = OmniKVTransferManager(conn3)

    def later():
        _time.sleep(0.03)
        mgr3.put(0, 1, "r3", payload)

    threading.Thread(target=later).start()
    assert mgr3.get(0, 1, "r3", timeout_s=0.0) is None
    got = mgr3.get(0, 1, "r3", timeout_s=2.0)
    assert got is not None and got.token_ids == [1, 2, 3]


def test_quantized_kv_transfer_bit_exact_and_tp_sharded():
    """Scale-matched int8->int8 transfers inject raw codes (bit-exact,
    never touching float), including into a tp-sharded quantized cache
    (the padded per-shard [K_s||V_s||pad_s] layout is built host-side);
    the injected engine's greedy continuation matches local decode."""
    import numpy as np

    import jax

    from ht_vllm_omni_tpu.config import ParallelConfig

    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(21))

    def int8_engine(tp=1):
        return LLMEngine(
            EngineConfig(
                model=_cfg(),
                cache=CacheConfig(
                    page_size=16, num_pages=64, kv_cache_dtype="int8",
                    kv_scale_k=0.05, kv_scale_v=0.05,
                ),
                scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
                parallel=ParallelConfig(tensor_parallel_size=tp),
            ),
            params=params,
            decode_horizon=4,
        )

    prompt = [7, 3, 11, 30, 4]
    # local reference: same engine decodes the prompt end-to-end
    sp_full = SamplingParams(temperature=0.0, max_tokens=7, ignore_eos=True)
    local = int8_engine().generate([prompt], sp_full)[0]

    # producer prefills only, then hands the KV off
    sp1 = SamplingParams(temperature=0.0, max_tokens=1, ignore_eos=True)
    prod = int8_engine()
    rid = prod.add_request(prompt, sp1, request_id="pd-bx")
    prod.scheduler.requests[rid].needs_kv_transfer = True
    while prod.has_unfinished_requests():
        prod.step()
    mgr = OmniKVTransferManager(OmniConnectorFactory.create("MockConnector"))
    payload = mgr.extract(prod, rid)

    for tp in (1, 2):
        cons = int8_engine(tp=tp)
        sp2 = SamplingParams(
            temperature=0.0, max_tokens=6, ignore_eos=True
        )
        rid2 = mgr.inject(cons, payload, f"pd-bx-{tp}", sp2)
        if tp == 1:
            # raw codes land verbatim: cache rows bit-exact vs producer
            req = cons.scheduler.requests[rid2]
            n = len(prompt)
            idx = np.arange(n)
            pages = np.asarray(req.page_ids)
            slots = pages[idx // 16] * 16 + idx % 16
            src = np.asarray(prod.runner.kv_cache)[:, :n]
            dst = np.asarray(cons.runner.kv_cache)[:, slots]
            np.testing.assert_array_equal(src, dst)
        outs = []
        while cons.has_unfinished_requests():
            outs.extend(cons.step())
        final = [o for o in outs if o.finished][0]
        got = final.outputs[0].token_ids
        # output stream = producer-sampled token + 5 continuations
        assert got == local.outputs[0].token_ids[:6], (
            got, local.outputs[0].token_ids,
        )
