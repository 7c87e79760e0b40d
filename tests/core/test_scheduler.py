from ht_vllm_omni_tpu.config import CacheConfig, SchedulerConfig
from ht_vllm_omni_tpu.core.block_pool import PagePool
from ht_vllm_omni_tpu.core.request import Request, RequestStatus
from ht_vllm_omni_tpu.core.sched.scheduler import Scheduler
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def _mk_sched(num_pages=64, max_seqs=4, page_size=16, max_len=256):
    return Scheduler(
        SchedulerConfig(
            max_num_seqs=max_seqs,
            max_num_batched_tokens=4096,
            max_model_len=max_len,
        ),
        CacheConfig(page_size=page_size),
        num_pages,
    )


def _mk_req(rid, prompt_len=10, max_tokens=5, **kw):
    return Request(
        request_id=rid,
        prompt_token_ids=list(range(prompt_len)),
        sampling_params=SamplingParams(max_tokens=max_tokens, **kw),
    )


def test_pool_alloc_free():
    pool = PagePool(4)
    a = pool.allocate(3)
    assert pool.num_free == 1
    pool.share(a[0])
    pool.free([a[0]])
    assert pool.num_free == 1  # still shared
    pool.free(a)
    assert pool.num_free == 4


def test_prefill_then_decode_flow():
    s = _mk_sched()
    req = _mk_req("r0", prompt_len=20, max_tokens=3)
    s.add_request(req)

    out = s.schedule()
    assert len(out.prefills) == 1 and not out.decodes
    assert out.prefills[0].num_new_tokens == 20
    assert len(req.page_ids) == 2  # ceil(20/16)

    finished = s.update_from_output(out, {"r0": 42})
    assert not finished
    assert req.output_token_ids == [42]
    assert req.prefill_done

    out = s.schedule()
    assert len(out.decodes) == 1 and not out.prefills
    s.update_from_output(out, {"r0": 43})
    out = s.schedule()
    finished = s.update_from_output(out, {"r0": 44})
    assert finished and finished[0].status == RequestStatus.FINISHED_LENGTH
    assert s.pool.num_free == 64


def test_eos_stop():
    s = _mk_sched()
    req = _mk_req("r0", prompt_len=4, max_tokens=10)
    req.sampling_params.stop_token_ids = [99]
    s.add_request(req)
    out = s.schedule()
    finished = s.update_from_output(out, {"r0": 99})
    assert finished and finished[0].status == RequestStatus.FINISHED_STOPPED


def test_min_tokens_defers_eos():
    s = _mk_sched()
    req = _mk_req("r0", prompt_len=4, max_tokens=10)
    req.sampling_params.stop_token_ids = [99]
    req.sampling_params.min_tokens = 2
    s.add_request(req)
    out = s.schedule()
    finished = s.update_from_output(out, {"r0": 99})
    assert not finished  # min_tokens not reached
    out = s.schedule()
    finished = s.update_from_output(out, {"r0": 99})
    assert finished


def test_admission_respects_max_seqs():
    s = _mk_sched(max_seqs=2)
    for i in range(4):
        s.add_request(_mk_req(f"r{i}"))
    out = s.schedule()
    assert len(out.prefills) == 2
    assert len(s.waiting) == 2


def test_preemption_on_page_pressure():
    # 4 pages of 16 tokens; two requests of 17 tokens need 2 pages each.
    s = _mk_sched(num_pages=4, page_size=16, max_seqs=2, max_len=64)
    r0 = _mk_req("r0", prompt_len=17, max_tokens=40)
    r1 = _mk_req("r1", prompt_len=17, max_tokens=40)
    s.add_request(r0)
    s.add_request(r1)
    out = s.schedule()
    assert len(out.prefills) == 2
    s.update_from_output(out, {"r0": 1, "r1": 1})

    # decode until r0 must write KV for computed-token 33 (needs page 3) —
    # no pages free -> r1 (lowest priority) must be preempted and requeued.
    for _ in range(15):
        out = s.schedule()
        s.update_from_output(out, {w.request.request_id: 1 for w in out.decodes})
    assert r0.num_tokens == 33
    out = s.schedule()
    ids = [w.request.request_id for w in out.decodes]
    assert ids == ["r0"]
    assert r1.status == RequestStatus.PREEMPTED
    assert r1.num_preemptions == 1
    assert r1 in s.waiting
    # r1's generated tokens folded into its prompt for recompute
    assert r1.num_prompt_tokens == 33
    assert r1.num_computed_tokens == 0


def test_abort_frees_pages():
    s = _mk_sched()
    s.add_request(_mk_req("r0"))
    out = s.schedule()
    s.update_from_output(out, {"r0": 1})
    s.abort_request("r0")
    assert s.pool.num_free == 64
    assert not s.has_unfinished()


def test_waiting_for_chunk_parks_queue_head():
    s = _mk_sched()
    r0 = _mk_req("r0")
    r0.status = RequestStatus.WAITING_FOR_CHUNK
    s.add_request(r0)
    out = s.schedule()
    assert out.is_empty
    r0.status = RequestStatus.WAITING
    out = s.schedule()
    assert len(out.prefills) == 1


def test_page_growth_mid_generation_is_exact():
    """Pages allocated mid-generation (scheduler _ensure_pages growth)
    must reach the runner's block tables: a stale table column silently
    redirected KV writes of newly covered positions to page 0.
    Regression: tiny pages forcing several growths vs one big page."""
    import jax

    from ht_vllm_omni_tpu.config import (
        CacheConfig, EngineConfig, ModelArchConfig, SchedulerConfig,
    )
    from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
    from ht_vllm_omni_tpu.models import qwen2
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=1,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(5))

    def run(page_size, num_pages):
        eng = LLMEngine(
            EngineConfig(
                model=cfg,
                cache=CacheConfig(page_size=page_size, num_pages=num_pages),
                scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=128),
            ),
            params=dict(params),
            decode_horizon=4,  # small horizon => repeated page growth
        )
        sp = SamplingParams(temperature=0.0, max_tokens=44, ignore_eos=True)
        return [
            o.outputs[0].token_ids
            for o in eng.generate([[2, 3, 4], [9, 8, 7]], sp)
        ]

    want = run(page_size=128, num_pages=8)   # one page, never grows
    got = run(page_size=16, num_pages=16)    # grows ~3x per request
    assert got == want
