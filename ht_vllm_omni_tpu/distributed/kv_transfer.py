"""Whole-request KV export/import between stages.

Counterpart of the reference OmniKVTransferManager (reference
vllm_omni/distributed/kv_transfer_manager.py:50): extract a finished (or
prefill-complete) request's paged KV into a contiguous host payload, move
it through a connector, and inject it into another stage's cache — the
basis for prefill/decode disaggregation (reference entrypoints/
pd_utils.py:23) and AR->DiT KV consumption (Bagel).

TPU shape: extraction is ONE device gather ([L, T, 2F] rows by flat slot)
+ one d2h transfer; injection reuses the in-place flush kernel, after
which the receiving engine treats the prompt as fully computed and goes
straight to decode.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.distributed.connectors.base import OmniConnectorBase


@dataclasses.dataclass
class KVPayload:
    token_ids: list[int]
    kv_rows: np.ndarray  # [L, T, 2F]
    extra: dict | None = None


@jax.jit
def _gather_rows(cache: jax.Array, slots: jax.Array) -> jax.Array:
    return jnp.take(cache, slots, axis=1)  # [L, T, 2F]


def rows_to_canonical(rows: np.ndarray, runner) -> np.ndarray:
    """Producer-layout rows -> canonical [L, T, 2*true_f] model-dtype.

    The payload that crosses stages is always dequantized, unpadded, and
    laid out [K_feat || V_feat] globally.  The producer's cache may be
    (a) int8 with per-tensor scales — dequantize HERE so the consumer's
    flush quantizes exactly ONCE (a second divide-by-scale would corrupt
    the transfer), and (b) tp-sharded on the feature axis, in which case
    the global array interleaves per-shard [K_s || V_s (|| pad_s)]
    segments — de-interleave to the canonical order.
    """
    num_l, t, width = rows.shape
    tp = runner.tp
    f = runner.true_f
    shard_w = width // tp
    local_f = f // tp
    r = rows.reshape(num_l, t, tp, shard_w)
    k = r[..., :local_f]  # [L, T, tp, f/tp]
    v = r[..., local_f : 2 * local_f]
    if runner.kv_quant:
        ksc, vsc = runner.kv_scales
        k = k.astype(np.float32) * ksc
        v = v.astype(np.float32) * vsc
    out = np.concatenate(
        [k.reshape(num_l, t, f), v.reshape(num_l, t, f)], axis=-1
    )
    return np.ascontiguousarray(out, dtype=np.float32)


def rows_from_canonical(rows: np.ndarray, runner) -> np.ndarray:
    """Canonical [L, T, 2f] rows -> the consumer runner's global feature
    layout (inverse of rows_to_canonical, minus quantization — the
    consumer's flush kernel quantizes if its cache is int8)."""
    tp = runner.tp
    if tp == 1:
        return rows
    if runner.kv_quant:
        # per-shard 1-byte padding would interleave with features; the
        # global-semantics flush cannot express that layout
        raise NotImplementedError(
            "KV inject into a tp-sharded quantized cache is unsupported; "
            "use a bf16 cache on the consumer or tp=1"
        )
    num_l, t, two_f = rows.shape
    f = two_f // 2
    local_f = f // tp
    k = rows[..., :f].reshape(num_l, t, tp, local_f)
    v = rows[..., f:].reshape(num_l, t, tp, local_f)
    return np.concatenate([k, v], axis=-1).reshape(num_l, t, two_f)


class OmniKVTransferManager:
    def __init__(self, connector: OmniConnectorBase) -> None:
        self.connector = connector

    @staticmethod
    def kv_key(request_id: str, from_stage: int) -> str:
        return f"{request_id}_{from_stage}_kv"

    # ------------------------------------------------------------ extract
    def extract(
        self, engine, request_id: str, release: bool = True
    ) -> KVPayload:
        """Pull a request's KV rows out of an LLMEngine's paged cache.
        The request must have been added with needs_kv_transfer=True so
        the scheduler held its pages past finish (the reference defers
        block freeing until extraction acks,
        omni_ar_scheduler.py:454-479).  Rows leave in the canonical
        dequantized [K || V] layout (rows_to_canonical)."""
        req = engine.scheduler.requests[request_id]
        runner = engine.runner
        n = req.num_computed_tokens
        idx = np.arange(n)
        pages = np.asarray(req.page_ids, np.int32)
        slots = pages[idx // runner.page_size] * runner.page_size + (
            idx % runner.page_size
        )
        rows = _gather_rows(runner.kv_cache, jnp.asarray(slots))
        payload = KVPayload(
            # includes the pending last token (KV not yet written: it is
            # the first decode input on the importing side)
            token_ids=list(req.all_token_ids[: n + 1]),
            kv_rows=rows_to_canonical(np.asarray(rows), runner),
        )
        if release:
            engine.scheduler.free_transferred(request_id)
        return payload

    def put(
        self, from_stage: int, to_stage: int, request_id: str,
        payload: KVPayload,
    ) -> None:
        self.connector.put(
            from_stage, to_stage, self.kv_key(request_id, from_stage),
            {"token_ids": payload.token_ids, "kv_rows": payload.kv_rows,
             "extra": payload.extra},
        )

    def get(
        self, from_stage: int, to_stage: int, request_id: str
    ) -> KVPayload | None:
        data, _ = self.connector.get(
            from_stage, to_stage, self.kv_key(request_id, from_stage)
        )
        if data is None:
            return None
        return KVPayload(
            token_ids=data["token_ids"], kv_rows=data["kv_rows"],
            extra=data.get("extra"),
        )

    # ------------------------------------------------------------- inject
    def inject(self, engine, payload: KVPayload, request_id: str,
               sampling_params) -> str:
        """Add a request to ``engine`` whose prompt KV is pre-populated:
        pages are allocated, rows flushed in place, and the request enters
        the running queue prefill-complete (decode-only instance of a PD
        pair).  Canonical payload rows are re-interleaved to the
        consumer's tp layout first."""
        rows = rows_from_canonical(
            np.asarray(payload.kv_rows), engine.runner
        )
        return engine.add_request_with_kv(
            payload.token_ids, rows, sampling_params,
            request_id=request_id,
        )
