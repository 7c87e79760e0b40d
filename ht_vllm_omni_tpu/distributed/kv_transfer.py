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
import logging

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.distributed.connectors.base import OmniConnectorBase

logger = logging.getLogger(__name__)


class KVLoadError(RuntimeError):
    """A transferred KV payload was missing or failed validation."""


@dataclasses.dataclass
class KVPayload:
    token_ids: list[int]
    kv_rows: np.ndarray  # [L, T, 2F]
    extra: dict | None = None


@jax.jit
def _gather_rows(cache: jax.Array, slots: jax.Array) -> jax.Array:
    return jnp.take(cache, slots, axis=1)  # [L, T, 2F]


def rows_to_canonical(
    rows: np.ndarray, runner
) -> tuple[np.ndarray, dict | None]:
    """Producer-layout rows -> (canonical [L, T, 2*true_f], quant meta).

    The payload that crosses stages is unpadded and laid out
    [K_feat || V_feat] globally.  A quantized producer cache ships its
    RAW int8/fp8 codes plus per-tensor scales in the meta (4x fewer
    wire bytes than a dequantized f32 wire; the consumer applies the
    scales exactly once — either by injecting raw on a scale-matched
    cache, bit-exact, or by dequantizing once on mismatch).  tp-sharded
    caches interleave per-shard [K_s || V_s (|| pad_s)] segments in the
    global array — de-interleaved to the canonical order here.
    """
    num_l, t, width = rows.shape
    tp = runner.tp
    f = runner.true_f
    shard_w = width // tp
    local_f = f // tp
    r = rows.reshape(num_l, t, tp, shard_w)
    k = r[..., :local_f]  # [L, T, tp, f/tp]
    v = r[..., local_f : 2 * local_f]
    out = np.concatenate(
        [k.reshape(num_l, t, f), v.reshape(num_l, t, f)], axis=-1
    )
    if runner.kv_quant:
        ksc, vsc = runner.kv_scales
        return np.ascontiguousarray(out), {
            "kv_dtype": str(jnp.dtype(runner.kv_cache.dtype).name),
            "k_scale": float(ksc),
            "v_scale": float(vsc),
        }
    return np.ascontiguousarray(out, dtype=np.float32), None


def _dequant_canonical(rows: np.ndarray, meta: dict) -> np.ndarray:
    f = rows.shape[-1] // 2
    k = rows[..., :f].astype(np.float32) * meta["k_scale"]
    v = rows[..., f:].astype(np.float32) * meta["v_scale"]
    return np.concatenate([k, v], axis=-1)


def _interleave_tp(
    rows: np.ndarray, tp: int, shard_w: int
) -> np.ndarray:
    """Canonical [L, T, 2f] -> per-shard [K_s || V_s (|| pad_s)] global
    layout with shard width ``shard_w`` (pad zero-filled)."""
    num_l, t, two_f = rows.shape
    f = two_f // 2
    local_f = f // tp
    k = rows[..., :f].reshape(num_l, t, tp, local_f)
    v = rows[..., f:].reshape(num_l, t, tp, local_f)
    parts = [k, v]
    pad = shard_w - 2 * local_f
    if pad:
        parts.append(
            np.zeros((num_l, t, tp, pad), dtype=rows.dtype)
        )
    return np.concatenate(parts, axis=-1).reshape(
        num_l, t, tp * shard_w
    )


def rows_for_consumer(
    rows: np.ndarray, meta: dict | None, runner
) -> tuple[np.ndarray, bool]:
    """Canonical wire rows (+quant meta) -> the consumer's global
    feature layout.  Returns (rows, prequantized): prequantized rows are
    already in the cache dtype/scale and must be flushed verbatim —
    scale-matched int8->int8 transfers are bit-exact and never touch
    float."""
    import jax.numpy as _jnp

    tp = runner.tp
    if runner.kv_quant:
        cache_dt = runner.kv_cache.dtype
        ksc, vsc = runner.kv_scales
        same = (
            meta is not None
            and meta.get("kv_dtype") == str(_jnp.dtype(cache_dt).name)
            and float(meta["k_scale"]) == float(ksc)
            and float(meta["v_scale"]) == float(vsc)
        )
        if same:
            q = rows
        else:
            from ht_vllm_omni_tpu.ops.kv_cache_update import quantize_rows

            x = _dequant_canonical(rows, meta) if meta else rows
            q = np.asarray(
                quantize_rows(
                    _jnp.asarray(x), rows.shape[-1] // 2, ksc, vsc,
                    dtype=cache_dt,
                )
            )
        shard_w = runner.kv_cache.shape[-1] // tp
        return _interleave_tp(q, tp, shard_w), True
    x = _dequant_canonical(rows, meta) if meta else rows
    if tp == 1:
        return x, False
    return _interleave_tp(x, tp, x.shape[-1] // tp), False


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
        canon, qmeta = rows_to_canonical(np.asarray(rows), runner)
        payload = KVPayload(
            # includes the pending last token (KV not yet written: it is
            # the first decode input on the importing side)
            token_ids=list(req.all_token_ids[: n + 1]),
            kv_rows=canon,
            extra=qmeta,
        )
        if release:
            engine.scheduler.free_transferred(request_id)
        return payload

    def put(
        self, from_stage: int, to_stage: int, request_id: str,
        payload: KVPayload, *, max_attempts: int = 3,
        backoff_s: float = 0.05,
    ) -> None:
        """Store with retry + exponential backoff (reference
        kv_transfer_manager.py:325-361 — transient connector failures,
        e.g. a TCP store hiccup, must not kill the request)."""
        import time as _time

        last: Exception | None = None
        for attempt in range(max_attempts):
            try:
                self.connector.put(
                    from_stage, to_stage,
                    self.kv_key(request_id, from_stage),
                    {"token_ids": payload.token_ids,
                     "kv_rows": payload.kv_rows,
                     "extra": payload.extra},
                )
                return
            except Exception as e:  # noqa: BLE001 — retried, re-raised
                last = e
                if attempt + 1 < max_attempts:
                    _time.sleep(backoff_s * (2 ** attempt))
        raise KVLoadError(
            f"kv put failed after {max_attempts} attempts: {last}"
        ) from last

    def get(
        self, from_stage: int, to_stage: int, request_id: str,
        *, timeout_s: float = 0.0, poll_s: float = 0.01,
    ) -> KVPayload | None:
        """Fetch; with ``timeout_s`` > 0, poll until the payload lands
        (reference receive_kv_cache_for_request :363-436)."""
        import time as _time

        deadline = _time.time() + timeout_s
        while True:
            data, _ = self.connector.get(
                from_stage, to_stage, self.kv_key(request_id, from_stage)
            )
            if data is not None:
                return KVPayload(
                    token_ids=data["token_ids"],
                    kv_rows=data["kv_rows"],
                    extra=data.get("extra"),
                )
            if _time.time() >= deadline:
                return None
            _time.sleep(poll_s)

    # ---------------------------------------------------------- recovery
    @staticmethod
    def validate_payload(payload: KVPayload, engine) -> str | None:
        """Sanity-check a transferred payload against the consumer's
        geometry BEFORE any pages are allocated.  Returns a reason string
        when the load must be rejected (reference invalid_block_ids
        handling, omni_ar_scheduler.py:222-227)."""
        rows = np.asarray(payload.kv_rows)
        runner = engine.runner
        if rows.ndim != 3:
            return f"kv_rows rank {rows.ndim} != 3"
        num_l = runner.arch.num_hidden_layers
        if rows.shape[0] != num_l:
            return f"layer dim {rows.shape[0]} != {num_l}"
        if rows.shape[2] != 2 * runner.true_f:
            return (
                f"feature dim {rows.shape[2]} != {2 * runner.true_f}"
            )
        if len(payload.token_ids) != rows.shape[1] + 1:
            return (
                f"{len(payload.token_ids)} tokens vs {rows.shape[1]} "
                "kv rows (+1 pending expected)"
            )
        if not np.isfinite(rows.astype(np.float32)).all():
            return "non-finite kv values"
        return None

    # ------------------------------------------------------------- inject
    def inject(self, engine, payload: KVPayload, request_id: str,
               sampling_params, on_failure: str = "recompute") -> str:
        """Add a request to ``engine`` whose prompt KV is pre-populated:
        pages are allocated, rows flushed in place, and the request enters
        the running queue prefill-complete (decode-only instance of a PD
        pair).  Canonical payload rows are re-interleaved to the
        consumer's tp layout first.

        A corrupt payload never reaches the cache: with
        ``on_failure="recompute"`` (reference recompute_kv_load_failures)
        the request falls back to a normal prefill over its token ids;
        with ``"error"`` a KVLoadError raises and nothing is allocated.
        """
        reason = self.validate_payload(payload, engine)
        if reason is not None:
            if on_failure == "recompute" and payload.token_ids:
                logger.warning(
                    "KV load failed for %s (%s): recomputing prefill",
                    request_id, reason,
                )
                # drop the pending (producer-sampled) last token: the
                # recomputed prefill re-samples it, so the output stream
                # keeps the same shape as a successful inject
                ids = list(payload.token_ids)
                if len(ids) > 1:
                    ids = ids[:-1]
                return engine.add_request(
                    ids, sampling_params, request_id=request_id
                )
            raise KVLoadError(f"{request_id}: {reason}")
        qmeta = payload.extra if (
            payload.extra and "kv_dtype" in payload.extra
        ) else None
        rows, prequantized = rows_for_consumer(
            np.asarray(payload.kv_rows), qmeta, engine.runner
        )
        return engine.add_request_with_kv(
            payload.token_ids, rows, sampling_params,
            request_id=request_id, prequantized=prequantized,
        )

    def receive_and_inject(
        self, engine, from_stage: int, to_stage: int, request_id: str,
        sampling_params, fallback_token_ids: list[int] | None = None,
        on_failure: str = "recompute",
    ) -> str:
        """get() + inject() with missing-payload recovery: when the
        connector has no payload (producer died / TTL expired), fall back
        to recomputing from ``fallback_token_ids``."""
        payload = self.get(from_stage, to_stage, request_id)
        if payload is None:
            if on_failure == "recompute" and fallback_token_ids:
                logger.warning(
                    "KV payload missing for %s: recomputing prefill",
                    request_id,
                )
                return engine.add_request(
                    list(fallback_token_ids), sampling_params,
                    request_id=request_id,
                )
            raise KVLoadError(f"{request_id}: payload missing")
        return self.inject(
            engine, payload, request_id, sampling_params,
            on_failure=on_failure,
        )
