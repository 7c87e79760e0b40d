"""GGUF checkpoint loading (pure python/numpy, no `gguf` package).

Counterpart of the reference's GGUF quantization support (reference
vllm_omni/quantization/gguf_config.py + factory.py:30-45).  The
reference leans on llama.cpp CUDA dequant ops; on TPU we dequantize at
LOAD time into the model dtype (and can re-quantize into the repo's own
Pallas int8/int4 serving layout afterwards) — XLA's fused GEMMs then
run the usual path, which is the same "dequant + GEMM" strategy the
reference picked for diffusion tensors.

Implements the GGUF v2/v3 container (magic, metadata KVs, tensor infos,
aligned data section) and the common block-quant codecs:

  F32 / F16 / BF16, Q8_0 (f16 scale + 32 int8),
  Q4_0 / Q4_1 (f16 scale [+ min] + 32 nibbles),
  Q5_0 / Q5_1 (+ 32 high bits),
  and the 256-element K-quant super-blocks Q2_K..Q8_K
  (per-16/32 sub-block 4/6-bit scales under an f16 super scale,
  llama.cpp ggml-quants layout; Q8_K is f32 scale + int8 + bsums).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"GGUF"

# metadata value types
_U8, _I8, _U16, _I16, _U32, _I32, _F32, _BOOL, _STR, _ARR, _U64, _I64, \
    _F64 = range(13)

# ggml tensor types (ids from ggml.h)
GGML_F32 = 0
GGML_F16 = 1
GGML_Q4_0 = 2
GGML_Q4_1 = 3
GGML_Q5_0 = 6
GGML_Q5_1 = 7
GGML_Q8_0 = 8
GGML_Q2_K = 10
GGML_Q3_K = 11
GGML_Q4_K = 12
GGML_Q5_K = 13
GGML_Q6_K = 14
GGML_Q8_K = 15
GGML_BF16 = 30


class _Reader:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.o = 0

    def read(self, fmt: str):
        vals = struct.unpack_from("<" + fmt, self.d, self.o)
        self.o += struct.calcsize("<" + fmt)
        return vals if len(vals) > 1 else vals[0]

    def read_str(self) -> str:
        n = self.read("Q")
        s = self.d[self.o : self.o + n]
        self.o += n
        return s.decode("utf-8", errors="replace")

    def read_value(self, vtype: int):
        if vtype == _U8:
            return self.read("B")
        if vtype == _I8:
            return self.read("b")
        if vtype == _U16:
            return self.read("H")
        if vtype == _I16:
            return self.read("h")
        if vtype == _U32:
            return self.read("I")
        if vtype == _I32:
            return self.read("i")
        if vtype == _F32:
            return self.read("f")
        if vtype == _BOOL:
            return bool(self.read("B"))
        if vtype == _STR:
            return self.read_str()
        if vtype == _U64:
            return self.read("Q")
        if vtype == _I64:
            return self.read("q")
        if vtype == _F64:
            return self.read("d")
        if vtype == _ARR:
            itype = self.read("I")
            n = self.read("Q")
            return [self.read_value(itype) for _ in range(n)]
        raise ValueError(f"unknown GGUF metadata type {vtype}")


# ---------------------------------------------------------------- dequant
def _f16(buf: np.ndarray) -> np.ndarray:
    return (
        np.ascontiguousarray(buf).view(np.float16).astype(np.float32)
    )


def _dequant_q8_0(raw: np.ndarray, n: int) -> np.ndarray:
    blk = raw.reshape(-1, 34)
    d = _f16(blk[:, :2])  # [B, 1]
    q = np.ascontiguousarray(blk[:, 2:]).view(np.int8).astype(np.float32)
    return (d * q).reshape(-1)[:n]


def _nibbles(b: np.ndarray) -> np.ndarray:
    """16 packed bytes -> 32 values: low nibbles are elements 0..15,
    high nibbles 16..31 (llama.cpp layout)."""
    lo = (b & 0x0F).astype(np.int32)
    hi = (b >> 4).astype(np.int32)
    return np.concatenate([lo, hi], axis=-1)


def _dequant_q4_0(raw: np.ndarray, n: int) -> np.ndarray:
    blk = raw.reshape(-1, 18)
    d = _f16(blk[:, :2]).reshape(-1, 1)
    q = _nibbles(blk[:, 2:]) - 8
    return (d * q).reshape(-1)[:n]


def _dequant_q4_1(raw: np.ndarray, n: int) -> np.ndarray:
    blk = raw.reshape(-1, 20)
    d = _f16(blk[:, 0:2]).reshape(-1, 1)
    m = _f16(blk[:, 2:4]).reshape(-1, 1)
    q = _nibbles(blk[:, 4:])
    return (d * q + m).reshape(-1)[:n]


def _high_bits(qh_bytes: np.ndarray) -> np.ndarray:
    """[B, 4] bytes -> [B, 32] the per-element 5th bit."""
    bits = np.unpackbits(
        np.ascontiguousarray(qh_bytes), axis=-1, bitorder="little"
    )
    return bits.astype(np.int32)


def _dequant_q5_0(raw: np.ndarray, n: int) -> np.ndarray:
    blk = raw.reshape(-1, 22)
    d = _f16(blk[:, 0:2]).reshape(-1, 1)
    qh = _high_bits(blk[:, 2:6])
    q = _nibbles(blk[:, 6:]) | (qh << 4)
    return (d * (q - 16)).reshape(-1)[:n]


def _dequant_q5_1(raw: np.ndarray, n: int) -> np.ndarray:
    blk = raw.reshape(-1, 24)
    d = _f16(blk[:, 0:2]).reshape(-1, 1)
    m = _f16(blk[:, 2:4]).reshape(-1, 1)
    qh = _high_bits(blk[:, 4:8])
    q = _nibbles(blk[:, 8:]) | (qh << 4)
    return (d * q + m).reshape(-1)[:n]


# ------------------------------------------------- K-quant super-blocks
# 256-element super-blocks; llama.cpp ggml-quants.c layouts. All index
# math below is expressed per element e in [0, 256) so the whole tensor
# dequantizes as one vectorized gather.

_E = np.arange(256)


def _k4_scale_min(sb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unpack the 12-byte Q4_K/Q5_K scale block -> 8 six-bit
    (scale, min) pairs (llama.cpp get_scale_min_k4)."""
    sb = sb.astype(np.int32)
    sc = np.empty(sb.shape[:-1] + (8,), np.int32)
    mn = np.empty_like(sc)
    sc[..., :4] = sb[..., 0:4] & 63
    mn[..., :4] = sb[..., 4:8] & 63
    sc[..., 4:] = (sb[..., 8:12] & 0x0F) | ((sb[..., 0:4] >> 6) << 4)
    mn[..., 4:] = (sb[..., 8:12] >> 4) | ((sb[..., 4:8] >> 6) << 4)
    return sc, mn


def _dequant_q2_k(raw: np.ndarray, n: int) -> np.ndarray:
    blk = raw.reshape(-1, 84)
    scales = blk[:, :16].astype(np.int32)   # per-16 4-bit scale | min<<4
    qs = blk[:, 16:80]
    d = _f16(blk[:, 80:82]).reshape(-1, 1)
    dmin = _f16(blk[:, 82:84]).reshape(-1, 1)
    byte_idx = (_E // 128) * 32 + (_E % 32)
    shift = 2 * ((_E % 128) // 32)
    q = ((qs[:, byte_idx] >> shift) & 3).astype(np.float32)
    sc = scales[:, _E // 16]
    dl = d * (sc & 0x0F).astype(np.float32)
    ml = dmin * (sc >> 4).astype(np.float32)
    return (dl * q - ml).reshape(-1)[:n]


def _dequant_q3_k(raw: np.ndarray, n: int) -> np.ndarray:
    blk = raw.reshape(-1, 110)
    hmask = blk[:, :32]
    qs = blk[:, 32:96]
    sb = blk[:, 96:108].astype(np.int32)
    d = _f16(blk[:, 108:110]).reshape(-1, 1)
    # 12 bytes -> 16 six-bit scales: low 4 bits from byte k%8's
    # low/high nibble, high 2 bits from bytes 8..11
    k = np.arange(16)
    low = np.where(k < 8, sb[:, k % 8] & 0x0F, sb[:, k % 8] >> 4)
    hi = (sb[:, 8 + (k % 4)] >> (2 * (k // 4))) & 3
    scales = ((hi << 4) | low) - 32          # [B, 16]
    byte_idx = (_E // 128) * 32 + (_E % 32)
    shift = 2 * ((_E % 128) // 32)
    q = ((qs[:, byte_idx] >> shift) & 3).astype(np.int32)
    hbit = (hmask[:, _E % 32] >> (_E // 32)) & 1
    q = q - np.where(hbit == 0, 4, 0)
    sc = scales[:, _E // 16].astype(np.float32)
    return (d * sc * q.astype(np.float32)).reshape(-1)[:n]


def _dequant_q4_k(raw: np.ndarray, n: int) -> np.ndarray:
    blk = raw.reshape(-1, 144)
    d = _f16(blk[:, 0:2]).reshape(-1, 1)
    dmin = _f16(blk[:, 2:4]).reshape(-1, 1)
    sc, mn = _k4_scale_min(blk[:, 4:16])
    qs = blk[:, 16:144]
    byte_idx = (_E // 64) * 32 + (_E % 32)
    q = np.where(
        (_E % 64) < 32, qs[:, byte_idx] & 0x0F, qs[:, byte_idx] >> 4
    ).astype(np.float32)
    sub = _E // 32
    return (
        d * sc[:, sub].astype(np.float32) * q
        - dmin * mn[:, sub].astype(np.float32)
    ).reshape(-1)[:n]


def _dequant_q5_k(raw: np.ndarray, n: int) -> np.ndarray:
    blk = raw.reshape(-1, 176)
    d = _f16(blk[:, 0:2]).reshape(-1, 1)
    dmin = _f16(blk[:, 2:4]).reshape(-1, 1)
    sc, mn = _k4_scale_min(blk[:, 4:16])
    qh = blk[:, 16:48]
    qs = blk[:, 48:176]
    byte_idx = (_E // 64) * 32 + (_E % 32)
    low = np.where(
        (_E % 64) < 32, qs[:, byte_idx] & 0x0F, qs[:, byte_idx] >> 4
    ).astype(np.int32)
    hbit = ((qh[:, _E % 32] >> (_E // 32)) & 1).astype(np.int32)
    q = (low + 16 * hbit).astype(np.float32)
    sub = _E // 32
    return (
        d * sc[:, sub].astype(np.float32) * q
        - dmin * mn[:, sub].astype(np.float32)
    ).reshape(-1)[:n]


def _dequant_q6_k(raw: np.ndarray, n: int) -> np.ndarray:
    blk = raw.reshape(-1, 210)
    ql = blk[:, :128]
    qh = blk[:, 128:192]
    scales = np.ascontiguousarray(blk[:, 192:208]).view(np.int8)
    d = _f16(blk[:, 208:210]).reshape(-1, 1)
    g, eg = _E // 128, _E % 128
    sub, l = eg // 32, eg % 32
    lowraw = ql[:, g * 64 + l + 32 * (sub % 2)]
    low = np.where(sub < 2, lowraw & 0x0F, lowraw >> 4).astype(np.int32)
    hi = ((qh[:, g * 32 + l] >> (2 * sub)) & 3).astype(np.int32)
    q = ((low | (hi << 4)) - 32).astype(np.float32)
    sc = scales[:, g * 8 + sub * 2 + l // 16].astype(np.float32)
    return (d * sc * q).reshape(-1)[:n]


def _dequant_q8_k(raw: np.ndarray, n: int) -> np.ndarray:
    """block_q8_K (llama.cpp ggml-quants.h): f32 d | int8 qs[256] |
    int16 bsums[16].  Normally a dot-product intermediate, but files in
    the wild do store it, and dequantization ignores the bsums."""
    blk = raw.reshape(-1, 292)
    d = np.ascontiguousarray(blk[:, 0:4]).view(np.float32)  # [B, 1]
    q = np.ascontiguousarray(blk[:, 4:260]).view(np.int8)
    return (d * q.astype(np.float32)).reshape(-1)[:n]


_BLOCK_BYTES = {
    GGML_Q8_0: (32, 34), GGML_Q4_0: (32, 18), GGML_Q4_1: (32, 20),
    GGML_Q5_0: (32, 22), GGML_Q5_1: (32, 24),
    GGML_Q2_K: (256, 84), GGML_Q3_K: (256, 110), GGML_Q4_K: (256, 144),
    GGML_Q5_K: (256, 176), GGML_Q6_K: (256, 210), GGML_Q8_K: (256, 292),
}
_DEQUANT = {
    GGML_Q8_0: _dequant_q8_0, GGML_Q4_0: _dequant_q4_0,
    GGML_Q4_1: _dequant_q4_1, GGML_Q5_0: _dequant_q5_0,
    GGML_Q5_1: _dequant_q5_1,
    GGML_Q2_K: _dequant_q2_k, GGML_Q3_K: _dequant_q3_k,
    GGML_Q4_K: _dequant_q4_k, GGML_Q5_K: _dequant_q5_k,
    GGML_Q6_K: _dequant_q6_k, GGML_Q8_K: _dequant_q8_k,
}


def _tensor_nbytes(gtype: int, n_elems: int) -> int:
    if gtype == GGML_F32:
        return 4 * n_elems
    if gtype in (GGML_F16, GGML_BF16):
        return 2 * n_elems
    blk, nb = _BLOCK_BYTES[gtype]
    return (n_elems // blk) * nb


def _decode(gtype: int, raw: np.ndarray, n: int) -> np.ndarray:
    if gtype == GGML_F32:
        return raw.view(np.float32)[:n].astype(np.float32)
    if gtype == GGML_F16:
        return raw.view(np.float16)[:n].astype(np.float32)
    if gtype == GGML_BF16:
        return (
            raw.view(np.uint16)[:n].astype(np.uint32) << 16
        ).view(np.float32)
    if gtype not in _DEQUANT:
        raise NotImplementedError(f"GGUF tensor type {gtype} unsupported")
    return _DEQUANT[gtype](raw, n)


# ------------------------------------------------------------------ read
def read_gguf(path: str) -> tuple[dict, dict[str, np.ndarray]]:
    """Parse a .gguf file -> (metadata, dequantized fp32 tensors).

    Tensor shapes follow numpy convention (GGML dims are reversed)."""
    with open(path, "rb") as f:
        data = f.read()
    r = _Reader(data)
    if data[:4] != _MAGIC:
        raise ValueError(f"{path}: not a GGUF file")
    r.o = 4
    version = r.read("I")
    if version < 2:
        raise ValueError(f"GGUF v{version} is not supported (need >= 2)")
    n_tensors = r.read("Q")
    n_kv = r.read("Q")
    meta: dict = {"__version__": version}
    for _ in range(n_kv):
        key = r.read_str()
        vtype = r.read("I")
        meta[key] = r.read_value(vtype)
    infos = []
    for _ in range(n_tensors):
        name = r.read_str()
        n_dims = r.read("I")
        dims = [r.read("Q") for _ in range(n_dims)]
        gtype = r.read("I")
        offset = r.read("Q")
        infos.append((name, dims, gtype, offset))
    align = int(meta.get("general.alignment", 32))
    data_start = (r.o + align - 1) // align * align

    tensors: dict[str, np.ndarray] = {}
    for name, dims, gtype, offset in infos:
        n = 1
        for d in dims:
            n *= d
        nbytes = _tensor_nbytes(gtype, n)
        raw = np.frombuffer(
            data, np.uint8, count=nbytes, offset=data_start + offset
        )
        arr = _decode(gtype, raw, n)
        # GGML stores dims fastest-first; numpy shape is the reverse
        tensors[name] = arr.reshape(tuple(reversed(dims)))
    return meta, tensors


# ----------------------------------------------------------- model load
# llama.cpp tensor names -> HF names the qwen2 loader layout expects
_NAME_MAP = [
    ("token_embd.weight", "embed", False),
    ("output_norm.weight", "norm_f", False),
]
_LAYER_MAP = [
    ("blk.{}.attn_norm.weight", "ln1", False),
    ("blk.{}.ffn_norm.weight", "ln2", False),
    ("blk.{}.attn_q.weight", "wq", True),
    ("blk.{}.attn_k.weight", "wk", True),
    ("blk.{}.attn_v.weight", "wv", True),
    ("blk.{}.attn_output.weight", "wo", True),
    ("blk.{}.ffn_gate.weight", "gate", True),
    ("blk.{}.ffn_up.weight", "up", True),
    ("blk.{}.ffn_down.weight", "down", True),
]
_LAYER_BIAS_MAP = [
    ("blk.{}.attn_q.bias", "bq"),
    ("blk.{}.attn_k.bias", "bk"),
    ("blk.{}.attn_v.bias", "bv"),
]


def config_kwargs_from_gguf(meta: dict) -> dict:
    """ModelArchConfig kwargs from GGUF llama/qwen2 metadata keys."""
    arch = meta.get("general.architecture", "llama")

    def g(suffix, default=None):
        return meta.get(f"{arch}.{suffix}", default)

    kw = dict(
        hidden_size=g("embedding_length"),
        intermediate_size=g("feed_forward_length"),
        num_hidden_layers=g("block_count"),
        num_attention_heads=g("attention.head_count"),
        num_key_value_heads=g(
            "attention.head_count_kv", g("attention.head_count")
        ),
        rope_theta=float(g("rope.freq_base", 10000.0)),
        rms_norm_eps=float(
            g("attention.layer_norm_rms_epsilon", 1e-6)
        ),
        max_position_embeddings=g("context_length", 32768),
    )
    return {k: v for k, v in kw.items() if v is not None}


def load_gguf_params(cfg, path: str, dtype=None) -> dict:
    """Load a .gguf checkpoint into the qwen2 stacked-layer layout
    (models/loader.py's contract: [in, out] weights)."""
    import jax.numpy as jnp

    meta, raw = read_gguf(path)
    dt = jnp.dtype(dtype or cfg.dtype)
    nl = cfg.num_hidden_layers
    params: dict = {}
    for src, dst, _t in _NAME_MAP:
        if src in raw:
            params[dst] = jnp.asarray(raw[src], dt)
    for fmt, dst, transpose in _LAYER_MAP:
        if fmt.format(0) not in raw:
            continue
        mats = [
            raw[fmt.format(i)].T if transpose else raw[fmt.format(i)]
            for i in range(nl)
        ]
        params[dst] = jnp.asarray(np.stack(mats), dt)
    for fmt, dst in _LAYER_BIAS_MAP:
        if fmt.format(0) in raw:
            params[dst] = jnp.asarray(
                np.stack([raw[fmt.format(i)] for i in range(nl)]), dt
            )
    if "output.weight" in raw and not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(raw["output.weight"].T, dt)
    return params
