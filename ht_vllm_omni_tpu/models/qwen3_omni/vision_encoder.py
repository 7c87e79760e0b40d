"""Qwen3-Omni vision tower (patches -> thinker embedding space) in jax.

Architecture (reference vllm_omni/model_executor/models/qwen3_omni/
qwen3_omni_moe_thinker.py Qwen3OmniMoeVisionEncoder; numerics pinned to
transformers' implementation):

  pixel patches [S, C*Tp*P*P] (merge-block order, as produced by the HF
  processor) -> linear patch embed (the conv3d has stride == kernel)
  -> + bilinearly-interpolated learned positions
  -> depth x pre-LN blocks (fused-qkv attention with 2D rope, per-frame
     full attention) with "deepstack" patch-merger taps on the first
     few blocks -> final spatial-merge patch merger.

TPU shaping: grid geometry (positions, rope tables, frame segment ids)
is computed host-side in numpy — it depends only on grid_thw, which the
host knows — so the jitted forward is pure static-shape tensor work.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VisionEncoderConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    depth: int = 27
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    out_hidden_size: int = 2048
    num_position_embeddings: int = 2304
    deepstack_visual_indexes: tuple = (8, 16, 24)
    hidden_act: str = "gelu_pytorch_tanh"
    dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * (
            self.patch_size**2
        )

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size**2


def _act(name):
    if name in ("gelu_pytorch_tanh", "gelu_new", "gelu_approx"):
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "silu":
        return jax.nn.silu
    raise ValueError(name)


def init_params(cfg: VisionEncoderConfig, key: jax.Array) -> dict:
    dt = jnp.dtype(cfg.dtype)
    h, ff, nl = cfg.hidden_size, cfg.intermediate_size, cfg.depth
    hm = h * cfg.merge_unit
    ks = iter(jax.random.split(key, 24))

    def w(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    def merger(k, postshuffle):
        # postshuffle (deepstack) mergers norm the merged hm features;
        # the final merger norms pre-shuffle hidden features
        k1, k2 = jax.random.split(k)
        ln_dim = hm if postshuffle else h
        return {
            "ln": jnp.ones((ln_dim,), dt), "ln_b": jnp.zeros((ln_dim,), dt),
            "fc1": w(k1, (hm, hm)), "fc1_b": jnp.zeros((hm,), dt),
            "fc2": w(k2, (hm, cfg.out_hidden_size)),
            "fc2_b": jnp.zeros((cfg.out_hidden_size,), dt),
        }

    p = {
        "patch_w": w(next(ks), (cfg.patch_dim, h)),
        "patch_b": jnp.zeros((h,), dt),
        "pos_table": w(next(ks), (cfg.num_position_embeddings, h)),
        "ln1": jnp.ones((nl, h), dt), "ln1_b": jnp.zeros((nl, h), dt),
        "qkv": w(next(ks), (nl, h, 3 * h)),
        "qkv_b": jnp.zeros((nl, 3 * h), dt),
        "proj": w(next(ks), (nl, h, h)),
        "proj_b": jnp.zeros((nl, h), dt),
        "ln2": jnp.ones((nl, h), dt), "ln2_b": jnp.zeros((nl, h), dt),
        "fc1": w(next(ks), (nl, h, ff)), "fc1_b": jnp.zeros((nl, ff), dt),
        "fc2": w(next(ks), (nl, ff, h)), "fc2_b": jnp.zeros((nl, h), dt),
        "merger": merger(next(ks), postshuffle=False),
    }
    for i in range(len(cfg.deepstack_visual_indexes)):
        p[f"ds_merger_{i}"] = merger(next(ks), postshuffle=True)
    return p


def load_hf_state(cfg: VisionEncoderConfig, state: dict) -> dict:
    dt = jnp.dtype(cfg.dtype)

    def g(name, transpose=False):
        a = np.asarray(state[name].float())
        return jnp.asarray(a.T if transpose else a, dt)

    def stack(fmt, transpose=False):
        arrs = []
        for i in range(cfg.depth):
            a = np.asarray(state[fmt.format(i)].float())
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs), dt)

    def merger(prefix):
        return {
            "ln": g(f"{prefix}.ln_q.weight"),
            "ln_b": g(f"{prefix}.ln_q.bias"),
            "fc1": g(f"{prefix}.mlp.0.weight", transpose=True),
            "fc1_b": g(f"{prefix}.mlp.0.bias"),
            "fc2": g(f"{prefix}.mlp.2.weight", transpose=True),
            "fc2_b": g(f"{prefix}.mlp.2.bias"),
        }

    p = {
        # conv3d stride==kernel -> linear on the flattened patch
        "patch_w": jnp.asarray(
            np.asarray(state["patch_embed.proj.weight"].float())
            .reshape(cfg.hidden_size, -1).T, dt
        ),
        "patch_b": g("patch_embed.proj.bias"),
        "pos_table": g("pos_embed.weight"),
        "ln1": stack("blocks.{}.norm1.weight"),
        "ln1_b": stack("blocks.{}.norm1.bias"),
        "qkv": stack("blocks.{}.attn.qkv.weight", transpose=True),
        "qkv_b": stack("blocks.{}.attn.qkv.bias"),
        "proj": stack("blocks.{}.attn.proj.weight", transpose=True),
        "proj_b": stack("blocks.{}.attn.proj.bias"),
        "ln2": stack("blocks.{}.norm2.weight"),
        "ln2_b": stack("blocks.{}.norm2.bias"),
        "fc1": stack("blocks.{}.mlp.linear_fc1.weight", transpose=True),
        "fc1_b": stack("blocks.{}.mlp.linear_fc1.bias"),
        "fc2": stack("blocks.{}.mlp.linear_fc2.weight", transpose=True),
        "fc2_b": stack("blocks.{}.mlp.linear_fc2.bias"),
        "merger": merger("merger"),
    }
    for i in range(len(cfg.deepstack_visual_indexes)):
        p[f"ds_merger_{i}"] = merger(f"merger_list.{i}")
    return p


# ------------------------------------------------------- host-side geometry
def grid_positions(cfg: VisionEncoderConfig, grid_thw) -> dict:
    """Numpy precompute of everything that depends on grid_thw: bilinear
    pos-embed gather indices/weights, 2D rope cos/sin, per-frame segment
    ids.  Mirrors fast_pos_embed_interpolate + rot_pos_emb of the HF
    implementation (token order = spatial-merge-block order)."""
    m = cfg.spatial_merge_size
    side = int(cfg.num_position_embeddings**0.5)
    idx4, w4, coords, segs = [], [], [], []
    seg_base = 0
    for t, h, w in grid_thw:
        h_idx = np.linspace(0, side - 1, h, dtype=np.float32)
        w_idx = np.linspace(0, side - 1, w, dtype=np.float32)
        hf_, wf_ = h_idx.astype(np.int32), w_idx.astype(np.int32)
        hc_ = np.clip(hf_ + 1, None, side - 1)
        wc_ = np.clip(wf_ + 1, None, side - 1)
        dh, dw = h_idx - hf_, w_idx - wf_
        idx = np.stack([
            (hf_[:, None] * side + wf_[None, :]).ravel(),
            (hf_[:, None] * side + wc_[None, :]).ravel(),
            (hc_[:, None] * side + wf_[None, :]).ravel(),
            (hc_[:, None] * side + wc_[None, :]).ravel(),
        ])
        wt = np.stack([
            ((1 - dh)[:, None] * (1 - dw)[None, :]).ravel(),
            ((1 - dh)[:, None] * dw[None, :]).ravel(),
            (dh[:, None] * (1 - dw)[None, :]).ravel(),
            (dh[:, None] * dw[None, :]).ravel(),
        ]).astype(np.float32)
        # permute into merge-block order, repeat per frame
        order = (
            np.arange(h * w)
            .reshape(h // m, m, w // m, m)
            .transpose(0, 2, 1, 3)
            .ravel()
        )
        idx = np.tile(idx[:, order], (1, t))
        wt = np.tile(wt[:, order], (1, t))
        idx4.append(idx)
        w4.append(wt)
        # rope coords in merge-block order (same for every frame)
        rows = np.arange(h).reshape(h // m, m, 1, 1)
        cols = np.arange(w).reshape(1, 1, w // m, m)
        rr = np.broadcast_to(
            rows, (h // m, m, w // m, m)
        ).transpose(0, 2, 1, 3).ravel()
        cc = np.broadcast_to(
            cols, (h // m, m, w // m, m)
        ).transpose(0, 2, 1, 3).ravel()
        coords.append(np.tile(np.stack([rr, cc], 1), (t, 1)))
        segs.append(np.repeat(seg_base + np.arange(t), h * w))
        seg_base += t
    idx4 = np.concatenate(idx4, axis=1)
    w4 = np.concatenate(w4, axis=1)
    coords = np.concatenate(coords)
    seg = np.concatenate(segs).astype(np.int32)

    hd4 = cfg.head_dim // 4
    inv = 1.0 / (10000.0 ** (np.arange(0, hd4 * 2, 2, np.float32) / (hd4 * 2)))
    freqs = coords[..., None].astype(np.float32) * inv  # [S, 2, hd4]
    rot = freqs.reshape(len(coords), -1)  # [S, hd/2]
    emb = np.concatenate([rot, rot], axis=-1)  # [S, hd]
    return {
        "pos_idx": idx4.astype(np.int32),  # [4, S]
        "pos_w": w4,  # [4, S]
        "cos": np.cos(emb).astype(np.float32),
        "sin": np.sin(emb).astype(np.float32),
        "seg": seg,  # [S] frame ids
    }


def _layer_norm(x, w, b, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def forward(
    cfg: VisionEncoderConfig,
    params: dict,
    patches: jax.Array,  # [S, patch_dim] in merge-block order
    geo: dict,  # from grid_positions (numpy arrays are fine)
) -> tuple[jax.Array, list[jax.Array]]:
    """Returns (merged embeddings [S/merge_unit, out_hidden],
    deepstack features list in deepstack_visual_indexes order)."""
    s = patches.shape[0]
    h = jnp.dot(
        patches.astype(params["patch_w"].dtype), params["patch_w"]
    ) + params["patch_b"]
    pos = jnp.einsum(
        "ksh,ks->sh",
        jnp.take(params["pos_table"], jnp.asarray(geo["pos_idx"]), axis=0)
        .astype(jnp.float32),
        jnp.asarray(geo["pos_w"]),
    )
    h = h + pos.astype(h.dtype)

    cos = jnp.asarray(geo["cos"])[:, None, :]  # [S, 1, hd]
    sin = jnp.asarray(geo["sin"])[:, None, :]
    seg = jnp.asarray(geo["seg"])
    mask = seg[None, :] == seg[:, None]
    nh, hd = cfg.num_heads, cfg.head_dim
    scale = hd**-0.5
    act = _act(cfg.hidden_act)

    n_ds = len(cfg.deepstack_visual_indexes)
    ds_idx = {li: i for i, li in enumerate(cfg.deepstack_visual_indexes)}

    layer_keys = (
        "ln1", "ln1_b", "qkv", "qkv_b", "proj", "proj_b",
        "ln2", "ln2_b", "fc1", "fc1_b", "fc2", "fc2_b",
    )
    ds_feats = []
    for li in range(cfg.depth):
        lp = {k: params[k][li] for k in layer_keys}
        x = _layer_norm(h, lp["ln1"], lp["ln1_b"])
        qkv = (jnp.dot(x, lp["qkv"]) + lp["qkv_b"]).reshape(s, 3, nh, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = qf * cos + _rotate_half(qf) * sin
        k = kf * cos + _rotate_half(kf) * sin
        sc = jnp.einsum("qhd,khd->hqk", q, k) * scale
        sc = jnp.where(mask[None], sc, -1e30)
        p_attn = jax.nn.softmax(sc, axis=-1)
        o = jnp.einsum(
            "hqk,khd->qhd", p_attn, v.astype(jnp.float32)
        ).reshape(s, -1).astype(h.dtype)
        h = h + (jnp.dot(o, lp["proj"]) + lp["proj_b"])
        x = _layer_norm(h, lp["ln2"], lp["ln2_b"])
        x = act(jnp.dot(x, lp["fc1"]) + lp["fc1_b"])
        h = h + (jnp.dot(x, lp["fc2"]) + lp["fc2_b"])
        if li in ds_idx:
            # postshuffle merger: norm over the merged feature
            mp = params[f"ds_merger_{ds_idx[li]}"]
            xm = h.reshape(-1, cfg.merge_unit * cfg.hidden_size)
            xm = _layer_norm(xm, mp["ln"], mp["ln_b"])
            xm = jax.nn.gelu(
                jnp.dot(xm, mp["fc1"]) + mp["fc1_b"], approximate=False
            )
            ds_feats.append(jnp.dot(xm, mp["fc2"]) + mp["fc2_b"])

    mp = params["merger"]
    xm = _layer_norm(h, mp["ln"], mp["ln_b"])  # pre-shuffle norm
    xm = xm.reshape(-1, cfg.merge_unit * cfg.hidden_size)
    xm = jax.nn.gelu(jnp.dot(xm, mp["fc1"]) + mp["fc1_b"], approximate=False)
    out = jnp.dot(xm, mp["fc2"]) + mp["fc2_b"]
    return out, ds_feats
