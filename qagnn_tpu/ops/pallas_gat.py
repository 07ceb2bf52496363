"""Pallas TPU fused kernels (forward AND backward) for the relational GAT core.

Fuses the per-graph sparse chain — one-hot build, node->edge gathers (MXU),
SDDMM, source-grouped softmax with analytic self-loops, out-degree rescale,
weighted scatter-add (SpMM) — into a small pipeline of grid-tiled kernels
with all edge-sized intermediates streamed through VMEM tile by tile.
The XLA "onehot" backend (qagnn_tpu.ops.gat_attention) materializes every
(E, N) one-hot and every (E, H*D) temporary in HBM; here HBM traffic shrinks
to the actual inputs/outputs plus tiny (H, E) score planes — the main lever
for this bandwidth-bound op.

Architecture (v3 — the round-2 single-kernel design held whole (E, HD) edge
operands in VMEM per graph and OOM'd the v5e's 16 MB scoped VMEM; v2 moved
edge tiling into the pallas_call grid; v3 transposed the per-edge layout,
merged the denominator pass into the scores pass, and chained the
cross-layer edge-cotangent accumulation through aliased outputs):

  * grid = (G, n_tiles): program (g, t) sees one TILE_E-edge block of each
    edge-sized operand via BlockSpecs; Mosaic double-buffers the tile DMAs.
  * node-sized outputs (denominators, aggregates, node cotangents) use a
    t-invariant index map (g, t) -> (g, 0, 0): the block stays resident in
    VMEM across the whole t-loop (zeroed at t == 0, accumulated, flushed
    once when g advances) — the standard Pallas accumulation pattern.
  * the cheap dense glue between edge passes (final gmax vs the self-loop
    scores, scale = degree/denominator, the self-loop path, closing the
    softmax VJP chain) runs as plain XLA on (G, N, H)/(G, H, E)-sized
    arrays — a few hundred KB per graph, fused by XLA.
  * VMEM per program is a few tile-sized blocks, independent of E; each
    kernel body is compiled ONCE for the whole grid. The train-step jits
    raise the scoped-vmem cap to 32 MiB (qagnn_tpu.utils.tpu) for the
    backward working set + aliased accumulators.

TPU layout decisions (v5e Mosaic), v3 — the projected kernels:
  * per-edge FEATURE planes are (F, T): features on sublanes, edges on
    lanes. The earlier (T, F) layout forced (T, H) intermediates that
    padded H=4 lanes to 128 (32x vreg waste) and (H, T) <-> (T, H)
    identity-matmul transposes; in (F, T) every producer/consumer agrees
    on (H, T) per-head planes and the transposes are gone.
  * indices/mask ride as (G, 1, E) — edge dim on LANES.
  * one-hots are built TRANSPOSED, (N, T): node ids vary along sublanes via
    broadcasted_iota(dim 0); built by integer arithmetic max(1-|ids-idx|, 0)
    (v5e Mosaic rejects vector compares against broadcast operands).
  * per-head reduce/broadcast via a block-diagonal selector matmul (HD, H).
  * all matmul accumulators f32 (Mosaic requires 32-bit acc); per-head
    value gathers contract in the compute dtype like the XLA onehot
    backend's cdt einsums (_gather_ht).
  * softmax uses a per-graph GLOBAL max shift per head, accumulated ONLINE
    flash-attention style in the scores pass (running max + denominator
    rescale), re-shifted in XLA once the self-loop scores join — exact
    per-group softmax, guarded denominator, stop-gradient shift (same
    scheme as the XLA onehot backend).
  * e_edge is never materialized: consumers recompute exp(score - gmax)
    from the (H, E) scores plane (_edge_exp).
  * d_edge_emb accumulates through input_output_aliases twice: bwd pass 2
    folds pass 1's tile in-place, and the chained variant folds the
    DOWNSTREAM layers' carry into pass 1 — the k-layer cotangent sum never
    exists as an op.

Semantics match qagnn_tpu.ops.gat_attention.relational_gat_attention_nodes
(reference modeling/modeling_qagnn.py:411-484); forward and backward are
cross-checked against the XLA backends' values and VJPs in
tests/test_pallas_gat.py (interpret mode, incl. forced multi-tile) and on
real TPU via bench.py --backend pallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# 2048 is the VMEM sweet spot: kernel-body intermediates (eq/ek/msg tiles)
# are f32 at (HD, T), and the measured v5e step is tile-size-neutral from
# 2048 up (per-program overhead already amortized). Since init moved off
# the fused kernels (qagnn_tpu.utils.initialization) every compile carries
# the raised scoped-vmem cap, so larger tiles are legal — QAGNN_TILE_E
# overrides for experiments (pair with QAGNN_SCOPED_VMEM_KIB).
import os as _os

TILE_E = int(_os.environ.get("QAGNN_TILE_E", "2048"))
# backward-only tile override (the bwd working set differs; measured on
# v5e: no better than 2048 — see README TILE sweep)
TILE_E_BWD = int(_os.environ.get("QAGNN_TILE_E_BWD", "0")) or TILE_E
_DENOM_EPS = 1e-16
_NEG = -1e30


def _tile_for(n_edges: int, dtype, bwd: bool = False) -> int:
    """Edge-tile size: big tiles amortize Mosaic per-program overhead; f32
    operands halve the budget to stay within scoped VMEM."""
    tile = TILE_E_BWD if bwd else TILE_E
    base = tile if jnp.dtype(dtype).itemsize < 4 else tile // 2
    if n_edges <= base:
        return n_edges
    for t in (base, base // 2, base // 4, base // 8):
        if n_edges % t == 0:
            return t
    return base // 8


def pad_edges_to_tile(src, dst, mask, *edge_arrays, dtype, shards: int = 1):
    """Pad the edge axis so the tile divides it evenly (masked slots are
    inert: zero one-hot columns). Returns (tile, padded arrays...).

    shards > 1: pad so the edge axis ALSO divides evenly into `shards`
    equal slices each a whole number of tiles — the layout the
    edge-partitioned shard_map path (parallel/edge_shard_pallas) needs,
    where every model-axis device runs the kernels on its local E/shards
    slice."""
    E = src.shape[1]
    local = -(-E // shards)
    t = _tile_for(local, dtype)
    E_pad = shards * (-(-local // t) * t)
    if E_pad == E:
        return (t, src, dst, mask) + edge_arrays
    pad = E_pad - E

    def padE(x, value=0):
        widths = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, widths, constant_values=value)

    return (t, padE(src), padE(dst), padE(mask)) + tuple(
        padE(a) for a in edge_arrays)


def _selector(hd: int, h: int, dtype):
    """(HD, H) block-diagonal 0/1 matrix: column h selects head h's slice."""
    dph = hd // h
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (hd, h), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (hd, h), 1)
    return ((d_ids // dph - h_ids) == 0).astype(dtype)


def _eye(n: int, dtype):
    a = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return ((a - b) == 0).astype(dtype)


def _tile_onehots(src_ref, dst_ref, mask_ref, n_nodes, cdt, *, need_dst=True):
    """Transposed one-hots (N, T) for the current edge-tile block.

    src/dst/mask refs are (1, 1, T) blocks — edge dim on lanes.

    mask_ref=None builds UNMASKED one-hots: padded edge slots (src/dst 0)
    gather node 0's values, which every caller except the denominator
    kernel multiplies by alpha/e_edge == 0 downstream — so only the
    denominator/degree kernel pays for the mask broadcast+multiply.
    """
    t = src_ref.shape[-1]
    src = jnp.broadcast_to(src_ref[0], (n_nodes, t))             # (N, T)
    ids = jax.lax.broadcasted_iota(jnp.int32, (n_nodes, t), 0)
    oh_s = jnp.maximum(1 - jnp.abs(ids - src), 0).astype(cdt)
    oh_d = None
    if need_dst:
        dst = jnp.broadcast_to(dst_ref[0], (n_nodes, t))
        oh_d = jnp.maximum(1 - jnp.abs(ids - dst), 0).astype(cdt)
    if mask_ref is not None:
        m = jnp.broadcast_to(mask_ref[0], (n_nodes, t)).astype(cdt)
        oh_s = oh_s * m
        if oh_d is not None:
            oh_d = oh_d * m
    return oh_s, oh_d


def _gather(oh_t, nodes):
    """(N, T)^T @ (N, F) -> (T, F), f32 accumulate (node->edge gather)."""
    return jax.lax.dot_general(
        oh_t, nodes, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _scatter(oh_t, vals):
    """(N, T) @ (T, F) -> (N, F), f32 accumulate (edge->node scatter-add)."""
    return jax.lax.dot_general(
        oh_t, vals, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _gather_nh(oh_t, vals_nh):
    """(N, T)^T @ (N, H) -> (T, H) in f32 (per-head node->edge gather)."""
    return jax.lax.dot_general(
        oh_t.astype(jnp.float32), vals_nh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _to_hd(x_th, sel):
    """(T, H) -> (T, HD) per-head broadcast via the selector matmul."""
    return jax.lax.dot_general(
        x_th, sel, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _to_th(x_ht, eye_h):
    """(H, T) -> (T, H) via identity matmul (no Mosaic relayout)."""
    return jax.lax.dot_general(
        x_ht, eye_h, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


# --- transposed (F, T) layout helpers (v3, projected kernels) --------------
# Per-edge feature planes live as (F, T) — features on sublanes, edges on
# lanes — and per-head planes as (H, T). Rationale: the (T, H) intermediates
# of the (T, F) layout waste vregs 32x (H=4 lanes padded to 128: a (2048, 4)
# f32 plane occupies 1 MB of vregs for 32 KB of data), and every
# (H, T) <-> (T, H) identity-matmul transpose disappears because producers
# and consumers agree on (H, T).


def _gather_ft(oh_t, nodes):
    """(N, F) contracted with (N, T) over N -> (F, T) node->edge gather."""
    return jax.lax.dot_general(
        nodes, oh_t, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _scatter_ft(oh_t, vals_ft):
    """(N, T) contracted with (F, T) over T -> (N, F) scatter-add."""
    return jax.lax.dot_general(
        oh_t, vals_ft, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _gather_ht(oh_t, vals_nh, cdt=None):
    """(N, H) contracted with (N, T) over N -> (H, T) per-head gather.

    cdt: contraction dtype. bf16 on the hot path matches the XLA onehot
    backend, whose scale/denominator gathers are cdt einsums with f32
    accumulation (qagnn_tpu/ops/gat_attention.py:277) — one-hots are exact
    in bf16, only the value operand rounds; a bf16 MXU pass is 4x cheaper
    than f32."""
    if cdt is None:
        cdt = jnp.float32
    return jax.lax.dot_general(
        vals_nh.astype(cdt), oh_t.astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _hd_from_h(sel, x_ht, cdt=None):
    """(HD, H) @ (H, T) -> (HD, T) per-head broadcast.

    cdt: contraction dtype — bf16 on the hot path rounds the per-head value
    once before the broadcast, the same single-rounding class as the XLA
    onehot backend's cdt products; the selector is exact in any dtype and
    a bf16 MXU pass is 4x cheaper than f32."""
    if cdt is None:
        cdt = jnp.float32
    return jax.lax.dot_general(
        sel.astype(cdt), x_ht.astype(cdt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _h_from_hd(sel, x_hdt, cdt=None):
    """(HD, H) contracted with (HD, T) over HD -> (H, T) per-head sum.

    cdt: contraction dtype — bf16 on the hot path rounds the per-edge
    products once before the head sum (f32 accumulate), the same
    single-rounding class as the XLA onehot backend's cdt score einsums;
    an f32 selector matmul costs ~4x the MXU passes."""
    if cdt is None:
        cdt = jnp.float32
    return jax.lax.dot_general(
        sel.astype(cdt), x_hdt.astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _plane_stride(heads: int) -> int:
    """Feature-row stride for packed (N, H) planes: whole 8-row sublane
    groups so in-kernel static slices stay aligned (f32 vregs are 8 rows)."""
    return -(-heads // 8) * 8


def _pack_node_planes(base, *planes):
    """[base ‖ plane_0 ‖ plane_1 ...] along the feature axis, each plane
    padded to whole 8-row groups.

    One (N, T) one-hot gather of the packed array then yields EVERY
    per-node operand a kernel pass needs: the separate (N, H) per-head
    gathers this replaces cost ~half a full (N, F) gather on the MXU
    (their H-wide output pads to a full lane tile), while the extra H+pad
    rows ride the F-dim padding the (N, 200) gather already pays
    (200 -> 256 lanes). Requires base F % 8 == 0."""
    parts = [base]
    for p in planes:
        pad = (-p.shape[-1]) % 8
        p = p.astype(base.dtype)
        if pad:
            p = jnp.pad(p, ((0, 0), (0, 0), (0, pad)))
        parts.append(p)
    return jnp.concatenate(parts, axis=-1)


def _proj_ft(w_ref, emb_t, cdt):
    """In-kernel edge GEMM: (D, HD) x (D, T) -> (HD, T) f32 — the edge
    embedding rides TRANSPOSED (G, D, E), so its tiles are MXU-native for
    this contraction and match the producer kernel's native layout."""
    return jax.lax.dot_general(
        w_ref[...].astype(cdt), emb_t,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _heads_to_hd_xla(x_nh, hd):
    """XLA-side (…, H) -> (…, HD) per-head broadcast."""
    h = x_nh.shape[-1]
    dph = hd // h
    return jnp.broadcast_to(x_nh[..., None],
                            x_nh.shape + (dph,)).reshape(*x_nh.shape[:-1], hd)


def _head_sum_xla(x_nhd, heads):
    """XLA-side per-head reduction (…, HD) -> (…, H)."""
    dph = x_nhd.shape[-1] // heads
    return jnp.sum(x_nhd.reshape(*x_nhd.shape[:-1], heads, dph), axis=-1)


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _scores_kernel(nq_ref, nk_ref, ekb_ref, src_ref, dst_ref, mask_ref,
                   scores_ref, *, n_nodes, hd, heads):
    """Per-edge attention logits for one edge tile: (H, T) raw scores."""
    f32 = jnp.float32
    cdt = nq_ref.dtype
    sel = _selector(hd, heads, f32)
    oh_s, oh_d = _tile_onehots(src_ref, dst_ref, None, n_nodes, cdt)
    eq = _gather(oh_s, nq_ref[0])                                # (T, HD) f32
    ek = _gather(oh_d, nk_ref[0]) + ekb_ref[0].astype(f32)
    # (HD, H) contracted with (T, HD) over HD -> (H, T)
    scores_ref[0] = jax.lax.dot_general(
        sel, eq * ek, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=f32)


def _denom_kernel(src_ref, dst_ref, mask_ref, scores_ref, gmax_ref,
                  ee_ref, denom_ref, deg_ref, *, n_nodes, heads):
    """exp(score - gmax) * mask per tile (writes e_edge) + accumulate
    per-source softmax denominators and out-degrees."""
    f32 = jnp.float32
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        denom_ref[0] = jnp.zeros_like(denom_ref[0])
        deg_ref[0] = jnp.zeros_like(deg_ref[0])

    mask_t = mask_ref[0].astype(f32)                             # (1, T)
    # clamp at 0: exact for real edges (score <= gmax by construction) and
    # keeps garbage scores of padded edges — whose one-hots are built
    # UNMASKED in the other kernels — from overflowing exp before the mask
    ee = jnp.exp(jnp.minimum(scores_ref[0] - gmax_ref[0], 0.0)) * mask_t
    ee_ref[0] = ee                                               # (H, T)
    oh_s, _ = _tile_onehots(src_ref, dst_ref, mask_ref, n_nodes, f32,
                            need_dst=False)
    # (N, T) @ (H, T)^T -> (N, H)
    denom_ref[0] += jax.lax.dot_general(
        oh_s, ee, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    deg_ref[0] += jnp.sum(oh_s, axis=1).reshape(n_nodes, 1)


def _aggr_kernel(nm_ref, emb_ref, ee_ref, scale_ref,
                 src_ref, dst_ref, mask_ref, out_ref, *, n_nodes, hd, heads):
    """Accumulate weighted messages at dst (the SpMM) over edge tiles."""
    f32 = jnp.float32
    cdt = nm_ref.dtype
    sel = _selector(hd, heads, f32)
    eye_h = _eye(heads, f32)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    oh_s, oh_d = _tile_onehots(src_ref, dst_ref, None, n_nodes, cdt)
    msg = _gather(oh_s, nm_ref[0]) + emb_ref[0].astype(f32)      # (T, HD)
    scale_e = _gather_nh(oh_s, scale_ref[0])                     # (T, H)
    alpha_th = _to_th(ee_ref[0], eye_h) * scale_e                # (T, H)
    w = (msg * _to_hd(alpha_th, sel)).astype(cdt)                # (T, HD)
    out_ref[0] += _scatter(oh_d, w)


def _fwd_impl(nq, nk, nm, ekb, emb, skb, smb, src, dst, mask, heads,
              interpret):
    """Returns (out, e_edge, denom_raw, scale, e_self)."""
    G, N, HD = nq.shape
    E = src.shape[1]
    tile_e = _tile_for(E, nq.dtype)
    assert E % tile_e == 0, (E, tile_e)
    n_tiles = E // tile_e
    f32 = jnp.float32
    grid = (G, n_tiles)

    node_spec = pl.BlockSpec((1, N, HD), lambda g, t: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    etile_spec = pl.BlockSpec((1, tile_e, HD), lambda g, t: (g, t, 0),
                              memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((1, 1, tile_e), lambda g, t: (g, 0, t),
                            memory_space=pltpu.VMEM)
    he_spec = pl.BlockSpec((1, heads, tile_e), lambda g, t: (g, 0, t),
                           memory_space=pltpu.VMEM)
    nh_spec = pl.BlockSpec((1, N, heads), lambda g, t: (g, 0, 0),
                           memory_space=pltpu.VMEM)
    n1_spec = pl.BlockSpec((1, N, 1), lambda g, t: (g, 0, 0),
                           memory_space=pltpu.VMEM)

    src3, dst3, mask3 = src[:, None, :], dst[:, None, :], mask[:, None, :]

    # ---- pass A: raw per-edge logits (G, H, E) --------------------------
    scores = pl.pallas_call(
        functools.partial(_scores_kernel, n_nodes=N, hd=HD, heads=heads),
        grid=grid,
        in_specs=[node_spec, node_spec, etile_spec,
                  idx_spec, idx_spec, idx_spec],
        out_specs=he_spec,
        out_shape=jax.ShapeDtypeStruct((G, heads, E), f32),
        interpret=interpret,
    )(nq, nk, ekb, src3, dst3, mask3)

    # ---- dense glue: self-loop logits, global max shift (XLA) -----------
    self_scores = _head_sum_xla(
        nq.astype(f32) * (nk + skb).astype(f32), heads)          # (G, N, H)
    mask_f = mask.astype(f32)[:, None, :]                        # (G, 1, E)
    masked_scores = jnp.where(mask_f > 0, scores, _NEG)
    gmax = jnp.maximum(
        jnp.max(masked_scores, axis=2),                          # (G, H)
        jnp.max(self_scores, axis=1))                            # (G, H)
    gmax = jax.lax.stop_gradient(gmax)
    e_self = jnp.exp(self_scores - gmax[:, None, :])             # (G, N, H)

    # ---- pass B: exp + denominators + degrees (e_edge written in-kernel) -
    h1_spec = pl.BlockSpec((1, heads, 1), lambda g, t: (g, 0, 0),
                           memory_space=pltpu.VMEM)
    e_edge, denom_edges, deg = pl.pallas_call(
        functools.partial(_denom_kernel, n_nodes=N, heads=heads),
        grid=grid,
        in_specs=[idx_spec, idx_spec, idx_spec, he_spec, h1_spec],
        out_specs=(he_spec, nh_spec, n1_spec),
        out_shape=(jax.ShapeDtypeStruct((G, heads, E), f32),
                   jax.ShapeDtypeStruct((G, N, heads), f32),
                   jax.ShapeDtypeStruct((G, N, 1), f32)),
        interpret=interpret,
    )(src3, dst3, mask3, scores, gmax[:, :, None])

    denom_raw = denom_edges + e_self                             # (G, N, H)
    scale = (deg + 1.0) / jnp.maximum(denom_raw, _DENOM_EPS)     # (G, N, H)

    # ---- pass C: weighted aggregation at dst ----------------------------
    out_edges = pl.pallas_call(
        functools.partial(_aggr_kernel, n_nodes=N, hd=HD, heads=heads),
        grid=grid,
        in_specs=[node_spec, etile_spec, he_spec, nh_spec,
                  idx_spec, idx_spec, idx_spec],
        out_specs=node_spec,
        out_shape=jax.ShapeDtypeStruct((G, N, HD), f32),
        interpret=interpret,
    )(nm, emb, e_edge, scale, src3, dst3, mask3)

    # self-loop contribution (dense, XLA)
    self_alpha = e_self * scale                                  # (G, N, H)
    sm_full = (nm + smb).astype(f32)
    out = out_edges + sm_full * _heads_to_hd_xla(self_alpha, HD)
    return out, e_edge, denom_raw, scale, e_self


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _bwd1_kernel(gc_ref, nm_ref, emb_ref, ee_ref, scale_ref,
                 src_ref, dst_ref, mask_ref,
                 demb_ref, dalpha_ref, dscale_ref, dnm_ref,
                 *, n_nodes, hd, heads):
    """Pass 1: d_msg -> (demb, dnm scatter), d_alpha, per-source d_scale."""
    f32 = jnp.float32
    cdt = nm_ref.dtype
    sel = _selector(hd, heads, f32)
    eye_h = _eye(heads, f32)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dscale_ref[0] = jnp.zeros_like(dscale_ref[0])
        dnm_ref[0] = jnp.zeros_like(dnm_ref[0])

    oh_s, oh_d = _tile_onehots(src_ref, dst_ref, mask_ref, n_nodes, cdt)
    g_dst = _gather(oh_d, gc_ref[0])                             # (T, HD) f32
    msg = _gather(oh_s, nm_ref[0]) + emb_ref[0].astype(f32)
    ee = ee_ref[0]                                               # (H, T)
    scale_src = _gather_nh(oh_s, scale_ref[0])                   # (T, H)
    alpha_th = _to_th(ee, eye_h) * scale_src
    d_msg = _to_hd(alpha_th, sel) * g_dst                        # (T, HD)
    demb_ref[0] = d_msg.astype(demb_ref.dtype)
    dnm_ref[0] += _scatter(oh_s, d_msg.astype(cdt))
    dalpha_ht = jax.lax.dot_general(
        sel, msg * g_dst, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=f32)                              # (H, T)
    dalpha_ref[0] = dalpha_ht
    # per-source sum of d_alpha * e_edge -> d_scale (N, H)
    dscale_ref[0] += jax.lax.dot_general(
        oh_s.astype(f32), dalpha_ht * ee,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)


def _bwd2_kernel(nq_ref, nk_ref, ekb_ref, ee_ref, dalpha_ref,
                 scale_ref, ddenom_ref, src_ref, dst_ref, mask_ref,
                 dekb_ref, dnq_ref, dnk_ref, *, n_nodes, hd, heads):
    """Pass 2: d_s per edge -> (dekb, dnq scatter, dnk scatter)."""
    f32 = jnp.float32
    cdt = nq_ref.dtype
    sel = _selector(hd, heads, f32)
    eye_h = _eye(heads, f32)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dnq_ref[0] = jnp.zeros_like(dnq_ref[0])
        dnk_ref[0] = jnp.zeros_like(dnk_ref[0])

    oh_s, oh_d = _tile_onehots(src_ref, dst_ref, mask_ref, n_nodes, cdt)
    q_src = _gather(oh_s, nq_ref[0])                             # (T, HD)
    key = _gather(oh_d, nk_ref[0]) + ekb_ref[0].astype(f32)
    et_t = _to_th(ee_ref[0], eye_h)                              # (T, H)
    dalpha_th = _to_th(dalpha_ref[0], eye_h)                     # (T, H)
    scale_src = _gather_nh(oh_s, scale_ref[0])
    dden_src = _gather_nh(oh_s, ddenom_ref[0])
    d_s_th = (dalpha_th * scale_src + dden_src) * et_t           # (T, H)
    ds_hd = _to_hd(d_s_th, sel)                                  # (T, HD)
    dekb_ref[0] = (ds_hd * q_src).astype(dekb_ref.dtype)
    dnq_ref[0] += _scatter(oh_s, (ds_hd * key).astype(cdt))
    dnk_ref[0] += _scatter(oh_d, (ds_hd * q_src).astype(cdt))


def _bwd_impl(nq, nk, nm, ekb, emb, skb, smb, src, dst, mask,
              e_edge, denom_raw, scale, e_self, g, heads, interpret):
    """Fused VJP. Cotangent flow (gmax shift is a constant, matching the
    XLA onehot backend's stop_gradient):

        out_n   = sum_{e: dst=n} alpha_e . msg_e + alpha_n^self . msg_n^self
        alpha_e = e_e * scale[src_e];   alpha_n^self = e_n * scale_n
        scale_n = deg_n / max(denom_n, eps);  denom_n = sum_{src=n} e_e + e_n
        e_e     = exp(s_e - gmax) * mask_e;   e_n = exp(s_n^self - gmax)
        s_e     = <q[src_e], k[dst_e] + ekb_e>_h (per head)
        msg_e   = m[src_e] + emb_e;  with self-loop analogues via skb/smb.
    """
    G, N, HD = nq.shape
    E = src.shape[1]
    tile_e = _tile_for(E, nq.dtype)
    assert E % tile_e == 0, (E, tile_e)
    n_tiles = E // tile_e
    f32 = jnp.float32
    cdt = nq.dtype
    grid = (G, n_tiles)

    node_spec = pl.BlockSpec((1, N, HD), lambda g_, t: (g_, 0, 0),
                             memory_space=pltpu.VMEM)
    etile_spec = pl.BlockSpec((1, tile_e, HD), lambda g_, t: (g_, t, 0),
                              memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((1, 1, tile_e), lambda g_, t: (g_, 0, t),
                            memory_space=pltpu.VMEM)
    he_spec = pl.BlockSpec((1, heads, tile_e), lambda g_, t: (g_, 0, t),
                           memory_space=pltpu.VMEM)
    nh_spec = pl.BlockSpec((1, N, heads), lambda g_, t: (g_, 0, 0),
                           memory_space=pltpu.VMEM)

    src3, dst3, mask3 = src[:, None, :], dst[:, None, :], mask[:, None, :]

    # ---- dense self-loop cotangents (XLA) -------------------------------
    alpha_self = e_self * scale                                  # (G, N, H)
    d_msg_self = _heads_to_hd_xla(alpha_self, HD) * g            # (G, N, HD)
    dsmb = d_msg_self.astype(smb.dtype)
    msg_self = (nm + smb).astype(f32)
    d_alpha_self = _head_sum_xla(msg_self * g, heads)            # (G, N, H)

    # ---- pass 1: d_msg / d_alpha / d_scale over edge tiles ---------------
    gc = g.astype(cdt)
    demb_g, dalpha, dscale_edges, dnm_edges = pl.pallas_call(
        functools.partial(_bwd1_kernel, n_nodes=N, hd=HD, heads=heads),
        grid=grid,
        in_specs=[node_spec, node_spec, etile_spec, he_spec, nh_spec,
                  idx_spec, idx_spec, idx_spec],
        out_specs=(etile_spec, he_spec, nh_spec, node_spec),
        out_shape=(jax.ShapeDtypeStruct((G, E, HD), emb.dtype),
                   jax.ShapeDtypeStruct((G, heads, E), f32),
                   jax.ShapeDtypeStruct((G, N, heads), f32),
                   jax.ShapeDtypeStruct((G, N, HD), f32)),
        interpret=interpret,
    )(gc, nm, emb, e_edge, scale, src3, dst3, mask3)

    # ---- close the softmax chain (dense, XLA) ---------------------------
    dscale = dscale_edges + d_alpha_self * e_self                # (G, N, H)
    denom_c = jnp.maximum(denom_raw, _DENOM_EPS)
    gate = (denom_raw > _DENOM_EPS).astype(f32)
    d_denom = -(scale / denom_c) * dscale * gate                 # (G, N, H)
    d_e_self = d_alpha_self * scale + d_denom
    d_s_self = d_e_self * e_self                                 # (G, N, H)
    ds_self_hd = _heads_to_hd_xla(d_s_self, HD)                  # (G, N, HD)
    nqf = nq.astype(f32)
    nkf = nk.astype(f32)
    dskb = (ds_self_hd * nqf).astype(skb.dtype)
    dnq_self = ds_self_hd * (nkf + skb.astype(f32))
    dnk_self = ds_self_hd * nqf

    # ---- pass 2: d_s per edge -> dekb / dnq / dnk ------------------------
    dekb_g, dnq_edges, dnk_edges = pl.pallas_call(
        functools.partial(_bwd2_kernel, n_nodes=N, hd=HD, heads=heads),
        grid=grid,
        in_specs=[node_spec, node_spec, etile_spec, he_spec, he_spec,
                  nh_spec, nh_spec, idx_spec, idx_spec, idx_spec],
        out_specs=(etile_spec, node_spec, node_spec),
        out_shape=(jax.ShapeDtypeStruct((G, E, HD), ekb.dtype),
                   jax.ShapeDtypeStruct((G, N, HD), f32),
                   jax.ShapeDtypeStruct((G, N, HD), f32)),
        interpret=interpret,
    )(nq, nk, ekb, e_edge, dalpha, scale, d_denom, src3, dst3, mask3)

    dnq = (dnq_edges + dnq_self).astype(nq.dtype)
    dnk = (dnk_edges + dnk_self).astype(nk.dtype)
    dnm = (dnm_edges + d_msg_self).astype(nm.dtype)
    return dnq, dnk, dnm, dekb_g, demb_g, dskb, dsmb


# ---------------------------------------------------------------------------
# projected variant: edge-side key/msg GEMMs folded INTO the kernels
# ---------------------------------------------------------------------------
#
# The unprojected op takes precomputed per-edge biases ekb/emb (G, E, HD) —
# two large HBM arrays written by XLA GEMMs, read by the kernels, with their
# cotangents (dekb/demb) written back and consumed by XLA dW GEMMs. The
# projected variant instead takes the shared edge embedding (G, E, D) ONCE
# plus the two projection matrices, computes ekb/emb per tile on the MXU
# in-kernel, and accumulates dW/db across the ENTIRE grid in VMEM (output
# blocks with a constant index map — written to HBM once at the end).
# Edge-sized HBM traffic drops ~3x: one (E, D) read per pass instead of
# (E, HD) bias reads + (E, HD) cotangent writes + dW GEMM re-reads.


def _scores_proj_kernel(nq_ref, nk_ref, emb_ref, wke_ref, bke_ref,
                        src_ref, dst_ref, mask_ref,
                        scores_ref, m_ref, denom_ref, deg_ref,
                        *, n_nodes, hd, heads):
    """Pass A (merged): raw logits + ONLINE softmax denominators/degrees.

    Keeps a running per-graph max m (H, 1) across the sequential tile sweep
    and rescales the accumulated denominators flash-attention style, so the
    old separate denominator pass — and the materialized e_edge array —
    are gone: consumers recompute exp(score - gmax) from the scores plane.
    Denominators accumulate TRANSPOSED as (H, N) so the per-head rescale
    factor (H, 1) broadcasts along lanes; XLA transposes the small result.
    """
    f32 = jnp.float32
    cdt = nq_ref.dtype
    sel = _selector(hd, heads, f32)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        m_ref[0] = jnp.full_like(m_ref[0], _NEG)
        denom_ref[0] = jnp.zeros_like(denom_ref[0])
        deg_ref[0] = jnp.zeros_like(deg_ref[0])

    oh_s, oh_d = _tile_onehots(src_ref, dst_ref, None, n_nodes, cdt)
    ekb_t = _proj_ft(wke_ref, emb_ref[0], cdt) \
        + bke_ref[...].astype(f32)                               # (HD, T)
    eq = _gather_ft(oh_s, nq_ref[0])                             # (HD, T)
    ek = _gather_ft(oh_d, nk_ref[0]) + ekb_t
    # f32 head-sum: measured the same speed as a cdt contraction (the
    # M=H selector matmuls are latency-hidden), so keep full score
    # precision
    s = _h_from_hd(sel, eq * ek)                                 # (H, T)
    scores_ref[0] = s

    mask_t = jnp.broadcast_to(mask_ref[0], s.shape).astype(f32)  # (H, T)
    s_masked = jnp.where(mask_t > 0, s, _NEG)
    tile_max = jnp.max(s_masked, axis=1, keepdims=True)          # (H, 1)
    m_old = m_ref[0]
    new_m = jnp.maximum(m_old, tile_max)
    m_ref[0] = new_m
    # exp clamped at 0: exact for real edges (s <= new_m), keeps padded
    # edges' garbage scores from overflowing before the mask multiply
    e = jnp.exp(jnp.minimum(s - new_m, 0.0)) * mask_t            # (H, T)
    oh_sm = oh_s * jnp.broadcast_to(
        mask_ref[0], oh_s.shape).astype(cdt)                     # (N, T) cdt
    # cdt contraction with f32 accumulation — one-hots are exact in bf16,
    # only the exp values round, the same single-rounding class as the
    # XLA onehot backend's cdt denominator einsum
    denom_ref[0] = denom_ref[0] * jnp.exp(m_old - new_m) \
        + jax.lax.dot_general(
            e.astype(cdt), oh_sm,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)                          # (H, N)
    deg_ref[0] += jnp.sum(oh_sm.astype(f32), axis=1).reshape(n_nodes, 1)


def _edge_exp(scores_ref, gmax_ref, mask_ref):
    """Recompute ee = exp(score - gmax) * mask for the tile: the scores
    plane replaces the materialized e_edge array (HBM-neutral, VPU-cheap)."""
    f32 = jnp.float32
    s = scores_ref[0]                                            # (H, T)
    mask_t = jnp.broadcast_to(mask_ref[0], s.shape).astype(f32)
    return jnp.exp(jnp.minimum(s - gmax_ref[0], 0.0)) * mask_t


def _aggr_proj_kernel(nms_ref, emb_ref, wme_ref, bme_ref, scores_ref,
                      gmax_ref, src_ref, dst_ref, mask_ref, *refs,
                      n_nodes, hd, heads, self_init=False):
    """nms_ref: (1, N, HD + stride) — [nm ‖ scale] packed so ONE gather
    yields both the message base and the per-source softmax scale (the
    separate (N, H) scale gather cost ~half a full gather).

    self_init: two extra inputs (smb, self_alpha) seed the output
    accumulator with the dense self-loop contribution at t == 0, so the
    XLA-side `out_edges + msg_self * alpha_self` pass over three
    (G, N, HD) f32 arrays never exists (single-chip path only — the
    edge-sharded path must add the replicated self term once AFTER its
    psum)."""
    if self_init:
        smb_ref, sa_ref, out_ref = refs
    else:
        (out_ref,) = refs
    f32 = jnp.float32
    cdt = nms_ref.dtype
    sel = _selector(hd, heads, f32)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        if self_init:
            # (N, H) -> (N, HD) per-head broadcast via the selector (K=H,
            # negligible), then out0 = (nm + smb) * alpha_self
            sa_hd = jax.lax.dot_general(
                sa_ref[0], _selector(hd, heads, f32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)                      # (N, HD)
            msg_self = nms_ref[0][:, :hd].astype(f32) \
                + smb_ref[0].astype(f32)
            out_ref[0] = msg_self * sa_hd
        else:
            out_ref[0] = jnp.zeros_like(out_ref[0])

    oh_s, oh_d = _tile_onehots(src_ref, dst_ref, None, n_nodes, cdt)
    emb_bias = _proj_ft(wme_ref, emb_ref[0], cdt) \
        + bme_ref[...].astype(f32)                               # (HD, T)
    g_all = _gather_ft(oh_s, nms_ref[0])                         # (HD+s, T)
    msg = g_all[:hd] + emb_bias                                  # (HD, T)
    scale_src = g_all[hd:hd + heads]                             # (H, T)
    ee = _edge_exp(scores_ref, gmax_ref, mask_ref)               # (H, T)
    alpha_ht = ee * scale_src                                    # (H, T)
    w = (msg * _hd_from_h(sel, alpha_ht, cdt)).astype(cdt)       # (HD, T)
    out_ref[0] += _scatter_ft(oh_d, w)


def _bwd1_proj_kernel(gc_ref, nms_ref, emb_ref, wme_ref, bme_ref,
                      scores_ref, gmax_ref,
                      src_ref, dst_ref, mask_ref,
                      *refs, n_nodes, hd, heads, has_carry=False,
                      self_init=False):
    """Pass 1 with in-kernel msg projection: d_msg -> (d_edge_emb part,
    dW_me/db_me grid-accumulated, dnm scatter), d_alpha, d_scale.

    nms_ref packs [nm ‖ scale] so one oh_s gather serves both; the
    per-source d_scale reduction rides as extra columns of the dnm
    scatter (dnmsc_ref is (1, N, HD + heads)) — the separate (N, H)
    gather and (N, H) reduction each cost ~half a full-width MXU pass.

    has_carry: an extra input tile carries the DOWNSTREAM layers'
    accumulated d_edge_emb (the chained k-layer backward,
    pallas_relational_gat_projected_chained); it is aliased with the demb
    output, so the cross-layer cotangent sum never exists as an XLA add."""
    refs = list(refs)
    carry_ref = refs.pop(0) if has_carry else None
    # self_init: the dense self-loop cotangents (d_msg_self, dscale_self)
    # seed the merged scatter accumulator at t == 0 via two sliced
    # stores, replacing the XLA adds AND the (G, N, HD+H) concat over
    # f32 arrays (single-chip path only — the sharded path adds the
    # replicated self terms once after its psum)
    dmsg_self_ref = refs.pop(0) if self_init else None
    da_es_ref = refs.pop(0) if self_init else None
    (demb_ref, dalpha_ref, dnmsc_ref, dwme_ref, dbme_ref) = refs
    f32 = jnp.float32
    cdt = nms_ref.dtype
    sel = _selector(hd, heads, f32)
    g_id = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        if self_init:
            dnmsc_ref[0, :, :hd] = dmsg_self_ref[0]
            dnmsc_ref[0, :, hd:] = da_es_ref[0]
        else:
            dnmsc_ref[0] = jnp.zeros_like(dnmsc_ref[0])

    @pl.when((g_id == 0) & (t == 0))
    def _():
        dwme_ref[...] = jnp.zeros_like(dwme_ref[...])
        dbme_ref[...] = jnp.zeros_like(dbme_ref[...])

    # UNMASKED one-hots: every masked-edge contribution below is killed by
    # a factor of ee (masked in _edge_exp) — d_msg, dalpha*ee, dekb, demb,
    # all scatters — so the (N, T) mask broadcast+multiply is pure waste
    # here (r3 tried this and hit the then-16 MB vmem cap; the raised cap
    # makes it free).
    oh_s, oh_d = _tile_onehots(src_ref, dst_ref, None, n_nodes, cdt)
    emb_t = emb_ref[0]                                           # (D, T) cdt
    g_dst = _gather_ft(oh_d, gc_ref[0])                          # (HD, T)
    emb_bias = _proj_ft(wme_ref, emb_t, cdt) + bme_ref[...].astype(f32)
    g_all = _gather_ft(oh_s, nms_ref[0])                         # (HD+s, T)
    msg = g_all[:hd] + emb_bias                                  # (HD, T)
    scale_src = g_all[hd:hd + heads]                             # (H, T)
    ee = _edge_exp(scores_ref, gmax_ref, mask_ref)               # (H, T)
    alpha_ht = ee * scale_src                                    # (H, T)
    d_msg = _hd_from_h(sel, alpha_ht, cdt) * g_dst               # (HD, T) f32
    d_msg_c = d_msg.astype(cdt)
    # d(edge_emb) via this path: W_me contracted over HD -> (D, T)
    demb_m = jax.lax.dot_general(
        wme_ref[...].astype(cdt), d_msg_c,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)                              # (D, T)
    if has_carry:
        demb_m = demb_m + carry_ref[0].astype(f32)
    demb_ref[0] = demb_m.astype(demb_ref.dtype)
    dwme_ref[...] += jax.lax.dot_general(
        emb_t, d_msg_c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)                              # (D, HD)
    dbme_ref[...] += jnp.sum(d_msg, axis=1, keepdims=True)       # (HD, 1)
    dalpha_ht = _h_from_hd(sel, msg * g_dst)                     # (H, T)
    dalpha_ref[0] = dalpha_ht
    # cdt contraction with f32 accumulate — the transpose of the onehot
    # backend's cdt scale-gather einsum rounds identically. The dscale
    # columns ride the same scatter as d_msg.
    dnmsc_ref[0] += _scatter_ft(
        oh_s, jnp.concatenate([d_msg_c, (dalpha_ht * ee).astype(cdt)],
                              axis=0))


def _bwd2_proj_kernel(nqsd_ref, nk_ref, emb_ref, wke_ref, bke_ref,
                      scores_ref, gmax_ref, dalpha_ref,
                      src_ref, dst_ref, mask_ref, dembm_ref, *refs,
                      n_nodes, hd, heads, self_init=False):
    """Pass 2 with in-kernel key projection: d_s -> (d_edge_emb part,
    dW_ke/db_ke grid-accumulated, dnq/dnk scatters).

    nqsd_ref packs [nq ‖ scale ‖ d_denom]: one oh_s gather replaces the
    query gather plus two (N, H) per-head gathers.

    dembm_ref carries pass 1's d_edge_emb tile and is ALIASED with the
    demb output (input_output_aliases in _proj_bwd_impl): the layer's total
    edge-embedding cotangent demb_m + demb_k is accumulated in-place here
    instead of as an XLA add of two (G, E, D) HBM arrays.

    self_init: two extra inputs (dnq_self, dnk_self) seed the scatter
    accumulators at t == 0, so the returned dnq/dnk are complete and the
    XLA adds disappear (single-chip path only)."""
    refs = list(refs)
    dnq_self_ref = refs.pop(0) if self_init else None
    dnk_self_ref = refs.pop(0) if self_init else None
    (demb_ref, dnq_ref, dnk_ref, dwke_ref, dbke_ref) = refs
    f32 = jnp.float32
    cdt = nqsd_ref.dtype
    sel = _selector(hd, heads, f32)
    s = _plane_stride(heads)
    g_id = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        if self_init:
            dnq_ref[0] = dnq_self_ref[0]
            dnk_ref[0] = dnk_self_ref[0]
        else:
            dnq_ref[0] = jnp.zeros_like(dnq_ref[0])
            dnk_ref[0] = jnp.zeros_like(dnk_ref[0])

    @pl.when((g_id == 0) & (t == 0))
    def _():
        dwke_ref[...] = jnp.zeros_like(dwke_ref[...])
        dbke_ref[...] = jnp.zeros_like(dbke_ref[...])

    oh_s, oh_d = _tile_onehots(src_ref, dst_ref, None, n_nodes, cdt)
    emb_t = emb_ref[0]
    g_all = _gather_ft(oh_s, nqsd_ref[0])                        # (HD+2s, T)
    q_src = g_all[:hd]                                           # (HD, T)
    scale_src = g_all[hd:hd + heads]                             # (H, T)
    dden_src = g_all[hd + s:hd + s + heads]                      # (H, T)
    ekb_t = _proj_ft(wke_ref, emb_t, cdt) + bke_ref[...].astype(f32)
    key = _gather_ft(oh_d, nk_ref[0]) + ekb_t                    # (HD, T)
    d_s_ht = (dalpha_ref[0] * scale_src + dden_src) \
        * _edge_exp(scores_ref, gmax_ref, mask_ref)              # (H, T)
    ds_hd = _hd_from_h(sel, d_s_ht, cdt)                         # (HD, T)
    dekb = ds_hd * q_src                                         # (HD, T) f32
    dekb_c = dekb.astype(cdt)
    demb_k = jax.lax.dot_general(
        wke_ref[...].astype(cdt), dekb_c,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)                              # (D, T)
    demb_ref[0] = (dembm_ref[0].astype(f32) + demb_k) \
        .astype(demb_ref.dtype)
    dwke_ref[...] += jax.lax.dot_general(
        emb_t, dekb_c, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)                              # (D, HD)
    dbke_ref[...] += jnp.sum(dekb, axis=1, keepdims=True)        # (HD, 1)
    dnq_ref[0] += _scatter_ft(oh_s, (ds_hd * key).astype(cdt))
    dnk_ref[0] += _scatter_ft(oh_d, dekb_c)


def _proj_specs(G, N, HD, D, tile_e, heads):
    """BlockSpec family shared by the projected passes (single-chip impls
    AND the edge-sharded shard_map wrappers in
    qagnn_tpu.parallel.edge_shard_pallas)."""
    V = pltpu.VMEM
    s = _plane_stride(heads)
    return {
        "node": pl.BlockSpec((1, N, HD), lambda g, t: (g, 0, 0),
                             memory_space=V),
        # packed node blocks: base + 1 or 2 (N, H)->8-row-group planes
        # (_pack_node_planes), and the dnm-scatter output merged with the
        # per-source dscale columns
        "node1p": pl.BlockSpec((1, N, HD + s), lambda g, t: (g, 0, 0),
                               memory_space=V),
        "node2p": pl.BlockSpec((1, N, HD + 2 * s), lambda g, t: (g, 0, 0),
                               memory_space=V),
        "nodesc": pl.BlockSpec((1, N, HD + heads), lambda g, t: (g, 0, 0),
                               memory_space=V),
        "emb": pl.BlockSpec((1, D, tile_e), lambda g, t: (g, 0, t),
                            memory_space=V),
        "idx": pl.BlockSpec((1, 1, tile_e), lambda g, t: (g, 0, t),
                            memory_space=V),
        "he": pl.BlockSpec((1, heads, tile_e), lambda g, t: (g, 0, t),
                           memory_space=V),
        "nh": pl.BlockSpec((1, N, heads), lambda g, t: (g, 0, 0),
                           memory_space=V),
        "n1": pl.BlockSpec((1, N, 1), lambda g, t: (g, 0, 0),
                           memory_space=V),
        "h1": pl.BlockSpec((1, heads, 1), lambda g, t: (g, 0, 0),
                           memory_space=V),
        "hn": pl.BlockSpec((1, heads, N), lambda g, t: (g, 0, 0),
                           memory_space=V),
        "w": pl.BlockSpec((D, HD), lambda g, t: (0, 0), memory_space=V),
        "b": pl.BlockSpec((HD, 1), lambda g, t: (0, 0), memory_space=V),
    }


def _proj_dims(nq, edge_emb, src, bwd: bool = False):
    G, N, HD = nq.shape
    E = src.shape[1]
    D = edge_emb.shape[1]          # edge_emb rides transposed: (G, D, E)
    assert edge_emb.shape == (G, D, E), edge_emb.shape
    tile_e = _tile_for(E, nq.dtype, bwd=bwd)
    assert E % tile_e == 0, (E, tile_e)
    return G, N, HD, E, D, tile_e


def _proj_pass_a(nq, nk, edge_emb, w_ke, b_ke, src, dst, mask, heads,
                 interpret):
    """Merged scores + online denominators over (this shard's) edges."""
    G, N, HD, E, D, tile_e = _proj_dims(nq, edge_emb, src)
    sp = _proj_specs(G, N, HD, D, tile_e, heads)
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_scores_proj_kernel, n_nodes=N, hd=HD,
                          heads=heads),
        grid=(G, E // tile_e),
        in_specs=[sp["node"], sp["node"], sp["emb"], sp["w"], sp["b"],
                  sp["idx"], sp["idx"], sp["idx"]],
        out_specs=(sp["he"], sp["h1"], sp["hn"], sp["n1"]),
        out_shape=(jax.ShapeDtypeStruct((G, heads, E), f32),
                   jax.ShapeDtypeStruct((G, heads, 1), f32),
                   jax.ShapeDtypeStruct((G, heads, N), f32),
                   jax.ShapeDtypeStruct((G, N, 1), f32)),
        interpret=interpret,
    )(nq, nk, edge_emb, w_ke, b_ke.reshape(HD, 1),
      src[:, None, :], dst[:, None, :], mask[:, None, :])


def _proj_pass_c(nm, edge_emb, w_me, b_me, scores, gmax, scale,
                 src, dst, mask, heads, interpret, self_loop=None,
                 packed=None):
    """Weighted aggregation partials over (this shard's) edges.

    self_loop=(smb, self_alpha): seed the accumulator with the dense
    self-loop term in-kernel (see _aggr_proj_kernel).
    packed: a prebuilt _pack_node_planes(nm, scale) to reuse."""
    G, N, HD, E, D, tile_e = _proj_dims(nm, edge_emb, src)
    sp = _proj_specs(G, N, HD, D, tile_e, heads)
    nms = _pack_node_planes(nm, scale) if packed is None else packed
    inputs = [nms, edge_emb, w_me, b_me.reshape(HD, 1), scores,
              gmax[:, :, None], src[:, None, :], dst[:, None, :],
              mask[:, None, :]]
    in_specs = [sp["node1p"], sp["emb"], sp["w"], sp["b"], sp["he"],
                sp["h1"], sp["idx"], sp["idx"], sp["idx"]]
    if self_loop is not None:
        smb, self_alpha = self_loop
        inputs += [smb, self_alpha.astype(jnp.float32)]
        in_specs += [sp["node"], sp["nh"]]
    return pl.pallas_call(
        functools.partial(_aggr_proj_kernel, n_nodes=N, hd=HD, heads=heads,
                          self_init=self_loop is not None),
        grid=(G, E // tile_e),
        in_specs=in_specs,
        out_specs=sp["node"],
        out_shape=jax.ShapeDtypeStruct((G, N, HD), jnp.float32),
        interpret=interpret,
    )(*inputs)


def _proj_fwd_impl(nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
                   src, dst, mask, heads, interpret):
    f32 = jnp.float32
    G, N, HD = nq.shape

    # pass A (merged): logits + online-rescaled denominators/degrees
    scores, m_edge, denom_hn, deg = _proj_pass_a(
        nq, nk, edge_emb, w_ke, b_ke, src, dst, mask, heads, interpret)

    self_scores = _head_sum_xla(
        nq.astype(f32) * (nk + skb).astype(f32), heads)
    gmax = jnp.maximum(m_edge[:, :, 0],
                       jnp.max(self_scores, axis=1))             # (G, H)
    gmax = jax.lax.stop_gradient(gmax)
    e_self = jnp.exp(self_scores - gmax[:, None, :])
    # re-shift the online denominators from the edge-only running max to
    # the final gmax (all-masked graphs: m = -NEG -> factor exp(-inf) = 0)
    denom_edges = jnp.transpose(denom_hn, (0, 2, 1)) \
        * jnp.exp(m_edge[:, :, 0] - gmax)[:, None, :]            # (G, N, H)

    denom_raw = denom_edges + e_self
    scale = (deg + 1.0) / jnp.maximum(denom_raw, _DENOM_EPS)

    # the dense self-loop contribution seeds the aggregation accumulator
    # inside the kernel — no XLA pass over (G, N, HD) f32 arrays. The
    # packed [nm ‖ scale] array is returned so the backward reuses it
    # instead of re-concatenating (a per-layer (G, N, HD+8) copy).
    nms = _pack_node_planes(nm, scale)
    out = _proj_pass_c(nm, edge_emb, w_me, b_me, scores, gmax, scale,
                       src, dst, mask, heads, interpret,
                       self_loop=(smb, e_self * scale), packed=nms)
    return out, scores, gmax, denom_raw, scale, e_self, nms


def _proj_bwd_pass1(nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
                    src, dst, mask, scores, gmax, scale, e_self, g,
                    heads, interpret, carry=None, fold_self=False,
                    packed=None):
    """Self-loop cotangent prologue (dense XLA) + backward pass 1 over
    (this shard's) edges. Returns ((d_alpha_self, d_msg_self, dsmb),
    (demb_m, dalpha, dscale_edges, dnm_edges, dw_me, db_me2)).

    fold_self: seed the merged dnm/dscale accumulator with the dense
    self-loop cotangents in-kernel — the returned dnm_edges/dscale_edges
    are then COMPLETE (single-chip path; the sharded path keeps the self
    terms outside so they join once after the psum).
    packed: the forward's _pack_node_planes(nm, scale) array to reuse."""
    G, N, HD, E, D, tile_e = _proj_dims(nq, edge_emb, src, bwd=True)
    sp = _proj_specs(G, N, HD, D, tile_e, heads)
    f32 = jnp.float32
    cdt = nq.dtype

    # dense self-loop cotangents (XLA)
    alpha_self = e_self * scale
    d_msg_self = _heads_to_hd_xla(alpha_self, HD) * g
    dsmb = d_msg_self.astype(smb.dtype)
    msg_self = (nm + smb).astype(f32)
    d_alpha_self = _head_sum_xla(msg_self * g, heads)

    # carry: downstream layers' accumulated d_edge_emb (chained backward).
    # It enters pass 1 aliased with the demb output, so the cross-layer sum
    # is folded into the write this kernel already does.
    nms = _pack_node_planes(nm, scale) if packed is None else packed
    b1_inputs = [g.astype(cdt), nms, edge_emb, w_me, b_me.reshape(HD, 1),
                 scores, gmax[:, :, None],
                 src[:, None, :], dst[:, None, :], mask[:, None, :]]
    b1_specs = [sp["node"], sp["node1p"], sp["emb"], sp["w"], sp["b"],
                sp["he"], sp["h1"], sp["idx"], sp["idx"], sp["idx"]]
    b1_aliases = {}
    if carry is not None:
        b1_inputs.append(carry.astype(edge_emb.dtype))
        b1_specs.append(sp["emb"])
        b1_aliases = {10: 0}
    if fold_self:
        b1_inputs += [d_msg_self, d_alpha_self * e_self]
        b1_specs += [sp["node"], sp["nh"]]
    demb_m, dalpha, dnmsc, dw_me, db_me2 = pl.pallas_call(
        functools.partial(_bwd1_proj_kernel, n_nodes=N, hd=HD, heads=heads,
                          has_carry=carry is not None, self_init=fold_self),
        grid=(G, E // tile_e),
        in_specs=b1_specs,
        out_specs=(sp["emb"], sp["he"], sp["nodesc"], sp["w"], sp["b"]),
        out_shape=(jax.ShapeDtypeStruct((G, D, E), edge_emb.dtype),
                   jax.ShapeDtypeStruct((G, heads, E), f32),
                   jax.ShapeDtypeStruct((G, N, HD + heads), f32),
                   jax.ShapeDtypeStruct((D, HD), f32),
                   jax.ShapeDtypeStruct((HD, 1), f32)),
        input_output_aliases=b1_aliases,
        interpret=interpret,
    )(*b1_inputs)
    # split the merged scatter: dnm cotangent columns + per-source dscale
    b1 = (demb_m, dalpha, dnmsc[..., HD:], dnmsc[..., :HD], dw_me, db_me2)
    return (d_alpha_self, d_msg_self, dsmb), b1


def _proj_bwd_glue(nq, nk, skb, denom_raw, scale, e_self, d_alpha_self,
                   dscale, HD):
    """Close the softmax VJP chain (dense XLA): d_denom and the self-loop
    score cotangents. `dscale` must already include ALL edges' per-source
    contributions (psum'd across shards in the edge-partitioned path)."""
    f32 = jnp.float32
    denom_c = jnp.maximum(denom_raw, _DENOM_EPS)
    gate = (denom_raw > _DENOM_EPS).astype(f32)
    d_denom = -(scale / denom_c) * dscale * gate
    d_e_self = d_alpha_self * scale + d_denom
    d_s_self = d_e_self * e_self
    ds_self_hd = _heads_to_hd_xla(d_s_self, HD)
    nqf = nq.astype(f32)
    nkf = nk.astype(f32)
    dskb = (ds_self_hd * nqf).astype(skb.dtype)
    dnq_self = ds_self_hd * (nkf + skb.astype(f32))
    dnk_self = ds_self_hd * nqf
    return d_denom, dskb, dnq_self, dnk_self


def _proj_bwd_pass2(nq, nk, edge_emb, w_ke, b_ke, scores, gmax, dalpha,
                    scale, d_denom, src, dst, mask, demb_m, heads,
                    interpret, self_terms=None):
    """Backward pass 2 over (this shard's) edges; demb_m rides in ALIASED
    with the demb output, so the layer's total edge cotangent costs one
    HBM array instead of two plus an XLA add.

    self_terms=(dnq_self, dnk_self): seed the scatter accumulators with
    the dense self-loop cotangents in-kernel (see _bwd2_proj_kernel)."""
    G, N, HD, E, D, tile_e = _proj_dims(nq, edge_emb, src, bwd=True)
    sp = _proj_specs(G, N, HD, D, tile_e, heads)
    f32 = jnp.float32
    nqsd = _pack_node_planes(nq, scale, d_denom)
    inputs = [nqsd, nk, edge_emb, w_ke, b_ke.reshape(HD, 1), scores,
              gmax[:, :, None], dalpha,
              src[:, None, :], dst[:, None, :], mask[:, None, :], demb_m]
    in_specs = [sp["node2p"], sp["node"], sp["emb"], sp["w"], sp["b"],
                sp["he"], sp["h1"], sp["he"],
                sp["idx"], sp["idx"], sp["idx"], sp["emb"]]
    if self_terms is not None:
        inputs += [self_terms[0], self_terms[1]]
        in_specs += [sp["node"], sp["node"]]
    return pl.pallas_call(
        functools.partial(_bwd2_proj_kernel, n_nodes=N, hd=HD, heads=heads,
                          self_init=self_terms is not None),
        grid=(G, E // tile_e),
        in_specs=in_specs,
        out_specs=(sp["emb"], sp["node"], sp["node"], sp["w"], sp["b"]),
        out_shape=(jax.ShapeDtypeStruct((G, D, E), edge_emb.dtype),
                   jax.ShapeDtypeStruct((G, N, HD), f32),
                   jax.ShapeDtypeStruct((G, N, HD), f32),
                   jax.ShapeDtypeStruct((D, HD), f32),
                   jax.ShapeDtypeStruct((HD, 1), f32)),
        input_output_aliases={11: 0},
        interpret=interpret,
    )(*inputs)


def _proj_bwd_impl(nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
                   src, dst, mask, scores, gmax, denom_raw, scale, e_self, g,
                   heads, interpret, carry=None, nms=None):
    # fold_self: pass 1's merged scatter is seeded with the self-loop
    # cotangents, so dnm/dscale come back complete; nms reuses the
    # forward's packed [nm | scale] residual
    (d_alpha_self, d_msg_self, dsmb), b1 = _proj_bwd_pass1(
        nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
        src, dst, mask, scores, gmax, scale, e_self, g, heads, interpret,
        carry=carry, fold_self=True, packed=nms)
    demb_m, dalpha, dscale, dnm_full, dw_me, db_me2 = b1

    HD = nq.shape[2]
    d_denom, dskb, dnq_self, dnk_self = _proj_bwd_glue(
        nq, nk, skb, denom_raw, scale, e_self, d_alpha_self, dscale, HD)

    d_edge_emb, dnq_full, dnk_full, dw_ke, db_ke2 = _proj_bwd_pass2(
        nq, nk, edge_emb, w_ke, b_ke, scores, gmax, dalpha, scale, d_denom,
        src, dst, mask, demb_m, heads, interpret,
        self_terms=(dnq_self, dnk_self))

    dnq = dnq_full.astype(nq.dtype)
    dnk = dnk_full.astype(nk.dtype)
    dnm = dnm_full.astype(nm.dtype)
    return (dnq, dnk, dnm, d_edge_emb,
            dw_ke.astype(w_ke.dtype), db_ke2.reshape(-1).astype(b_ke.dtype),
            dw_me.astype(w_me.dtype), db_me2.reshape(-1).astype(b_me.dtype),
            dskb, dsmb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def pallas_relational_gat_projected(nq, nk, nm, edge_emb, w_ke, b_ke,
                                    w_me, b_me, skb, smb, src, dst, mask,
                                    heads, interpret=False):
    """Fused sparse attention core with in-kernel edge-bias projections.

    edge_emb: (G, D, E) TRANSPOSED shared edge embeddings (features on
    the sublane axis — the encoder produces this layout natively and
    the in-kernel GEMMs consume it without relayout); w_ke/b_ke, w_me/b_me:
    the key_e / msg_e projection parameters ((D, HD) / (HD,)) applied
    per edge tile on the MXU inside the kernels. Other args as
    pallas_relational_gat. skb/smb are the ALREADY-projected self-loop
    biases (the caller projects self_emb with the same parameters in XLA;
    JAX sums the parameter cotangents across both uses).
    """
    return _proj_fwd_impl(nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me,
                          skb, smb, src, dst, mask, heads, interpret)[0]


def _proj_vjp_fwd(nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
                  src, dst, mask, heads, interpret):
    out, scores, gmax, denom_raw, scale, e_self, nms = _proj_fwd_impl(
        nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
        src, dst, mask, heads, interpret)
    return out, (nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
                 src, dst, mask, scores, gmax, denom_raw, scale, e_self,
                 nms)


def _proj_vjp_bwd(heads, interpret, residuals, g):
    (nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
     src, dst, mask, scores, gmax, denom_raw, scale, e_self,
     nms) = residuals
    grads = _proj_bwd_impl(
        nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
        src, dst, mask, scores, gmax, denom_raw, scale, e_self,
        g.astype(jnp.float32), heads, interpret, nms=nms)
    zero_i = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return grads + (zero_i(src), zero_i(dst), jnp.zeros_like(mask))


pallas_relational_gat_projected.defvjp(_proj_vjp_fwd, _proj_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def pallas_relational_gat_projected_chained(nq, nk, nm, edge_emb, w_ke, b_ke,
                                            w_me, b_me, skb, smb,
                                            src, dst, mask, heads,
                                            interpret=False):
    """Projected op that ALSO passes edge_emb through as a second output.

    The k-layer loop threads the passthrough into the next layer instead of
    handing every layer the same edge_emb array: each (G, E, D) value then
    has exactly ONE consumer, so autodiff routes the edge-embedding
    cotangent through the chain — each layer's backward receives the
    downstream layers' accumulated d_edge_emb as `carry` and folds it into
    its own demb write via input_output_aliases (see _proj_bwd_impl). The
    reference recomputes edge embeddings per layer and pays the sum
    implicitly in torch autograd (reference modeling/modeling_qagnn.py:433);
    here the cross-layer sum never exists as an op at all.

    The passthrough is the same buffer in the dataflow graph (no HBM copy).
    """
    out = _proj_fwd_impl(nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me,
                         skb, smb, src, dst, mask, heads, interpret)[0]
    return out, edge_emb


def _proj_chain_vjp_fwd(nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me,
                        skb, smb, src, dst, mask, heads, interpret):
    out, scores, gmax, denom_raw, scale, e_self, nms = _proj_fwd_impl(
        nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
        src, dst, mask, heads, interpret)
    res = (nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
           src, dst, mask, scores, gmax, denom_raw, scale, e_self, nms)
    return (out, edge_emb), res


def _proj_chain_vjp_bwd(heads, interpret, residuals, g):
    (nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
     src, dst, mask, scores, gmax, denom_raw, scale, e_self,
     nms) = residuals
    g_out, g_emb = g
    grads = _proj_bwd_impl(
        nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
        src, dst, mask, scores, gmax, denom_raw, scale, e_self,
        g_out.astype(jnp.float32), heads, interpret, carry=g_emb, nms=nms)
    zero_i = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return grads + (zero_i(src), zero_i(dst), jnp.zeros_like(mask))


pallas_relational_gat_projected_chained.defvjp(_proj_chain_vjp_fwd,
                                               _proj_chain_vjp_bwd)


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def pallas_relational_gat(nq, nk, nm, ekb, emb, skb, smb,
                          src, dst, mask, heads, interpret=False):
    """Fused sparse attention core.

    nq/nk/nm: (G, N, HD) node projections (query pre-scaled by 1/sqrt(dph));
    ekb/emb: (G, E, HD) edge key/message biases; skb/smb: (G, N, HD)
    self-loop biases; src/dst: (G, E) int32; mask: (G, E) float (1 = real).
    Returns (G, N, HD) float32 aggregated features.
    """
    return _fwd_impl(nq, nk, nm, ekb, emb, skb, smb, src, dst, mask,
                     heads, interpret)[0]


def _vjp_fwd(nq, nk, nm, ekb, emb, skb, smb, src, dst, mask, heads,
             interpret):
    out, e_edge, denom_raw, scale, e_self = _fwd_impl(
        nq, nk, nm, ekb, emb, skb, smb, src, dst, mask, heads, interpret)
    return out, (nq, nk, nm, ekb, emb, skb, smb, src, dst, mask,
                 e_edge, denom_raw, scale, e_self)


def _vjp_bwd(heads, interpret, residuals, g):
    (nq, nk, nm, ekb, emb, skb, smb, src, dst, mask,
     e_edge, denom_raw, scale, e_self) = residuals
    dnq, dnk, dnm, dekb, demb, dskb, dsmb = _bwd_impl(
        nq, nk, nm, ekb, emb, skb, smb, src, dst, mask,
        e_edge, denom_raw, scale, e_self, g.astype(jnp.float32),
        heads, interpret)
    zero_i = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (dnq, dnk, dnm, dekb, demb, dskb, dsmb,
            zero_i(src), zero_i(dst), jnp.zeros_like(mask))


pallas_relational_gat.defvjp(_vjp_fwd, _vjp_bwd)
