"""Pallas TPU kernels for the shared edge-feature encoder's EDGE side.

The reference's edge encoder (reference modeling/modeling_qagnn.py:30,
431-433) is Linear(47 -> D) -> BatchNorm -> ReLU -> Linear(D -> D) over
E+N one-hot feature rows. Run as XLA row GEMMs this costs ~2.2 ms/step at
bench shapes — mostly HBM traffic over (G*E, D) activations plus two
layout copies at the XLA<->Mosaic boundary. Here the edge side becomes
two small kernels and some closed-form algebra:

  * linear_1 never runs: the GAT kernels compose it into their in-kernel
    key_e/msg_e projections (qagnn_tpu.models.gnn.GATConvE emb_proj).
  * The BatchNorm batch moments are ANALYTIC: every input row is a concat
    of three one-hots, so sum(x0) and sum(x0^2) over the masked edge rows
    are closed-form in (W0, b0) given the masked feature histogram `hist`
    (F,) and second moment `M = feat^T feat` (F, F) — tiny, data-only
    quantities produced by `edge_feature_moments`. The moments formulas
    live in XLA (qagnn_tpu.models.gnn.EdgeEncoder), so JAX autodiff
    routes the full BatchNorm-train gradient paths (through mean/var)
    with no hand-derived BN backward.
  * `edge_hidden` emits h = relu(a * (W0^T feat + b0) + b) directly in the
    TRANSPOSED (G, D, E) layout the GAT kernels consume — the (rows, D)
    activations and both boundary relayout copies never exist. Its custom
    VJP accumulates dW0/db0/d_a/d_b across the whole grid in VMEM.

Feature rows match reference modeling/modeling_qagnn.py:419-433:
[one_hot(rel, n_rel) ‖ one_hot(head_type, n_ntype) ‖ one_hot(tail_type,
n_ntype)], F = n_rel + 2*n_ntype (47 for ConceptNet).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qagnn_tpu.ops.pallas_gat import _tile_for

Array = jax.Array


def _feat_onehot(rel_ref, src_ref, dst_ref, ntype_ref, n_rel, n_ntype, cdt,
                 n_nodes):
    """(F, T) concatenated one-hot features for the tile.

    Head/tail node types are gathered IN-KERNEL from the (1, N) node-type
    row via the same (N, T) one-hot matmuls the GAT kernels use — an HLO
    gather of node_type[src] over 262k edges costs ~2.7 ms/step in some
    XLA schedules (the driver train step hit exactly that), while here it
    is two (1, N) x (N, T) matmuls. Small-int arithmetic is exact in f32,
    so the feature one-hot is built as ONE float comparison: row f holds
    the rel one-hot for f < n_rel, then head-type, then tail-type rows."""
    t = rel_ref.shape[-1]
    F = n_rel + 2 * n_ntype
    f32 = jnp.float32
    ids = jax.lax.broadcasted_iota(jnp.int32, (n_nodes, t), 0)
    src = jnp.broadcast_to(src_ref[0], (n_nodes, t))
    oh_s = jnp.maximum(1 - jnp.abs(ids - src), 0).astype(f32)
    dst = jnp.broadcast_to(dst_ref[0], (n_nodes, t))
    oh_d = jnp.maximum(1 - jnp.abs(ids - dst), 0).astype(f32)
    nt = ntype_ref[0].astype(f32)                                # (1, N)
    head = jax.lax.dot_general(
        nt, oh_s, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)                              # (1, T)
    tail = jax.lax.dot_general(
        nt, oh_d, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)

    f_ids = jax.lax.broadcasted_iota(jnp.int32, (F, t), 0).astype(f32)
    rel = jnp.broadcast_to(rel_ref[0], (F, t)).astype(f32)
    head_b = jnp.broadcast_to(head, (F, t)) + n_rel
    tail_b = jnp.broadcast_to(tail, (F, t)) + n_rel + n_ntype
    target = jnp.where(f_ids < n_rel, rel,
                       jnp.where(f_ids < n_rel + n_ntype, head_b, tail_b))
    return jnp.maximum(1.0 - jnp.abs(f_ids - target), 0.0).astype(cdt)


def _pad_e(x, tile, value=0):
    E = x.shape[1]
    E_pad = -(-E // tile) * tile
    if E_pad == E:
        return x
    return jnp.pad(x, ((0, 0), (0, E_pad - E)), constant_values=value)


# ---------------------------------------------------------------------------
# data-only feature moments (hist, M, n) — not differentiable, ints in
# ---------------------------------------------------------------------------

def _moments_kernel(rel_ref, src_ref, dst_ref, ntype_ref, mask_ref,
                    hist_ref, m_ref, n_ref, *, n_rel, n_ntype, n_nodes):
    f32 = jnp.float32
    g = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((g == 0) & (t == 0))
    def _():
        hist_ref[...] = jnp.zeros_like(hist_ref[...])
        m_ref[...] = jnp.zeros_like(m_ref[...])
        n_ref[...] = jnp.zeros_like(n_ref[...])

    ohm = _feat_onehot(rel_ref, src_ref, dst_ref, ntype_ref, n_rel,
                       n_ntype, jnp.bfloat16, n_nodes)
    mask = mask_ref[0].astype(jnp.bfloat16)                      # (1, T)
    ohm = ohm * mask
    # one-hot entries are exact in bf16; f32 accumulation
    m_ref[...] += jax.lax.dot_general(
        ohm, ohm, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)                              # (F, F)
    hist_ref[...] += jnp.sum(ohm.astype(f32), axis=1,
                             keepdims=True)                      # (F, 1)
    n_ref[...] += jnp.sum(mask.astype(f32), keepdims=True)       # (1, 1)


def edge_feature_moments(edge_type, src, dst, node_type, mask,
                         n_rel, n_ntype, interpret=False):
    """Masked feature histogram (F,), second moment M (F, F) and row count
    () over all graphs' edges; head/tail types gathered in-kernel from
    node_type (G, N). Data-only (no parameters): gradients don't flow
    through these; the analytic moment FORMULAS that consume them are
    differentiable XLA."""
    G, E = edge_type.shape
    N = node_type.shape[1]
    tile = _tile_for(E, jnp.bfloat16)
    F = n_rel + 2 * n_ntype

    rel3 = _pad_e(edge_type, tile)[:, None, :]
    src3 = _pad_e(src, tile)[:, None, :]
    dst3 = _pad_e(dst, tile)[:, None, :]
    nt3 = node_type[:, None, :]
    mask3 = _pad_e(mask.astype(jnp.float32), tile)[:, None, :]
    E_pad = rel3.shape[2]

    idx_spec = pl.BlockSpec((1, 1, tile), lambda g, t: (g, 0, t),
                            memory_space=pltpu.VMEM)
    nt_spec = pl.BlockSpec((1, 1, N), lambda g, t: (g, 0, 0),
                           memory_space=pltpu.VMEM)
    acc = lambda shape: pl.BlockSpec(shape, lambda g, t: (0, 0),
                                     memory_space=pltpu.VMEM)

    hist, M, n = pl.pallas_call(
        functools.partial(_moments_kernel, n_rel=n_rel, n_ntype=n_ntype,
                          n_nodes=N),
        grid=(G, E_pad // tile),
        in_specs=[idx_spec, idx_spec, idx_spec, nt_spec, idx_spec],
        out_specs=(acc((F, 1)), acc((F, F)), acc((1, 1))),
        out_shape=(jax.ShapeDtypeStruct((F, 1), jnp.float32),
                   jax.ShapeDtypeStruct((F, F), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        interpret=interpret,
    )(rel3, src3, dst3, nt3, mask3)
    return (jax.lax.stop_gradient(hist[:, 0]),
            jax.lax.stop_gradient(M),
            jax.lax.stop_gradient(n[0, 0]))


# ---------------------------------------------------------------------------
# h = relu(a * (W0^T feat + b0) + b), emitted as (G, D, E)
# ---------------------------------------------------------------------------

def _hidden_fwd_kernel(rel_ref, src_ref, dst_ref, ntype_ref, w0_ref,
                       b0_ref, a_ref, b_ref, h_ref,
                       *, n_rel, n_ntype, n_nodes):
    f32 = jnp.float32
    cdt = h_ref.dtype
    oh = _feat_onehot(rel_ref, src_ref, dst_ref, ntype_ref, n_rel, n_ntype,
                      cdt, n_nodes)
    x0 = jax.lax.dot_general(
        w0_ref[...].astype(cdt), oh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32) + b0_ref[...].astype(f32)    # (D, T)
    pre = a_ref[...].astype(f32) * x0 + b_ref[...].astype(f32)
    h_ref[0] = jnp.maximum(pre, 0.0).astype(cdt)


def _hidden_bwd_kernel(rel_ref, src_ref, dst_ref, ntype_ref, w0_ref,
                       b0_ref, a_ref, b_ref, dh_ref,
                       dw0_ref, db0_ref, da_ref, db_ref,
                       *, n_rel, n_ntype, n_nodes):
    f32 = jnp.float32
    cdt = dh_ref.dtype
    g = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((g == 0) & (t == 0))
    def _():
        dw0_ref[...] = jnp.zeros_like(dw0_ref[...])
        db0_ref[...] = jnp.zeros_like(db0_ref[...])
        da_ref[...] = jnp.zeros_like(da_ref[...])
        db_ref[...] = jnp.zeros_like(db_ref[...])

    oh = _feat_onehot(rel_ref, src_ref, dst_ref, ntype_ref, n_rel, n_ntype,
                      cdt, n_nodes)
    x0 = jax.lax.dot_general(
        w0_ref[...].astype(cdt), oh,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32) + b0_ref[...].astype(f32)    # (D, T)
    pre = a_ref[...].astype(f32) * x0 + b_ref[...].astype(f32)
    rmask = jnp.maximum(jnp.sign(pre), 0.0)                      # relu'
    d_pre = dh_ref[0].astype(f32) * rmask                        # (D, T)
    db_ref[...] += jnp.sum(d_pre, axis=1, keepdims=True)         # (D, 1)
    da_ref[...] += jnp.sum(d_pre * x0, axis=1, keepdims=True)
    d_x0 = d_pre * a_ref[...].astype(f32)
    db0_ref[...] += jnp.sum(d_x0, axis=1, keepdims=True)
    dw0_ref[...] += jax.lax.dot_general(
        oh, d_x0.astype(cdt), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)                              # (F, D)


def _hidden_impl(edge_type, src, dst, node_type, w0, b0, a, b,
                 n_rel, n_ntype, out_dtype, interpret):
    G, E = edge_type.shape
    N = node_type.shape[1]
    D = w0.shape[1]
    tile = _tile_for(E, jnp.dtype(out_dtype))
    rel3 = _pad_e(edge_type, tile)[:, None, :]
    src3 = _pad_e(src, tile)[:, None, :]
    dst3 = _pad_e(dst, tile)[:, None, :]
    nt3 = node_type[:, None, :]
    E_pad = rel3.shape[2]

    idx_spec = pl.BlockSpec((1, 1, tile), lambda g, t: (g, 0, t),
                            memory_space=pltpu.VMEM)
    nt_spec = pl.BlockSpec((1, 1, N), lambda g, t: (g, 0, 0),
                           memory_space=pltpu.VMEM)
    par = lambda shape: pl.BlockSpec(shape, lambda g, t: (0, 0),
                                     memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((1, D, tile), lambda g, t: (g, 0, t),
                          memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_hidden_fwd_kernel, n_rel=n_rel, n_ntype=n_ntype,
                          n_nodes=N),
        grid=(G, E_pad // tile),
        in_specs=[idx_spec, idx_spec, idx_spec, nt_spec,
                  par(w0.shape), par((D, 1)), par((D, 1)), par((D, 1))],
        out_specs=h_spec,
        out_shape=jax.ShapeDtypeStruct((G, D, E_pad), out_dtype),
        interpret=interpret,
    )(rel3, src3, dst3, nt3, w0, b0.reshape(D, 1), a.reshape(D, 1),
      b.reshape(D, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def edge_hidden(edge_type, src, dst, node_type, w0, b0, a, b,
                n_rel, n_ntype, out_dtype, interpret=False):
    """h = relu(a * (W0^T feat + b0) + b) as (G, D, E_pad), E padded to the
    kernel tile; head/tail types gathered in-kernel from node_type (G, N).
    a/b are the folded BatchNorm affine (gamma*inv, beta - mean*gamma*inv)
    — f32 (D,) vectors, differentiable upstream through the analytic
    moment formulas."""
    return _hidden_impl(edge_type, src, dst, node_type, w0, b0, a, b,
                        n_rel, n_ntype, out_dtype, interpret)


def _hidden_vjp_fwd(edge_type, src, dst, node_type, w0, b0, a, b,
                    n_rel, n_ntype, out_dtype, interpret):
    h = _hidden_impl(edge_type, src, dst, node_type, w0, b0, a, b,
                     n_rel, n_ntype, out_dtype, interpret)
    return h, (edge_type, src, dst, node_type, w0, b0, a, b)


def _hidden_bwd_impl(edge_type, src, dst, node_type, w0, b0, a, b, dh,
                     n_rel, n_ntype, out_dtype, interpret):
    """Raw f32 (dw0, db0, da, db) accumulated over (this shard's) edges —
    shared by the single-device VJP and the shard_map wrapper
    (parallel/edge_shard_pallas.edge_hidden_sharded)."""
    G, E = edge_type.shape
    N = node_type.shape[1]
    D = w0.shape[1]
    tile = _tile_for(E, jnp.dtype(out_dtype))
    rel3 = _pad_e(edge_type, tile)[:, None, :]
    src3 = _pad_e(src, tile)[:, None, :]
    dst3 = _pad_e(dst, tile)[:, None, :]
    nt3 = node_type[:, None, :]
    E_pad = rel3.shape[2]
    assert dh.shape == (G, D, E_pad), (dh.shape, (G, D, E_pad))

    idx_spec = pl.BlockSpec((1, 1, tile), lambda g, t: (g, 0, t),
                            memory_space=pltpu.VMEM)
    nt_spec = pl.BlockSpec((1, 1, N), lambda g, t: (g, 0, 0),
                           memory_space=pltpu.VMEM)
    par = lambda shape: pl.BlockSpec(shape, lambda g, t: (0, 0),
                                     memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((1, D, tile), lambda g, t: (g, 0, t),
                          memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_hidden_bwd_kernel, n_rel=n_rel, n_ntype=n_ntype,
                          n_nodes=N),
        grid=(G, E_pad // tile),
        in_specs=[idx_spec, idx_spec, idx_spec, nt_spec,
                  par(w0.shape), par((D, 1)), par((D, 1)), par((D, 1)),
                  h_spec],
        out_specs=(par(w0.shape), par((D, 1)), par((D, 1)), par((D, 1))),
        out_shape=(jax.ShapeDtypeStruct(w0.shape, jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32),
                   jax.ShapeDtypeStruct((D, 1), jnp.float32)),
        interpret=interpret,
    )(rel3, src3, dst3, nt3, w0, b0.reshape(D, 1), a.reshape(D, 1),
      b.reshape(D, 1), dh.astype(jnp.dtype(out_dtype)))


def _hidden_vjp_bwd(n_rel, n_ntype, out_dtype, interpret, res, dh):
    edge_type, src, dst, node_type, w0, b0, a, b = res
    dw0, db0, da, db = _hidden_bwd_impl(
        edge_type, src, dst, node_type, w0, b0, a, b, dh,
        n_rel, n_ntype, out_dtype, interpret)

    zero_i = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (zero_i(edge_type), zero_i(src), zero_i(dst), zero_i(node_type),
            dw0.astype(w0.dtype), db0[:, 0].astype(b0.dtype),
            da[:, 0].astype(a.dtype), db[:, 0].astype(b.dtype))


edge_hidden.defvjp(_hidden_vjp_fwd, _hidden_vjp_bwd)


def analytic_edge_moments(w0, b0, hist, M, n):
    """Closed-form masked-row sums of x0 = feat @ W0 + b0 and x0^2:

        s1[d] = hist . W0[:, d] + n * b0[d]
        s2[d] = W0[:, d]^T M W0[:, d] + 2 b0[d] (hist . W0[:, d]) + n b0[d]^2

    Differentiable in (w0, b0); hist/M/n are data (stop-gradient). These
    are EXACT f32 moments of the one-hot rows — the row-GEMM path's sums
    round x0 through the compute dtype first.
    """
    w0 = w0.astype(jnp.float32)
    b0 = b0.astype(jnp.float32)
    hw = hist @ w0                                               # (D,)
    s1 = hw + n * b0
    quad = jnp.sum(w0 * (M @ w0), axis=0)                        # (D,)
    s2 = quad + 2.0 * b0 * hw + n * b0 * b0
    return s1, s2
