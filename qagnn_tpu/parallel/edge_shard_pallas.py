"""Edge-partitioned execution of the FUSED Pallas GAT kernels.

qagnn_tpu.parallel.edge_shard_map partitions the edge dimension with the
XLA onehot formulation. This module is the production-kernel version: each
model-axis device runs the grid-tiled Pallas passes
(qagnn_tpu.ops.pallas_gat) on its local E/P edge slice, and the shards
interact through exactly the collectives the math requires:

  forward:  1. pmax of the per-head online score max       (G, H)
            2. psum of softmax denominators + degrees      (G, N, H+1)
            3. psum of aggregated node features            (G, N, H*D)
  backward: 4. psum of the per-source d_scale reduction    (G, N, H)
            5. psum of node cotangents dnq‖dnk‖dnm         (G, N, 3*H*D)
               + psums of the four projection-param grads  (D, HD)/(HD,)

GSPMD cannot partition a Mosaic custom call, so the declarative path
(graph_sharding) only covers the XLA backends; this op is how the fused
kernels scale over the `model` axis. Autodiff: pallas_call is opaque to
JAX AD and shard_map transpose, so the custom_vjp sits OUTSIDE two
shard_map calls — forward and backward are each one shard_map whose
internal psums make every P(...)-replicated output actually replicated.

Semantics match pallas_relational_gat_projected (and therefore reference
modeling/modeling_qagnn.py:411-484) up to psum reassociation; values and
gradients are cross-checked against the scatter oracle on a virtual
8-device mesh in tests/test_parallel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:                                  # jax >= 0.8
    from jax import shard_map
except ImportError:                   # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from qagnn_tpu.ops import pallas_gat as pg
from qagnn_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

Array = jax.Array


def _local_fwd(nq, nk, nm, emb, wke, bke, wme, bme, skb, smb,
               src, dst, mask, *, heads, interpret):
    """One shard's forward: local Pallas passes + the three collectives."""
    f32 = jnp.float32
    G, N, HD = nq.shape

    # pass A on the local edge slice (merged scores + online denominators)
    scores, m_edge, denom_hn, deg = pg._proj_pass_a(
        nq, nk, emb, wke, bke, src, dst, mask, heads, interpret)

    self_scores = pg._head_sum_xla(
        nq.astype(f32) * (nk + skb).astype(f32), heads)          # (G, N, H)
    # collective 1: global per-head max across edge shards
    gmax = jax.lax.pmax(m_edge[:, :, 0], MODEL_AXIS)             # (G, H)
    gmax = jnp.maximum(gmax, jnp.max(self_scores, axis=1))
    gmax = jax.lax.stop_gradient(gmax)
    e_self = jnp.exp(self_scores - gmax[:, None, :])

    denom_l = jnp.transpose(denom_hn, (0, 2, 1)) \
        * jnp.exp(m_edge[:, :, 0] - gmax)[:, None, :]            # (G, N, H)
    # collective 2: psum of denominators + degrees (one packed halo)
    packed = jax.lax.psum(
        jnp.concatenate([denom_l, deg], axis=-1), MODEL_AXIS)
    denom_raw = packed[..., :heads] + e_self
    scale = (packed[..., heads:] + 1.0) \
        / jnp.maximum(denom_raw, pg._DENOM_EPS)

    out_edges = pg._proj_pass_c(
        nm, emb, wme, bme, scores, gmax, scale, src, dst, mask,
        heads, interpret)
    # collective 3: psum of aggregated features; the (replicated)
    # self-loop term joins AFTER the sum so it is counted once
    out = jax.lax.psum(out_edges, MODEL_AXIS) \
        + (nm + smb).astype(f32) * pg._heads_to_hd_xla(e_self * scale, HD)
    return out, scores, gmax, denom_raw, scale, e_self


def _local_bwd(nq, nk, nm, emb, wke, bke, wme, bme, skb, smb,
               src, dst, mask, scores, gmax, denom_raw, scale, e_self, g,
               *, heads, interpret):
    """One shard's backward: local Pallas passes + collectives 4-5."""
    f32 = jnp.float32
    G, N, HD = nq.shape

    (d_alpha_self, d_msg_self, dsmb), b1 = pg._proj_bwd_pass1(
        nq, nk, nm, emb, wke, bke, wme, bme, skb, smb, src, dst, mask,
        scores, gmax, scale, e_self, g, heads, interpret)
    demb_m, dalpha, dscale_edges, dnm_edges, dw_me, db_me2 = b1

    # collective 4: the per-source d_scale reduction spans all edge shards
    dscale = jax.lax.psum(dscale_edges, MODEL_AXIS) \
        + d_alpha_self * e_self
    (d_denom, dskb, dnq_self, dnk_self) = pg._proj_bwd_glue(
        nq, nk, skb, denom_raw, scale, e_self, d_alpha_self, dscale, HD)

    d_edge_emb, dnq_edges, dnk_edges, dw_ke, db_ke2 = pg._proj_bwd_pass2(
        nq, nk, emb, wke, bke, scores, gmax, dalpha, scale, d_denom,
        src, dst, mask, demb_m, heads, interpret)

    # collective 5: node cotangents packed into one psum; the (identical,
    # replicated) self-loop parts join after
    packed = jax.lax.psum(
        jnp.concatenate([dnq_edges, dnk_edges, dnm_edges], axis=-1),
        MODEL_AXIS)
    dnq = (packed[..., :HD] + dnq_self).astype(nq.dtype)
    dnk = (packed[..., HD:2 * HD] + dnk_self).astype(nk.dtype)
    dnm = (packed[..., 2 * HD:] + d_msg_self).astype(nm.dtype)
    # the projection params are replicated over BOTH axes, so their
    # cotangents sum over all graphs (data) and all edge shards (model)
    both = (DATA_AXIS, MODEL_AXIS)
    dw_ke = jax.lax.psum(dw_ke, both)
    db_ke = jax.lax.psum(db_ke2.reshape(-1), both)
    dw_me = jax.lax.psum(dw_me, both)
    db_me = jax.lax.psum(db_me2.reshape(-1), both)
    return (dnq, dnk, dnm, d_edge_emb,
            dw_ke.astype(wke.dtype), db_ke.astype(bke.dtype),
            dw_me.astype(wme.dtype), db_me.astype(bme.dtype),
            dskb, dsmb)


_NODE3 = P(DATA_AXIS, None, None)
_EDGE2 = P(DATA_AXIS, MODEL_AXIS)
_EMB3 = P(DATA_AXIS, None, MODEL_AXIS)     # (G, D, E) — E over model
_HE3 = P(DATA_AXIS, None, MODEL_AXIS)      # (G, H, E) score planes
_REP2 = P(None, None)
_REP1 = P(None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def pallas_edge_sharded_projected(nq, nk, nm, edge_emb, w_ke, b_ke,
                                  w_me, b_me, skb, smb, src, dst, mask,
                                  heads, mesh, interpret=False):
    """Fused projected GAT core, edge-partitioned over the `model` axis.

    Arguments are GLOBAL arrays: node tensors (G, N, HD) data-sharded /
    model-replicated; edge tensors src/dst/mask (G, E) and the transposed
    edge embedding (G, D, E) sharded on E over `model` (E must divide by
    mesh model size x the kernel tile). Returns (G, N, HD) f32 with the
    node sharding."""
    out, *_ = _fwd_sm(heads, mesh, interpret)(
        nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
        src, dst, mask)
    return out


@functools.cache
def _fwd_sm(heads, mesh, interpret):
    return shard_map(
        functools.partial(_local_fwd, heads=heads, interpret=interpret),
        mesh=mesh,
        in_specs=(_NODE3, _NODE3, _NODE3, _EMB3, _REP2, _REP1, _REP2,
                  _REP1, _NODE3, _NODE3, _EDGE2, _EDGE2, _EDGE2),
        out_specs=(_NODE3, _HE3, P(DATA_AXIS, None), _NODE3, _NODE3,
                   _NODE3),
        check_vma=False,
    )


@functools.cache
def _bwd_sm(heads, mesh, interpret):
    return shard_map(
        functools.partial(_local_bwd, heads=heads, interpret=interpret),
        mesh=mesh,
        in_specs=(_NODE3, _NODE3, _NODE3, _EMB3, _REP2, _REP1, _REP2,
                  _REP1, _NODE3, _NODE3, _EDGE2, _EDGE2, _EDGE2,
                  _HE3, P(DATA_AXIS, None), _NODE3, _NODE3, _NODE3,
                  _NODE3),
        out_specs=(_NODE3, _NODE3, _NODE3, _EMB3, _REP2, _REP1, _REP2,
                   _REP1, _NODE3, _NODE3),
        check_vma=False,
    )


def _sharded_vjp_fwd(nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me,
                     skb, smb, src, dst, mask, heads, mesh, interpret):
    out, scores, gmax, denom_raw, scale, e_self = _fwd_sm(
        heads, mesh, interpret)(
        nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
        src, dst, mask)
    res = (nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
           src, dst, mask, scores, gmax, denom_raw, scale, e_self)
    return out, res


def _sharded_vjp_bwd(heads, mesh, interpret, res, g):
    (nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
     src, dst, mask, scores, gmax, denom_raw, scale, e_self) = res
    grads = _bwd_sm(heads, mesh, interpret)(
        nq, nk, nm, edge_emb, w_ke, b_ke, w_me, b_me, skb, smb,
        src, dst, mask, scores, gmax, denom_raw, scale, e_self,
        g.astype(jnp.float32))
    zero_i = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return grads + (zero_i(src), zero_i(dst), jnp.zeros_like(mask))


pallas_edge_sharded_projected.defvjp(_sharded_vjp_fwd, _sharded_vjp_bwd)


# ---------------------------------------------------------------------------
# fused edge-encoder kernels under the same (data, model) partitioning
# ---------------------------------------------------------------------------
#
# The encoder kernels (qagnn_tpu.ops.pallas_edge_encoder) are pure maps /
# reductions over edges, so their sharded forms are trivial: each shard
# runs the kernels on its (G/d, E/m) slice; the moments and the parameter
# cotangents psum over both axes. As with the GAT op, the custom_vjp sits
# OUTSIDE the shard_maps (pallas is opaque to shard_map transpose). The
# caller must pre-pad E so every model shard is a whole number of kernel
# tiles (ops.pallas_gat.pad_edges_to_tile(shards=...)).

_IDX2 = P(DATA_AXIS, MODEL_AXIS)
_NT2 = P(DATA_AXIS, None)
_H3 = P(DATA_AXIS, None, MODEL_AXIS)


def edge_feature_moments_sharded(edge_type, src, dst, node_type, mask,
                                 n_rel, n_ntype, mesh, interpret=False):
    """Sharded masked feature histogram / second moment / row count —
    data-only (outputs are stop-gradient in the single-device op too)."""
    from qagnn_tpu.ops import pallas_edge_encoder as pe

    def local(etype, src, dst, ntype, mask):
        h, M, n = pe.edge_feature_moments(
            etype, src, dst, ntype, mask, n_rel, n_ntype, interpret)
        both = (DATA_AXIS, MODEL_AXIS)
        return (jax.lax.psum(h, both), jax.lax.psum(M, both),
                jax.lax.psum(n, both))

    return shard_map(
        local, mesh=mesh,
        in_specs=(_IDX2, _IDX2, _IDX2, _NT2, _IDX2),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(edge_type, src, dst, node_type, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def edge_hidden_sharded(edge_type, src, dst, node_type, w0, b0, a, b,
                        n_rel, n_ntype, out_dtype, mesh, interpret=False):
    """h = relu(a * (W0^T feat + b0) + b) as (G, D, E), edge-partitioned:
    a pure per-edge map, so the forward needs NO collectives; the backward
    psums the four parameter cotangents over both mesh axes. E must
    already divide into model-axis shards of whole kernel tiles."""
    return _enc_fwd_sm(n_rel, n_ntype, out_dtype, mesh, interpret)(
        edge_type, src, dst, node_type, w0, b0, a, b)


@functools.cache
def _enc_fwd_sm(n_rel, n_ntype, out_dtype, mesh, interpret):
    from qagnn_tpu.ops import pallas_edge_encoder as pe

    def local(etype, src, dst, ntype, w0, b0, a, b):
        return pe._hidden_impl(etype, src, dst, ntype, w0, b0, a, b,
                               n_rel, n_ntype, out_dtype, interpret)

    return shard_map(
        local, mesh=mesh,
        in_specs=(_IDX2, _IDX2, _IDX2, _NT2, _REP2, _REP1, _REP1, _REP1),
        out_specs=_H3,
        check_vma=False,
    )


@functools.cache
def _enc_bwd_sm(n_rel, n_ntype, out_dtype, mesh, interpret):
    from qagnn_tpu.ops import pallas_edge_encoder as pe

    def local(etype, src, dst, ntype, w0, b0, a, b, dh):
        dw0, db0, da, db = pe._hidden_bwd_impl(
            etype, src, dst, ntype, w0, b0, a, b, dh,
            n_rel, n_ntype, out_dtype, interpret)
        both = (DATA_AXIS, MODEL_AXIS)
        return (jax.lax.psum(dw0, both), jax.lax.psum(db0, both),
                jax.lax.psum(da, both), jax.lax.psum(db, both))

    return shard_map(
        local, mesh=mesh,
        in_specs=(_IDX2, _IDX2, _IDX2, _NT2, _REP2, _REP1, _REP1, _REP1,
                  _H3),
        out_specs=(P(None, None), P(None, None), P(None, None),
                   P(None, None)),
        check_vma=False,
    )


def _enc_vjp_fwd(edge_type, src, dst, node_type, w0, b0, a, b,
                 n_rel, n_ntype, out_dtype, mesh, interpret):
    h = _enc_fwd_sm(n_rel, n_ntype, out_dtype, mesh, interpret)(
        edge_type, src, dst, node_type, w0, b0, a, b)
    return h, (edge_type, src, dst, node_type, w0, b0, a, b)


def _enc_vjp_bwd(n_rel, n_ntype, out_dtype, mesh, interpret, res, dh):
    edge_type, src, dst, node_type, w0, b0, a, b = res
    dw0, db0, da, db = _enc_bwd_sm(n_rel, n_ntype, out_dtype, mesh,
                                   interpret)(
        edge_type, src, dst, node_type, w0, b0, a, b, dh)
    zero_i = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (zero_i(edge_type), zero_i(src), zero_i(dst), zero_i(node_type),
            dw0.astype(w0.dtype), db0[:, 0].astype(b0.dtype),
            da[:, 0].astype(a.dtype), db[:, 0].astype(b.dtype))


edge_hidden_sharded.defvjp(_enc_vjp_fwd, _enc_vjp_bwd)
