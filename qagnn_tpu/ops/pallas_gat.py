"""Pallas TPU fused kernels (forward AND backward) for the relational GAT core.

Fuses the whole per-graph chain — one-hot build, node->edge gathers (MXU),
SDDMM, source-grouped softmax with analytic self-loops, out-degree rescale,
weighted scatter-add (SpMM) — into ONE kernel with all intermediates in VMEM.
The XLA "onehot" backend (qagnn_tpu.ops.gat_attention) materializes every
(E, N) one-hot and every (E, H*D) temporary in HBM; here HBM traffic shrinks
to the actual inputs/outputs, the main lever for this bandwidth-bound op.

TPU layout decisions (v5e Mosaic):
  * indices/mask ride as (G, 1, E) — edge dim on LANES. A (E, 1) layout pads
    each scalar to a 128-lane row (2 MB per operand, double-buffered = OOM).
  * one-hots are built TRANSPOSED, (N, T): node ids vary along sublanes via
    broadcasted_iota(dim 0), edge indices broadcast along sublanes from the
    lane-major (1, T) slice — no cross-layout transposes anywhere.
  * one-hot built by integer arithmetic max(1-|ids-idx|, 0): v5e Mosaic
    rejects vector compares against broadcast operands.
  * per-head score reduction via a block-diagonal selector matmul
    (HD, H)-shaped — dph is not lane-aligned, reshapes to (.., H, dph) are
    not; the selector keeps everything MXU-shaped.
  * per-edge scores/exp live as (H, E) buffers — (E, H) would pad H->128.
  * all matmul accumulators f32 (Mosaic requires 32-bit acc).
  * softmax uses a per-graph GLOBAL max shift per head — exact per-group
    softmax, guarded denominator (same scheme as the XLA onehot backend,
    which stop-gradients the shift; the backward treats it as constant).

grid = (G,); each program handles one graph, looping over edge tiles of
TILE_E so VMEM holds only (N, TILE_E)-sized one-hots.

The forward emits small residuals (exp-scores (H, E), raw softmax
denominators, degree/denominator scales, self-loop exps — ~(4E + 12N)·H
floats per graph) that the fused backward kernel consumes; node->edge
gathers are recomputed from one-hot tiles in VMEM rather than saved, so the
backward's HBM traffic is again just real inputs/outputs/gradients.

Semantics match qagnn_tpu.ops.gat_attention.relational_gat_attention_nodes
(reference modeling/modeling_qagnn.py:411-484); forward and backward are
cross-checked against the XLA backends' values and VJPs in
tests/test_pallas_gat.py (interpret mode) and on real TPU via bench.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE_E = 1024
_DENOM_EPS = 1e-16


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


def _tile_onehots(src_ref, dst_ref, mask_ref, n_nodes, tile_e, cdt, t):
    """Transposed masked one-hots (N, T) for edge tile t.

    src/dst/mask refs are (1, 1, E) blocks — edge dim on lanes.
    """
    a = t * tile_e
    src = jnp.broadcast_to(src_ref[0, :, pl.ds(a, tile_e)],
                           (n_nodes, tile_e))                 # (N, T)
    dst = jnp.broadcast_to(dst_ref[0, :, pl.ds(a, tile_e)],
                           (n_nodes, tile_e))
    m = jnp.broadcast_to(mask_ref[0, :, pl.ds(a, tile_e)],
                         (n_nodes, tile_e)).astype(cdt)
    ids = jax.lax.broadcasted_iota(jnp.int32, (n_nodes, tile_e), 0)
    oh_s = jnp.maximum(1 - jnp.abs(ids - src), 0).astype(cdt) * m
    oh_d = jnp.maximum(1 - jnp.abs(ids - dst), 0).astype(cdt) * m
    return oh_s, oh_d


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(nq_ref, nk_ref, nm_ref, ekb_ref, emb_ref, skb_ref, smb_ref,
                src_ref, dst_ref, mask_ref,
                out_ref, eedge_ref, denom_ref, scale_ref, eself_ref,
                deg_ref,
                *, n_nodes, n_edges, hd, heads, tile_e):
    f32 = jnp.float32
    cdt = nq_ref.dtype
    N, HD, H = n_nodes, hd, heads
    S32 = _selector(HD, H, f32)           # (HD, H)

    nq = nq_ref[0]                        # (N, HD)
    nk = nk_ref[0]
    nm = nm_ref[0]

    n_tiles = n_edges // tile_e
    onehots_t = functools.partial(_tile_onehots, src_ref, dst_ref, mask_ref,
                                  N, tile_e, cdt)

    def gather(oh_t, nodes):
        """(N, T)^T @ (N, F) -> (T, F), f32 accumulate."""
        return jax.lax.dot_general(
            oh_t, nodes, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    # ---- pass A: per-edge attention logits -> eedge_ref (H, E) ----------
    def pass_a(t, carry):
        a = t * tile_e
        oh_s, oh_d = onehots_t(t)
        eq = gather(oh_s, nq)                                    # (T, HD)
        ek = gather(oh_d, nk) + ekb_ref[0, pl.ds(a, tile_e)].astype(f32)
        # (HD, H)^T contracted with (T, HD) over HD -> (H, T)
        scores = jax.lax.dot_general(
            S32, eq * ek, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=f32)                          # (H, T)
        eedge_ref[0, :, pl.ds(a, tile_e)] = scores
        return carry

    jax.lax.fori_loop(0, n_tiles, pass_a, 0)

    # self-loop logits (N, H)
    sk = (nk + skb_ref[0]).astype(f32)
    self_scores = jnp.dot(nq.astype(f32) * sk, S32,
                          preferred_element_type=f32)            # (N, H)

    # ---- global per-head max shift --------------------------------------
    mask_all = mask_ref[0].astype(f32)                           # (1, E) 0/1
    scores_all = eedge_ref[0]                                    # (H, E)
    masked_scores = scores_all * mask_all + (mask_all - 1.0) * 1e30
    gmax = jnp.maximum(
        jnp.max(masked_scores, axis=1, keepdims=True),           # (H, 1)
        jnp.max(self_scores, axis=0, keepdims=True).reshape(H, 1))
    e_edge = jnp.exp(scores_all - gmax) * mask_all               # (H, E)
    eedge_ref[0] = e_edge
    e_self = jnp.exp(self_scores - gmax.reshape(1, H))           # (N, H)
    eself_ref[0] = e_self

    # ---- pass B: denominators + degrees ---------------------------------
    denom_ref[0] = e_self
    deg_ref[...] = jnp.zeros((N, H), f32)

    def pass_b(t, carry):
        a = t * tile_e
        oh_s, _ = onehots_t(t)
        et = eedge_ref[0, :, pl.ds(a, tile_e)]                   # (H, T)
        # (N, T) @ (H, T)^T -> (N, H)
        part = jax.lax.dot_general(
            oh_s.astype(f32), et,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        denom_ref[0] += part
        deg_part = jnp.sum(oh_s.astype(f32), axis=1).reshape(N, 1)
        deg_ref[...] += jnp.broadcast_to(deg_part, (N, H))
        return carry

    jax.lax.fori_loop(0, n_tiles, pass_b, 0)

    denom = jnp.maximum(denom_ref[0], _DENOM_EPS)                # (N, H)
    deg = deg_ref[...][:, 0:1] + 1.0                             # (N, 1)
    scale_n = deg / denom                                        # (N, H)
    scale_ref[0] = scale_n

    # ---- pass C: weighted aggregation at dst ----------------------------
    sm_full = (nm + smb_ref[0]).astype(f32)                      # (N, HD)
    self_alpha = e_self * scale_n                                # (N, H)
    # per-head broadcast back to HD lanes: (N, H) @ (HD, H)^T
    acc = sm_full * jax.lax.dot_general(
        self_alpha, S32, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)                              # (N, HD)
    out_ref[0] = acc.astype(out_ref.dtype)

    def pass_c(t, carry):
        a = t * tile_e
        oh_s, oh_d = onehots_t(t)
        msg = gather(oh_s, nm) + emb_ref[0, pl.ds(a, tile_e)].astype(f32)
        # scale at src per edge: (N, T)^T @ (N, H) -> (T, H)
        scale_e = jax.lax.dot_general(
            oh_s.astype(f32), scale_ref[0],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)                          # (T, H)
        # alpha (T, H) = e_edge tile (H, T) transposed (via identity matmul —
        # cheaper and safer than a Mosaic relayout transpose) * scale_e
        et = eedge_ref[0, :, pl.ds(a, tile_e)]                   # (H, T)
        et_t = jax.lax.dot_general(
            et, _eye(H, f32), dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)                          # (T, H)
        alpha_th = et_t * scale_e                                # (T, H)
        w = (msg * jax.lax.dot_general(
            alpha_th, S32, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)).astype(cdt)             # (T, HD)
        part = jnp.dot(oh_d, w, preferred_element_type=f32)      # (N, HD)
        out_ref[0] += part.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, n_tiles, pass_c, 0)


def _fwd_impl(nq, nk, nm, ekb, emb, skb, smb, src, dst, mask, heads,
              interpret):
    """Returns (out, e_edge, denom_raw, scale, e_self)."""
    G, N, HD = nq.shape
    E = src.shape[1]
    tile_e = min(TILE_E, E)
    assert E % tile_e == 0, (E, tile_e)

    kernel = functools.partial(_fwd_kernel, n_nodes=N, n_edges=E, hd=HD,
                               heads=heads, tile_e=tile_e)

    node_spec = pl.BlockSpec((1, N, HD), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    edge_spec = pl.BlockSpec((1, E, HD), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    # indices/mask as (G, 1, E): edge dim on lanes (see module docstring)
    idx_spec = pl.BlockSpec((1, 1, E), lambda g: (g, 0, 0),
                            memory_space=pltpu.VMEM)
    he_spec = pl.BlockSpec((1, heads, E), lambda g: (g, 0, 0),
                           memory_space=pltpu.VMEM)
    nh_spec = pl.BlockSpec((1, N, heads), lambda g: (g, 0, 0),
                           memory_space=pltpu.VMEM)

    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[node_spec, node_spec, node_spec, edge_spec, edge_spec,
                  node_spec, node_spec, idx_spec, idx_spec, idx_spec],
        out_specs=(pl.BlockSpec((1, N, HD), lambda g: (g, 0, 0),
                                memory_space=pltpu.VMEM),
                   he_spec, nh_spec, nh_spec, nh_spec),
        out_shape=(jax.ShapeDtypeStruct((G, N, HD), f32),
                   jax.ShapeDtypeStruct((G, heads, E), f32),   # exp scores
                   jax.ShapeDtypeStruct((G, N, heads), f32),   # raw denom
                   jax.ShapeDtypeStruct((G, N, heads), f32),   # deg/denom
                   jax.ShapeDtypeStruct((G, N, heads), f32)),  # self exps
        scratch_shapes=[
            pltpu.VMEM((N, heads), jnp.float32),   # degree accumulator
        ],
        interpret=interpret,
    )(nq, nk, nm, ekb, emb, skb, smb,
      src[:, None, :], dst[:, None, :], mask[:, None, :])


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(g_ref, nq_ref, nk_ref, nm_ref, ekb_ref, emb_ref,
                skb_ref, smb_ref, src_ref, dst_ref, mask_ref,
                eedge_ref, denom_ref, scale_ref, eself_ref,
                dnq_ref, dnk_ref, dnm_ref, dekb_ref, demb_ref,
                dskb_ref, dsmb_ref,
                dalpha_ref, dscale_ref, ddenom_ref,
                accq_ref, acck_ref, accm_ref,
                *, n_nodes, n_edges, hd, heads, tile_e):
    """Fused VJP. Cotangent flow (gmax shift is a constant, matching the
    XLA onehot backend's stop_gradient):

        out_n   = sum_{e: dst=n} alpha_e . msg_e + alpha_n^self . msg_n^self
        alpha_e = e_e * scale[src_e];   alpha_n^self = e_n * scale_n
        scale_n = deg_n / max(denom_n, eps);  denom_n = sum_{src=n} e_e + e_n
        e_e     = exp(s_e - gmax) * mask_e;   e_n = exp(s_n^self - gmax)
        s_e     = <q[src_e], k[dst_e] + ekb_e>_h (per head)
        msg_e   = m[src_e] + emb_e;  with self-loop analogues via skb/smb.

    Pass 1 (per edge tile): d_msg -> (demb, dnm), d_alpha -> stored (H, E),
    and the per-source accumulation d_scale. Then the dense self-loop block
    closes d_scale and computes d_denom. Pass 2: d_s per edge ->
    (dekb, dnq, dnk). All node cotangents accumulate in f32 scratch.
    """
    f32 = jnp.float32
    cdt = nq_ref.dtype
    N, HD, H = n_nodes, hd, heads
    S32 = _selector(HD, H, f32)
    EYE_H = _eye(H, f32)

    g = g_ref[0].astype(f32)              # (N, HD) upstream cotangent
    gc = g_ref[0].astype(cdt)             # compute-dtype copy for gathers
    nq = nq_ref[0]
    nk = nk_ref[0]
    nm = nm_ref[0]
    scale = scale_ref[0]                  # (N, H) f32
    denom_raw = denom_ref[0]
    e_self = eself_ref[0]

    n_tiles = n_edges // tile_e
    onehots_t = functools.partial(_tile_onehots, src_ref, dst_ref, mask_ref,
                                  N, tile_e, cdt)

    def gather(oh_t, nodes):
        return jax.lax.dot_general(
            oh_t, nodes, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def scatter_acc(oh_t, vals):
        """(N, T) @ (T, F) -> (N, F), f32 accumulate."""
        return jax.lax.dot_general(
            oh_t, vals, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    def to_hd(x_th):
        """(T, H) -> (T, HD) per-head broadcast."""
        return jax.lax.dot_general(
            x_th, S32, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    def to_th(x_ht):
        """(H, T) -> (T, H) via identity matmul (no Mosaic relayout)."""
        return jax.lax.dot_general(
            x_ht, EYE_H, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def gather_nh(oh_t, vals_nh):
        """(N, T)^T @ (N, H) -> (T, H) in f32."""
        return jax.lax.dot_general(
            oh_t.astype(f32), vals_nh,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    # ---- self-loop message cotangents (independent of the edge passes) ---
    alpha_self = e_self * scale                                  # (N, H)
    d_msg_self = jax.lax.dot_general(
        alpha_self, S32, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32) * g                          # (N, HD)
    dsmb_ref[0] = d_msg_self.astype(dsmb_ref.dtype)
    accm_ref[...] = d_msg_self
    msg_self = (nm + smb_ref[0]).astype(f32)
    d_alpha_self = jnp.dot(msg_self * g, S32,
                           preferred_element_type=f32)           # (N, H)
    dscale_ref[...] = d_alpha_self * e_self

    # ---- pass 1: d_msg / d_alpha / d_scale per edge tile -----------------
    def pass1(t, carry):
        a = t * tile_e
        oh_s, oh_d = onehots_t(t)
        g_dst = gather(oh_d, gc)                                 # (T, HD)
        msg = gather(oh_s, nm) + emb_ref[0, pl.ds(a, tile_e)].astype(f32)
        et = eedge_ref[0, :, pl.ds(a, tile_e)]                   # (H, T)
        scale_src = gather_nh(oh_s, scale)                       # (T, H)
        alpha_th = to_th(et) * scale_src                         # (T, H)
        d_msg = to_hd(alpha_th) * g_dst                          # (T, HD)
        demb_ref[0, pl.ds(a, tile_e)] = d_msg.astype(demb_ref.dtype)
        accm_ref[...] += scatter_acc(oh_s, d_msg.astype(cdt))
        dalpha_ht = jax.lax.dot_general(
            S32, msg * g_dst, dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=f32)                          # (H, T)
        dalpha_ref[:, pl.ds(a, tile_e)] = dalpha_ht
        # per-source sum of d_alpha * e_edge -> d_scale (N, H)
        dscale_ref[...] += jax.lax.dot_general(
            oh_s.astype(f32), dalpha_ht * et,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        return carry

    jax.lax.fori_loop(0, n_tiles, pass1, 0)

    # ---- close the softmax chain ----------------------------------------
    denom_c = jnp.maximum(denom_raw, _DENOM_EPS)
    gate = (denom_raw > _DENOM_EPS).astype(f32)
    d_denom = -(scale / denom_c) * dscale_ref[...] * gate        # (N, H)
    ddenom_ref[...] = d_denom
    d_e_self = d_alpha_self * scale + d_denom
    d_s_self = d_e_self * e_self                                 # (N, H)
    ds_self_hd = jax.lax.dot_general(
        d_s_self, S32, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)                              # (N, HD)
    nqf = nq.astype(f32)
    nkf = nk.astype(f32)
    dskb_ref[0] = (ds_self_hd * nqf).astype(dskb_ref.dtype)
    accq_ref[...] = ds_self_hd * (nkf + skb_ref[0].astype(f32))
    acck_ref[...] = ds_self_hd * nqf

    # ---- pass 2: d_s per edge -> dekb / dnq / dnk ------------------------
    def pass2(t, carry):
        a = t * tile_e
        oh_s, oh_d = onehots_t(t)
        q_src = gather(oh_s, nq)                                 # (T, HD)
        key = gather(oh_d, nk) + ekb_ref[0, pl.ds(a, tile_e)].astype(f32)
        et_t = to_th(eedge_ref[0, :, pl.ds(a, tile_e)])          # (T, H)
        dalpha_th = to_th(dalpha_ref[:, pl.ds(a, tile_e)])       # (T, H)
        scale_src = gather_nh(oh_s, scale)                       # (T, H)
        dden_src = gather_nh(oh_s, ddenom_ref[...])              # (T, H)
        d_s_th = (dalpha_th * scale_src + dden_src) * et_t       # (T, H)
        ds_hd = to_hd(d_s_th)                                    # (T, HD)
        dekb_ref[0, pl.ds(a, tile_e)] = (ds_hd * q_src).astype(dekb_ref.dtype)
        accq_ref[...] += scatter_acc(oh_s, (ds_hd * key).astype(cdt))
        acck_ref[...] += scatter_acc(oh_d, (ds_hd * q_src).astype(cdt))
        return carry

    jax.lax.fori_loop(0, n_tiles, pass2, 0)

    dnq_ref[0] = accq_ref[...].astype(dnq_ref.dtype)
    dnk_ref[0] = acck_ref[...].astype(dnk_ref.dtype)
    dnm_ref[0] = accm_ref[...].astype(dnm_ref.dtype)


def _bwd_impl(nq, nk, nm, ekb, emb, skb, smb, src, dst, mask,
              e_edge, denom_raw, scale, e_self, g, heads, interpret):
    G, N, HD = nq.shape
    E = src.shape[1]
    tile_e = min(TILE_E, E)
    assert E % tile_e == 0, (E, tile_e)

    kernel = functools.partial(_bwd_kernel, n_nodes=N, n_edges=E, hd=HD,
                               heads=heads, tile_e=tile_e)

    node_spec = pl.BlockSpec((1, N, HD), lambda g_: (g_, 0, 0),
                             memory_space=pltpu.VMEM)
    edge_spec = pl.BlockSpec((1, E, HD), lambda g_: (g_, 0, 0),
                             memory_space=pltpu.VMEM)
    idx_spec = pl.BlockSpec((1, 1, E), lambda g_: (g_, 0, 0),
                            memory_space=pltpu.VMEM)
    he_spec = pl.BlockSpec((1, heads, E), lambda g_: (g_, 0, 0),
                           memory_space=pltpu.VMEM)
    nh_spec = pl.BlockSpec((1, N, heads), lambda g_: (g_, 0, 0),
                           memory_space=pltpu.VMEM)

    node_out = jax.ShapeDtypeStruct((G, N, HD), nq.dtype)
    edge_out = jax.ShapeDtypeStruct((G, E, HD), ekb.dtype)
    f32 = jnp.float32

    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[node_spec,                      # g (upstream, f32)
                  node_spec, node_spec, node_spec,
                  edge_spec, edge_spec, node_spec, node_spec,
                  idx_spec, idx_spec, idx_spec,
                  he_spec, nh_spec, nh_spec, nh_spec],
        out_specs=(node_spec, node_spec, node_spec,
                   edge_spec, edge_spec, node_spec, node_spec),
        out_shape=(node_out, node_out, node_out,   # dnq dnk dnm
                   edge_out, edge_out,             # dekb demb
                   node_out, node_out),            # dskb dsmb
        scratch_shapes=[
            pltpu.VMEM((heads, E), f32),   # d_alpha
            pltpu.VMEM((N, heads), f32),   # d_scale
            pltpu.VMEM((N, heads), f32),   # d_denom
            pltpu.VMEM((N, HD), f32),      # dnq accumulator
            pltpu.VMEM((N, HD), f32),      # dnk accumulator
            pltpu.VMEM((N, HD), f32),      # dnm accumulator
        ],
        interpret=interpret,
    )(g, nq, nk, nm, ekb, emb, skb, smb,
      src[:, None, :], dst[:, None, :], mask[:, None, :],
      e_edge, denom_raw, scale, e_self)


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
