"""Pallas TPU fused kernel for the relational GAT sparse core.

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
  * per-edge scores/exp live as (H, E) scratch — (E, H) would pad H->128.
  * all matmul accumulators f32 (Mosaic requires 32-bit acc).
  * softmax uses a per-graph GLOBAL max shift per head — exact per-group
    softmax, guarded denominator (same scheme as the XLA onehot backend).

grid = (G,); each program handles one graph, looping over edge tiles of
TILE_E so VMEM holds only (N, TILE_E)-sized one-hots.

Semantics match qagnn_tpu.ops.gat_attention.relational_gat_attention_nodes
(reference modeling/modeling_qagnn.py:411-484); cross-checked in tests via
interpret mode and against the XLA backends. The backward currently reuses
the XLA path's VJP on saved inputs (a fused backward kernel is the planned
follow-up).
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


def _selector(hd: int, h: int, dtype):
    """(HD, H) block-diagonal 0/1 matrix: column h selects head h's slice."""
    dph = hd // h
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (hd, h), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (hd, h), 1)
    return ((d_ids // dph - h_ids) == 0).astype(dtype)


def _fwd_kernel(nq_ref, nk_ref, nm_ref, ekb_ref, emb_ref, skb_ref, smb_ref,
                src_ref, dst_ref, mask_ref, out_ref,
                eedge_ref, denom_ref, scalen_ref,
                *, n_nodes, n_edges, hd, heads, tile_e):
    f32 = jnp.float32
    cdt = nq_ref.dtype
    N, HD, H = n_nodes, hd, heads
    S32 = _selector(HD, H, f32)           # (HD, H)

    nq = nq_ref[0]                        # (N, HD)
    nk = nk_ref[0]
    nm = nm_ref[0]

    n_tiles = n_edges // tile_e

    def onehots_t(t):
        """Transposed masked one-hots (N, T) for tile t."""
        a = t * tile_e
        src = jnp.broadcast_to(src_ref[0, :, pl.ds(a, tile_e)],
                               (N, tile_e))                      # (N, T)
        dst = jnp.broadcast_to(dst_ref[0, :, pl.ds(a, tile_e)],
                               (N, tile_e))
        m = jnp.broadcast_to(mask_ref[0, :, pl.ds(a, tile_e)],
                             (N, tile_e)).astype(cdt)
        ids = jax.lax.broadcasted_iota(jnp.int32, (N, tile_e), 0)
        oh_s = jnp.maximum(1 - jnp.abs(ids - src), 0).astype(cdt) * m
        oh_d = jnp.maximum(1 - jnp.abs(ids - dst), 0).astype(cdt) * m
        return oh_s, oh_d

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
        eedge_ref[:, pl.ds(a, tile_e)] = scores
        return carry

    jax.lax.fori_loop(0, n_tiles, pass_a, 0)

    # self-loop logits (N, H)
    sk = (nk + skb_ref[0]).astype(f32)
    self_scores = jnp.dot(nq.astype(f32) * sk, S32,
                          preferred_element_type=f32)            # (N, H)

    # ---- global per-head max shift --------------------------------------
    mask_all = mask_ref[0].astype(f32)                           # (1, E) 0/1
    scores_all = eedge_ref[...]                                  # (H, E)
    masked_scores = scores_all * mask_all + (mask_all - 1.0) * 1e30
    gmax = jnp.maximum(
        jnp.max(masked_scores, axis=1, keepdims=True),           # (H, 1)
        jnp.max(self_scores, axis=0, keepdims=True).reshape(H, 1))
    e_edge = jnp.exp(scores_all - gmax) * mask_all               # (H, E)
    eedge_ref[...] = e_edge
    e_self = jnp.exp(self_scores - gmax.reshape(1, H))           # (N, H)

    # ---- pass B: denominators + degrees ---------------------------------
    denom_ref[...] = e_self
    scalen_ref[...] = jnp.zeros((N, H), f32)   # reused as degree accumulator

    def pass_b(t, carry):
        a = t * tile_e
        oh_s, _ = onehots_t(t)
        et = eedge_ref[:, pl.ds(a, tile_e)]                      # (H, T)
        # (N, T) @ (H, T)^T -> (N, H)
        part = jax.lax.dot_general(
            oh_s.astype(f32), et,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        denom_ref[...] += part
        deg_part = jnp.sum(oh_s.astype(f32), axis=1).reshape(N, 1)
        scalen_ref[...] += jnp.broadcast_to(deg_part, (N, H))
        return carry

    jax.lax.fori_loop(0, n_tiles, pass_b, 0)

    denom = jnp.maximum(denom_ref[...], 1e-16)                   # (N, H)
    deg = scalen_ref[...][:, 0:1] + 1.0                          # (N, 1)
    scale_n = deg / denom                                        # (N, H)
    scalen_ref[...] = scale_n

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
            oh_s.astype(f32), scalen_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)                          # (T, H)
        # alpha (T, H) = e_edge tile (H, T) transposed (via identity matmul —
        # cheaper and safer than a Mosaic relayout transpose) * scale_e
        et = eedge_ref[:, pl.ds(a, tile_e)]                      # (H, T)
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


def _eye(n: int, dtype):
    a = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    b = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return ((a - b) == 0).astype(dtype)


def _fwd_impl(nq, nk, nm, ekb, emb, skb, smb, src, dst, mask, heads,
              interpret):
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

    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[node_spec, node_spec, node_spec, edge_spec, edge_spec,
                  node_spec, node_spec, idx_spec, idx_spec, idx_spec],
        out_specs=pl.BlockSpec((1, N, HD), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, N, HD), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((heads, E), jnp.float32),   # per-edge scores / exp
            pltpu.VMEM((N, heads), jnp.float32),   # denominators
            pltpu.VMEM((N, heads), jnp.float32),   # degree then scale
        ],
        interpret=interpret,
    )(nq, nk, nm, ekb, emb, skb, smb,
      src[:, None, :], dst[:, None, :], mask[:, None, :])


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
                     heads, interpret)


def _vjp_fwd(nq, nk, nm, ekb, emb, skb, smb, src, dst, mask, heads,
             interpret):
    out = _fwd_impl(nq, nk, nm, ekb, emb, skb, smb, src, dst, mask,
                    heads, interpret)
    return out, (nq, nk, nm, ekb, emb, skb, smb, src, dst, mask)


def _vjp_bwd(heads, interpret, residuals, g):
    """Backward via the XLA onehot backend's VJP on saved inputs."""
    from qagnn_tpu.ops.gat_attention import relational_gat_attention_nodes

    nq, nk, nm, ekb, emb, skb, smb, src, dst, mask = residuals
    G, N, HD = nq.shape
    dph = HD // heads

    def ref(nq, nk, nm, ekb, emb, skb, smb):
        def r(t):
            return t.reshape(t.shape[0], t.shape[1], heads, dph)
        out = relational_gat_attention_nodes(
            r(nq), r(nk), r(nm), r(ekb), r(emb), r(skb), r(smb),
            src, dst, mask > 0, backend="onehot")
        return out

    _, vjp = jax.vjp(ref, nq, nk, nm, ekb, emb, skb, smb)
    grads = vjp(g.astype(jnp.float32))
    zero_i = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return grads + (zero_i(src), zero_i(dst), jnp.zeros_like(mask))


pallas_relational_gat.defvjp(_vjp_fwd, _vjp_bwd)
