"""Masked segment primitives over fixed-shape (padded) edge arrays.

TPU-native replacements for the reference's dynamic-shape sparse kernels:
  * torch_scatter.scatter(..., reduce='sum')   (reference modeling/modeling_qagnn.py:479)
  * torch_geometric.utils.softmax (segment softmax grouped by source node,
    reference modeling/modeling_qagnn.py:472)
  * MessagePassing scatter-add aggregation      (reference modeling/modeling_qagnn.py:442)

Everything here works on STATIC shapes: edges are padded to a fixed budget and
carry a boolean mask. Padded entries contribute exact zeros to every reduction,
so results are bit-identical (in fp32) to a dynamic-shape implementation over
only the real edges.

Self-loops are not materialized as edge entries. The reference appends one
self-loop per node to the edge list (modeling/modeling_qagnn.py:436-438); here
the self-loop path is kept dense — shape (num_nodes, ...) — and joined with the
sparse path analytically inside `segment_softmax_with_self_loops`. This keeps
the edge arrays smaller and the self-loop compute perfectly vectorized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

_NEG_INF = -1e30  # large finite negative; avoids NaN from (-inf) - (-inf)


def segment_sum(data: Array, segment_ids: Array, num_segments: int,
                mask: Array | None = None) -> Array:
    """Masked sum of `data` rows into `num_segments` buckets.

    data: (E, ...) float; segment_ids: (E,) int in [0, num_segments);
    mask: (E,) bool — padded entries are dropped. Returns (num_segments, ...).
    """
    if mask is not None:
        data = jnp.where(_expand(mask, data.ndim), data, 0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(data: Array, segment_ids: Array, num_segments: int,
                mask: Array | None = None) -> Array:
    """Masked max per segment. Empty segments return _NEG_INF."""
    if mask is not None:
        data = jnp.where(_expand(mask, data.ndim), data, _NEG_INF)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    # segment_max fills empty segments with the dtype minimum; clamp to our
    # finite sentinel so downstream exp() arithmetic stays NaN-free.
    return jnp.maximum(out, _NEG_INF)


def segment_softmax(scores: Array, segment_ids: Array, num_segments: int,
                    mask: Array | None = None) -> Array:
    """Numerically-stable masked softmax within each segment.

    scores: (E, H); returns (E, H) with padded rows exactly 0. Matches
    torch_geometric.utils.softmax(scores, index) semantics on the real rows.
    """
    m = segment_max(scores, segment_ids, num_segments, mask)
    shifted = scores - m[segment_ids]
    e = jnp.exp(shifted)
    if mask is not None:
        e = jnp.where(_expand(mask, e.ndim), e, 0)
    denom = jax.ops.segment_sum(e, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(denom, 1e-16)
    return e / denom[segment_ids]


def segment_softmax_with_self_loops(
    edge_scores: Array,
    segment_ids: Array,
    edge_mask: Array | None,
    self_scores: Array,
) -> tuple[Array, Array]:
    """Joint softmax over {edges grouped by segment} ∪ {one self-loop per segment}.

    Reproduces the reference semantics where self-loops are appended to the
    edge list before the source-grouped softmax (modeling/modeling_qagnn.py:436-438,472)
    — but without materializing them as edges.

    edge_scores: (E, H); segment_ids: (E,) in [0, S); self_scores: (S, H).
    Returns (edge_alpha (E, H), self_alpha (S, H)); each segment's edge_alphas
    plus its self_alpha sum to 1.
    """
    num_segments = self_scores.shape[0]
    m_edges = segment_max(edge_scores, segment_ids, num_segments, edge_mask)
    m = jnp.maximum(m_edges, self_scores)  # (S, H)

    shifted = edge_scores - m[segment_ids]
    e_edges = jnp.exp(shifted)
    if edge_mask is not None:
        e_edges = jnp.where(_expand(edge_mask, e_edges.ndim), e_edges, 0)
    e_self = jnp.exp(self_scores - m)  # (S, H)

    denom = jax.ops.segment_sum(e_edges, segment_ids, num_segments=num_segments)
    denom = denom + e_self
    denom = jnp.maximum(denom, 1e-16)

    edge_alpha = e_edges / denom[segment_ids]
    self_alpha = e_self / denom
    return edge_alpha, self_alpha


def out_degree(segment_ids: Array, num_segments: int,
               mask: Array | None = None, include_self_loop: bool = True) -> Array:
    """Per-segment edge count (float), optionally +1 for the implicit self-loop.

    Equivalent to the reference's scatter-of-ones out-degree
    (modeling/modeling_qagnn.py:476-481) computed over edges+self-loops.
    """
    ones = jnp.ones(segment_ids.shape, dtype=jnp.float32)
    deg = segment_sum(ones, segment_ids, num_segments, mask)
    if include_self_loop:
        deg = deg + 1.0
    return deg


@functools.partial(jax.jit, static_argnames=("num_segments",))
def aggregate_onehot(data: Array, segment_ids: Array, num_segments: int,
                     mask: Array | None = None) -> Array:
    """Segment-sum via one-hot matmul — rides the MXU instead of scatter.

    For per-graph aggregation (num_segments ≈ 200 nodes) a dense
    (E, S) one-hot times (E, D) contraction is usually faster on TPU than a
    scatter-add, because it tiles onto the systolic array.

    data: (E, D); returns (S, D).
    """
    onehot = jax.nn.one_hot(segment_ids, num_segments, dtype=data.dtype)  # (E, S)
    if mask is not None:
        onehot = onehot * _expand(mask, 2).astype(data.dtype)
    return jax.lax.dot_general(
        onehot, data,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST keeps fp32 operands exact on the MXU (the default TPU
        # precision routes fp32 through bf16 passes, which would make this
        # "exact" aggregation diverge from the scatter path).
        precision=jax.lax.Precision.HIGHEST,
    )


def _expand(mask: Array, ndim: int) -> Array:
    """Right-pad mask with singleton dims to broadcast against data."""
    return mask.reshape(mask.shape + (1,) * (ndim - mask.ndim))
