"""Common neural layers (flax.linen) for the QA-GNN model family.

TPU-native re-designs of the reference ops library (reference utils/layers.py):
same math, functional JAX modules, static shapes, masks instead of dynamic
sizes. Only the components on the live QA-GNN path plus the generally useful
utilities are here; LSTM encoders live in qagnn_tpu/models/lstm_encoder.py.
"""

from __future__ import annotations

import math
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

MASK_FILL = -1e32  # matches reference utils/layers.py:453 mask_fill_value


def gelu(x: Array) -> Array:
    """Tanh-approximated GELU, exactly the reference formula (utils/layers.py:10-14)."""
    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3.0))))


ACTIVATIONS: dict[str, Callable[[Array], Array]] = {
    "gelu": gelu,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
}


def normal_init(std: float):
    return nn.initializers.normal(stddev=std)


class MLP(nn.Module):
    """Multi-layer perceptron with per-hidden-layer dropout + LayerNorm/BatchNorm.

    Layer layout matches reference utils/layers.py:47-87: for each of
    num_layers+1 Linear layers, hidden layers are followed by
    Dropout -> [Norm] -> activation. num_layers == 0 is a single Linear.
    """

    input_size: int
    hidden_size: int
    output_size: int
    num_layers: int
    dropout: float
    layer_norm: bool = False
    batch_norm: bool = False
    activation: str = "gelu"
    init_std: float = 0.02

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        assert not (self.layer_norm and self.batch_norm)
        act = ACTIVATIONS[self.activation]
        for i in range(self.num_layers + 1):
            n_out = self.hidden_size if i < self.num_layers else self.output_size
            x = nn.Dense(n_out, kernel_init=normal_init(self.init_std),
                         name=f"linear_{i}")(x)
            if i < self.num_layers:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
                if self.layer_norm:
                    # torch nn.LayerNorm default eps (flax defaults to 1e-6)
                    x = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False,
                                     name=f"layernorm_{i}")(x)
                if self.batch_norm:
                    raise NotImplementedError(
                        "batch_norm MLP is unused on the QA-GNN path; "
                        "use MaskedBatchNorm directly where needed")
                x = act(x)
        return x


def masked_softmax(vector: Array, mask: Array | None, axis: int = -1) -> Array:
    """Softmax over non-masked entries; masked entries get exactly 0.

    mask: True == masked OUT (reference utils/layers.py:449-486 convention,
    where the pooler passes `mask` with 1 meaning "drop").
    """
    if mask is None:
        return jax.nn.softmax(vector, axis=axis)
    masked_vec = jnp.where(mask, MASK_FILL, vector)
    out = jax.nn.softmax(masked_vec, axis=axis)
    return jnp.where(mask, 0.0, out)


class MatrixVectorScaledDotProductAttention(nn.Module):
    """One query vector attending over a sequence (reference utils/layers.py:276-299)."""

    temperature: float
    attn_dropout: float = 0.1

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array, mask: Array | None = None,
                 *, deterministic: bool = True):
        """q: (B, Dk); k: (B, L, Dk); v: (B, L, Dv); mask: (B, L) True==drop."""
        attn = jnp.sum(q[:, None, :] * k, axis=2) / self.temperature  # (B, L)
        attn = masked_softmax(attn, mask)
        attn = nn.Dropout(self.attn_dropout, deterministic=deterministic)(attn)
        output = jnp.sum(attn[:, :, None] * v, axis=1)  # (B, Dv)
        return output, attn


class MultiheadAttPoolLayer(nn.Module):
    """Multi-head attention pooling of node features by the sentence vector.

    Matches reference utils/layers.py:324-371 (the graph pooler at
    modeling/modeling_qagnn.py:120,180).
    """

    n_head: int
    d_q_original: int
    d_k_original: int
    dropout: float = 0.1
    init_std: float = 0.02

    @nn.compact
    def __call__(self, q: Array, k: Array, mask: Array | None = None,
                 *, deterministic: bool = True):
        """q: (B, dq); k: (B, L, dk); mask: (B, L) True==masked out."""
        assert self.d_k_original % self.n_head == 0
        d_k = self.d_k_original // self.n_head
        bs, len_k = k.shape[0], k.shape[1]

        qs = nn.Dense(self.n_head * d_k, kernel_init=normal_init(self.init_std),
                      name="w_qs")(q).reshape(bs, self.n_head, d_k)
        ks = nn.Dense(self.n_head * d_k, kernel_init=normal_init(self.init_std),
                      name="w_ks")(k).reshape(bs, len_k, self.n_head, d_k)
        vs = nn.Dense(self.n_head * d_k, kernel_init=normal_init(self.init_std),
                      name="w_vs")(k).reshape(bs, len_k, self.n_head, d_k)

        # (head, B, ...) flattened to (head*B, ...) like the reference permute
        qs = qs.transpose(1, 0, 2).reshape(self.n_head * bs, d_k)
        ks = ks.transpose(2, 0, 1, 3).reshape(self.n_head * bs, len_k, d_k)
        vs = vs.transpose(2, 0, 1, 3).reshape(self.n_head * bs, len_k, d_k)

        if mask is not None:
            mask = jnp.tile(mask, (self.n_head, 1))
        output, attn = MatrixVectorScaledDotProductAttention(
            temperature=float(d_k) ** 0.5, name="attention")(
                qs, ks, vs, mask, deterministic=deterministic)

        output = output.reshape(self.n_head, bs, d_k).transpose(1, 0, 2)
        output = output.reshape(bs, self.n_head * d_k)
        output = nn.Dropout(self.dropout, deterministic=deterministic)(output)
        return output, attn


class TypedLinear(nn.Module):
    """Per-type linear: one (in, out) projection selected per row by type id.

    Matches reference utils/layers.py:25-44 — computed as a single wide
    Dense(n_type * out) followed by a per-row slice, which keeps it one
    MXU-friendly GEMM.
    """

    in_features: int
    out_features: int
    n_type: int
    init_std: float = 0.02

    @nn.compact
    def __call__(self, x: Array, type_ids: Array | None = None) -> Array:
        wide = nn.Dense(self.n_type * self.out_features,
                        kernel_init=normal_init(self.init_std), name="wide")(x)
        if type_ids is None:
            return wide
        shaped = wide.reshape(x.shape[:-1] + (self.n_type, self.out_features))
        return jnp.take_along_axis(
            shaped, type_ids[..., None, None], axis=-2).squeeze(-2)


class CustomizedEmbedding(nn.Module):
    """Entity embedding lookup + optional GELU(Linear) projection.

    Matches reference utils/layers.py:571-607: a (possibly frozen, pretrained)
    (concept_num, in_dim) table, scaled, then projected in_dim -> out_dim with
    GELU when the dims differ. Freezing is enforced by the optimizer mask
    (qagnn_tpu.train.optim), not here — JAX params are immutable anyway.
    """

    concept_num: int
    concept_in_dim: int
    concept_out_dim: int
    scale: float = 1.0
    init_std: float = 0.02
    use_projection: bool | None = None  # default: project iff dims differ

    @nn.compact
    def __call__(self, index: Array, *, deterministic: bool = True) -> Array:
        """index: int array (..., ) of concept ids -> (..., out_dim)."""
        emb = nn.Embed(self.concept_num, self.concept_in_dim,
                       embedding_init=normal_init(self.init_std), name="emb")
        x = emb(index) * self.scale
        project = (self.use_projection if self.use_projection is not None
                   else self.concept_in_dim != self.concept_out_dim)
        if project:
            x = nn.Dense(self.concept_out_dim,
                         kernel_init=normal_init(self.init_std),
                         name="cpt_transform")(x)
            x = gelu(x)
        return x


class TypedMultiheadAttPoolLayer(nn.Module):
    """MultiheadAttPoolLayer with per-type key/value projections
    (reference utils/layers.py:374-422)."""

    n_head: int
    d_q_original: int
    d_k_original: int
    dropout: float = 0.1
    n_type: int = 1
    init_std: float = 0.02

    @nn.compact
    def __call__(self, q: Array, k: Array, mask: Array | None = None,
                 type_ids: Array | None = None, *, deterministic: bool = True):
        """q: (B, dq); k: (B, L, dk); mask: (B, L) True==masked out;
        type_ids: (B, L) int."""
        assert self.d_k_original % self.n_head == 0
        d_k = self.d_k_original // self.n_head
        bs, len_k = k.shape[0], k.shape[1]

        qs = nn.Dense(self.n_head * d_k, kernel_init=normal_init(self.init_std),
                      name="w_qs")(q).reshape(bs, self.n_head, d_k)
        ks = TypedLinear(self.d_k_original, self.n_head * d_k, self.n_type,
                         init_std=self.init_std, name="w_ks")(
            k, type_ids).reshape(bs, len_k, self.n_head, d_k)
        vs = TypedLinear(self.d_k_original, self.n_head * d_k, self.n_type,
                         init_std=self.init_std, name="w_vs")(
            k, type_ids).reshape(bs, len_k, self.n_head, d_k)

        qs = qs.transpose(1, 0, 2).reshape(self.n_head * bs, d_k)
        ks = ks.transpose(2, 0, 1, 3).reshape(self.n_head * bs, len_k, d_k)
        vs = vs.transpose(2, 0, 1, 3).reshape(self.n_head * bs, len_k, d_k)

        if mask is not None:
            mask = jnp.tile(mask, (self.n_head, 1))
        output, attn = MatrixVectorScaledDotProductAttention(
            temperature=float(d_k) ** 0.5, name="attention")(
                qs, ks, vs, mask, deterministic=deterministic)

        output = output.reshape(self.n_head, bs, d_k).transpose(1, 0, 2)
        output = output.reshape(bs, self.n_head * d_k)
        output = nn.Dropout(self.dropout, deterministic=deterministic)(output)
        return output, attn


class BilinearAttentionLayer(nn.Module):
    """Bilinear attention pooling (reference utils/layers.py:425-446):
    attn = softmax(value W q); masked renormalization AFTER the softmax."""

    query_dim: int
    value_dim: int
    init_std: float = 0.02

    @nn.compact
    def __call__(self, query: Array, value: Array,
                 node_mask: Array | None = None):
        """query: (B, Dq); value: (B, L, Dv); node_mask: (B, L) 1==keep."""
        proj = nn.Dense(self.query_dim, use_bias=False,
                        kernel_init=normal_init(self.init_std),
                        name="linear")(value)                 # (B, L, Dq)
        attn = jnp.einsum("bld,bd->bl", proj, query)
        attn = jax.nn.softmax(attn, axis=1)
        if node_mask is not None:
            attn = attn * node_mask
            attn = attn / jnp.sum(attn, axis=1, keepdims=True)
        pooled = jnp.einsum("bl,bld->bd", attn, value)
        return pooled, attn


@jax.custom_vjp
def diff_topk(x: Array, k: int) -> Array:
    """Straight-through top-k indicator (reference utils/layers.py:489-509):
    forward emits a 0/1 mask of the top-k entries per row; backward passes
    the upstream gradient through unchanged."""
    return _topk_mask(x, k)


def _topk_mask(x: Array, k: int) -> Array:
    _, idx = jax.lax.top_k(x, k)
    return jnp.zeros_like(x).at[
        jnp.arange(x.shape[0])[:, None], idx].set(1.0)


def _diff_topk_fwd(x, k):
    return _topk_mask(x, k), None


def _diff_topk_bwd(res, g):
    return g, None


diff_topk.defvjp(_diff_topk_fwd, _diff_topk_bwd)


def dot_product_similarity(a: Array, b: Array, scale_output: bool = False) -> Array:
    """(..., D) x (..., D) -> (...) (reference utils/layers.py:530-540)."""
    result = jnp.sum(a * b, axis=-1)
    if scale_output:
        result = result / jnp.sqrt(a.shape[-1])
    return result


def matrix_attention(m1: Array, m2: Array, similarity=dot_product_similarity):
    """All-pairs similarity (reference utils/layers.py:553-569):
    (B, L1, D), (B, L2, D) -> (B, L1, L2)."""
    return similarity(m1[:, :, None, :], m2[:, None, :, :])


class TripleEncoder(nn.Module):
    """(h, r, t) triple encoder over a 3-step (bi)GRU
    (reference utils/layers.py:235-273). Takes pre-embedded heads/relations/
    tails via callables to mirror the reference's injected embedding modules."""

    emb_dim: int
    hidden_dim: int
    input_p: float = 0.0
    output_p: float = 0.0
    bidirectional: bool = True

    @nn.compact
    def __call__(self, h_emb: Array, r_emb: Array, t_emb: Array, *,
                 deterministic: bool = True):
        """h_emb/r_emb/t_emb: (B, emb_dim). Returns (B, hidden_dim)."""
        drop = nn.Dropout(self.input_p, deterministic=deterministic)
        seq = jnp.stack([drop(h_emb), drop(r_emb), drop(t_emb)], axis=1)

        half = self.hidden_dim // 2 if self.bidirectional else self.hidden_dim
        fwd = nn.RNN(nn.GRUCell(half), name="gru_fwd")(seq)
        if self.bidirectional:
            bwd = nn.RNN(nn.GRUCell(half), reverse=True, keep_order=True,
                         name="gru_bwd")(seq)
            out = jnp.concatenate([fwd[:, -1, :], bwd[:, 0, :]], axis=1)
        else:
            out = fwd[:, -1, :]
        return nn.Dropout(self.output_p, deterministic=deterministic)(out)
