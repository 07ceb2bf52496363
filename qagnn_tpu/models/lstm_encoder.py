"""LSTM sentence encoder (the reference's legacy encoder family).

Port of reference modeling/modeling_encoder.py:35-86 (LSTMTextEncoder):
embedding (optionally pretrained/frozen) -> input dropout -> num_layers
(bi)LSTM stack with inter-layer dropout -> masked max/mean pooling over the
real sequence length. Returns (pooled, all_hidden_states) like TextEncoder.

TPU notes: lax.scan-based recurrence via flax.linen.RNN — short sequences
(<=100 tokens) make the sequential dependency cheap; masking replaces
pack_padded_sequence (padded steps carry state through unchanged).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


@dataclass(frozen=True)
class LSTMConfig:
    """Driver-facing config (reference run defaults:
    modeling/modeling_encoder.py:38-41). `hidden_size` names the SENTENCE
    vector width (= output_size) so the driver's sent_dim plumbing is
    uniform across encoder families."""
    vocab_size: int = 1
    emb_size: int = 300
    lstm_hidden_size: int = 300
    hidden_size: int = 300       # output_size == sent_dim
    num_layers: int = 2
    bidirectional: bool = True
    emb_p: float = 0.0
    input_p: float = 0.0
    hidden_p: float = 0.0
    pool_function: str = "max"
    dtype: object = jnp.float32  # accepted for driver uniformity (unused)

    @classmethod
    def tiny(cls, **kw):
        kw.setdefault("vocab_size", 64)
        kw.setdefault("emb_size", 16)
        kw.setdefault("lstm_hidden_size", 16)
        kw.setdefault("hidden_size", 16)
        return cls(**kw)


def masked_max_pool(h: Array, lengths: Array) -> Array:
    """(B, L, D), (B,) -> (B, D) max over the first `lengths` positions
    (reference MaxPoolLayer, utils/layers.py:115-130)."""
    L = h.shape[1]
    mask = jnp.arange(L)[None, :] < lengths[:, None]
    return jnp.max(jnp.where(mask[:, :, None], h, -jnp.inf), axis=1)


def masked_mean_pool(h: Array, lengths: Array) -> Array:
    """(B, L, D), (B,) -> (B, D) mean over the first `lengths` positions
    (reference MeanPoolLayer, utils/layers.py:90-105)."""
    L = h.shape[1]
    mask = (jnp.arange(L)[None, :] < lengths[:, None]).astype(h.dtype)
    return jnp.sum(h * mask[:, :, None], axis=1) \
        / jnp.maximum(lengths[:, None].astype(h.dtype), 1.0)


class LSTMTextEncoder(nn.Module):
    vocab_size: int = 1
    emb_size: int = 300
    hidden_size: int = 300
    output_size: int = 300
    num_layers: int = 2
    bidirectional: bool = True
    emb_p: float = 0.0      # embedding (per-word row) dropout
    input_p: float = 0.0
    hidden_p: float = 0.0
    pool_function: str = "max"   # max | mean

    @classmethod
    def from_config(cls, cfg: LSTMConfig):
        return cls(vocab_size=cfg.vocab_size, emb_size=cfg.emb_size,
                   hidden_size=cfg.lstm_hidden_size,
                   output_size=cfg.hidden_size, num_layers=cfg.num_layers,
                   bidirectional=cfg.bidirectional, emb_p=cfg.emb_p,
                   input_p=cfg.input_p, hidden_p=cfg.hidden_p,
                   pool_function=cfg.pool_function)

    @nn.compact
    def __call__(self, input_ids: Array, lengths: Array, *,
                 layer_id: int = -1, train: bool = False,
                 return_all_hidden: bool = False):
        """input_ids: (B, L) int32; lengths: (B,) int32. `layer_id` is
        accepted for driver uniformity and ignored — the reference's
        layer_id only works for non-LSTM encoders
        (reference modeling/modeling_encoder.py:110-113).

        Returns (pooled (B, output_size), tuple of num_layers+1 hidden
        states) — the reference's output contract
        (modeling/modeling_encoder.py:63-86)."""
        assert not self.bidirectional or self.hidden_size % 2 == 0
        B, L = input_ids.shape

        emb_table = nn.Embed(self.vocab_size, self.emb_size, name="emb")
        h = emb_table(input_ids)

        # EmbeddingDropout: drop entire vocabulary rows
        # (reference utils/layers.py:150-172)
        if train and self.emb_p > 0:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.emb_p, (self.vocab_size,))
            scale = 1.0 / (1.0 - self.emb_p)
            h = h * (keep[input_ids][..., None] * scale)

        h = nn.Dropout(self.input_p, deterministic=not train)(h)

        mask = jnp.arange(L)[None, :] < lengths[:, None]   # (B, L)
        all_hidden = [h]
        for layer in range(self.num_layers):
            out_size = (self.hidden_size if layer != self.num_layers - 1
                        else self.output_size)
            if self.bidirectional:
                half = out_size // 2
                fwd = nn.RNN(nn.OptimizedLSTMCell(half),
                             name=f"lstm_fwd_{layer}")
                bwd = nn.RNN(nn.OptimizedLSTMCell(half), reverse=True,
                             keep_order=True, name=f"lstm_bwd_{layer}")
                h_f = fwd(h, seq_lengths=lengths)
                h_b = bwd(h, seq_lengths=lengths)
                h = jnp.concatenate([h_f, h_b], axis=-1)
            else:
                h = nn.RNN(nn.OptimizedLSTMCell(out_size),
                           name=f"lstm_{layer}")(h, seq_lengths=lengths)
            h = jnp.where(mask[:, :, None], h, 0.0)
            all_hidden.append(h)
            if layer != self.num_layers - 1:
                # RNNDropout: one mask per (batch, feature), shared over time
                # (reference utils/layers.py:175-186)
                h = nn.Dropout(self.hidden_p, broadcast_dims=(1,),
                               deterministic=not train)(h)

        pool = (masked_max_pool if self.pool_function == "max"
                else masked_mean_pool)
        pooled = pool(all_hidden[-1], lengths)
        return pooled, tuple(all_hidden)
