"""Loss functions (reference qagnn.py:208-224)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def cross_entropy_loss(logits: Array, labels: Array) -> Array:
    """Mean softmax cross-entropy over answer choices.

    logits: (B, C); labels: (B,) int. Matches torch nn.CrossEntropyLoss
    (reference qagnn.py:211,222-223).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def margin_rank_loss(logits: Array, labels: Array, margin: float = 0.1) -> Array:
    """Margin ranking loss between the correct choice and each wrong choice.

    Matches reference qagnn.py:209,214-221: mean over B*(C-1) pairs of
    max(0, margin - correct + wrong).
    """
    b, c = logits.shape
    correct = jnp.take_along_axis(logits, labels[:, None], axis=-1)  # (B, 1)
    wrong_mask = jnp.ones_like(logits, bool).at[
        jnp.arange(b), labels].set(False)
    losses = jnp.maximum(0.0, margin - correct + logits)             # (B, C)
    losses = jnp.where(wrong_mask, losses, 0.0)
    return jnp.sum(losses) / (b * (c - 1))


LOSSES = {
    "cross_entropy": cross_entropy_loss,
    "margin_rank": margin_rank_loss,
}
