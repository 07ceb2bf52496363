"""Optimizers + LR schedules with exact reference semantics.

Re-implements the reference's RAdam (reference utils/optimization_utils.py:8-97)
as an optax-style gradient transformation, plus the driver's 4-way parameter
grouping (encoder/decoder x decay/no-decay — reference qagnn.py:172-180), LR
schedules (reference qagnn.py:182-197), global-norm clipping
(reference qagnn.py:267-273) and the encoder freeze/unfreeze schedule
(reference qagnn.py:240-247, utils/utils.py:33-40).

Freezing semantics match the reference exactly: frozen parameters are SKIPPED
by the optimizer (their gradients are None in torch), so their moment buffers
and step counters do not advance while frozen. Here that is implemented by
gating the whole encoder group's update on a traced boolean so it lives inside
one jitted train step.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

Array = jax.Array


# --------------------------------------------------------------------------
# RAdam (exact reference math)
# --------------------------------------------------------------------------

class RAdamState(NamedTuple):
    count: Array   # int32 scalar — steps applied to this group
    mu: Any        # first moment pytree
    nu: Any        # second moment pytree


def scale_by_radam_ref(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                       degenerated_to_sgd: bool = True) -> optax.GradientTransformation:
    """RAdam rescaling, bit-matching reference utils/optimization_utils.py:60-97.

    Produces `step_size * m / (sqrt(v) + eps)` when the rectification term
    N_sma >= 5, else `sgd_step * m` (bias-corrected momentum SGD). Note the
    reference adds eps OUTSIDE the sqrt and does NOT bias-correct v directly —
    the sqrt(1 - b2^t) factor inside step_size plays that role.
    """

    def init_fn(params):
        return RAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)
        count = state.count + 1
        t = count.astype(jnp.float32)
        # The torch reference computes these scalars in python float64. In
        # fp32, 1 - b2^t suffers catastrophic cancellation for small t (b2^t
        # near 1), which perturbs N_sma by ~1e-2 — so use expm1, which keeps
        # the relative error at fp32 epsilon.
        one_minus_b2t = -jnp.expm1(t * jnp.log(jnp.float32(b2)))
        b2t = 1.0 - one_minus_b2t
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * b2t / one_minus_b2t

        rect = jnp.sqrt(one_minus_b2t * (n_sma - 4.0) / (n_sma_max - 4.0)
                        * (n_sma - 2.0) / n_sma
                        * n_sma_max / (n_sma_max - 2.0))
        bias_corr1 = -jnp.expm1(t * jnp.log(jnp.float32(b1)))
        rect_step = rect / bias_corr1
        sgd_step = (1.0 / bias_corr1) if degenerated_to_sgd else 0.0
        use_rect = n_sma >= 5.0

        def scaled(m, v):
            adam_dir = m / (jnp.sqrt(v) + eps)
            return jnp.where(use_rect, rect_step * adam_dir, sgd_step * m)

        new_updates = jax.tree.map(scaled, mu, nu)
        return new_updates, RAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def radam(learning_rate: float | Callable[[Array], Array],
          b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
          weight_decay: float = 0.0,
          weight_decay_mask: Any = None) -> optax.GradientTransformation:
    """Full RAdam: rectified scaling + decoupled weight decay + lr.

    Weight decay matches the reference placement: p -= lr * wd * p, NOT scaled
    by the rectification term (reference utils/optimization_utils.py:87-88,93-94).
    """
    chain = [scale_by_radam_ref(b1, b2, eps)]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay, weight_decay_mask))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)


def make_optimizer(name: str, learning_rate, weight_decay: float = 0.0,
                   weight_decay_mask=None) -> optax.GradientTransformation:
    """Registry matching reference utils/optimization_utils.py:100-105."""
    if name == "radam":
        return radam(learning_rate, weight_decay=weight_decay,
                     weight_decay_mask=weight_decay_mask)
    if name == "adamw":
        return optax.adamw(learning_rate, weight_decay=weight_decay,
                           mask=weight_decay_mask)
    if name == "adam":
        return optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(weight_decay, weight_decay_mask)
            if weight_decay else optax.identity(),
            optax.scale_by_learning_rate(learning_rate))
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay, weight_decay_mask)
            if weight_decay else optax.identity(),
            optax.scale_by_learning_rate(learning_rate))
    raise ValueError(f"unknown optimizer {name!r}")


# --------------------------------------------------------------------------
# LR schedules (reference qagnn.py:182-197)
# --------------------------------------------------------------------------

def make_lr_schedule(kind: str, warmup_steps: int = 0,
                     total_steps: int | None = None) -> Callable[[Array], Array]:
    """Multiplier schedule in [0, 1]; the group lr multiplies it.

    The reference calls scheduler.step() BEFORE optimizer.step() each batch
    (reference qagnn.py:274-278), so global step t applies multiplier(t+1);
    callers pass the optimizer's own count, which equals t+1 inside update.
    """
    if kind == "fixed":
        return lambda step: jnp.ones_like(step, jnp.float32)
    if kind == "warmup_constant":
        return lambda step: jnp.minimum(
            step.astype(jnp.float32) / max(1.0, float(warmup_steps)), 1.0)
    if kind == "warmup_linear":
        assert total_steps is not None

        def sched(step):
            s = step.astype(jnp.float32)
            warm = s / max(1.0, float(warmup_steps))
            decay = jnp.maximum(
                0.0, (total_steps - s) / max(1.0, float(total_steps - warmup_steps)))
            return jnp.where(s < warmup_steps, warm, decay)
        return sched
    raise ValueError(f"unknown lr schedule {kind!r}")


# --------------------------------------------------------------------------
# Parameter grouping + the full training optimizer
# --------------------------------------------------------------------------

def path_str(path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in path)


def no_decay_mask(params) -> Any:
    """True where weight decay APPLIES. Mirrors reference qagnn.py:171:
    no_decay = biases and LayerNorm weights. (BatchNorm scales DO decay in the
    reference because 'LayerNorm.weight' doesn't match BatchNorm param names.)
    In flax: leaf name 'bias' -> no decay; 'scale' under a LayerNorm module
    (named 'layernorm*' here) -> no decay; everything else decays.
    """
    def decide(path, leaf):
        p = path_str(path).lower()
        if p.endswith("bias"):
            return False
        if p.endswith("scale") and "layernorm" in p:
            return False
        return True
    return jax.tree_util.tree_map_with_path(decide, params)


def encoder_mask(params, encoder_key: str = "encoder") -> Any:
    """True for leaves under the encoder submodule."""
    def decide(path, leaf):
        return path_str(path).split("/")[0] == encoder_key
    return jax.tree_util.tree_map_with_path(decide, params)


class TrainOptimizerState(NamedTuple):
    step: Array          # global step (scheduler steps, reference qagnn.py:274)
    encoder: Any         # optax state for encoder group
    decoder: Any         # optax state for decoder group


class TrainOptimizer(NamedTuple):
    """Two-group optimizer (encoder lr / decoder lr) with freeze gating and
    global-norm clipping, as one jit-friendly object.

    update(grads, state, params, encoder_trainable) -> (updates, state)
    where encoder_trainable is a traced bool; when False the encoder group's
    updates are zero AND its optimizer state does not advance — matching
    torch's skip-if-grad-is-None behaviour for frozen modules.
    """
    init: Callable[[Any], TrainOptimizerState]
    update: Callable[..., tuple[Any, TrainOptimizerState]]


def build_train_optimizer(
    params,
    *,
    optim: str = "radam",
    encoder_lr: float = 1e-5,
    decoder_lr: float = 1e-3,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    lr_schedule: str = "fixed",
    warmup_steps: int = 0,
    total_steps: int | None = None,
    frozen_param_mask: Any = None,   # True == never update (e.g. entity table)
) -> TrainOptimizer:
    """Build the reference training optimizer (qagnn.py:168-197) for a
    params tree whose top level splits into 'encoder' and 'decoder'."""
    sched = make_lr_schedule(lr_schedule, warmup_steps, total_steps)
    wd_mask = no_decay_mask(params)
    enc_mask = encoder_mask(params)

    def group_tx(lr):
        # optax's schedule count is 0 on the first update, but the reference
        # steps the scheduler before the first optimizer.step (qagnn.py:274),
        # so its first update sees multiplier(1) — hence c + 1.
        return make_optimizer(optim, lambda c: lr * sched(c + 1),
                              weight_decay, wd_mask)

    enc_tx = group_tx(encoder_lr)
    dec_tx = group_tx(decoder_lr)

    def init_fn(p):
        return TrainOptimizerState(
            step=jnp.zeros([], jnp.int32),
            encoder=enc_tx.init(p),
            decoder=dec_tx.init(p),
        )

    def update_fn(grads, state, p, encoder_trainable):
        # Freeze gating first so frozen params don't affect the global norm
        # (in torch, frozen params have no .grad and are invisible to both
        # clipping and the optimizer — reference qagnn.py:267-273).
        enc_on = jnp.asarray(encoder_trainable)
        grads = jax.tree.map(
            lambda g, is_enc: jnp.where(is_enc & ~enc_on, 0.0, g),
            grads, enc_mask)
        if frozen_param_mask is not None:
            grads = jax.tree.map(
                lambda g, f: jnp.zeros_like(g) if f else g,
                grads, frozen_param_mask)

        # Global-norm clip over everything at once (reference qagnn.py:270-273).
        if max_grad_norm and max_grad_norm > 0:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, max_grad_norm / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)

        enc_updates, enc_state_new = enc_tx.update(grads, state.encoder, p)
        dec_updates, dec_state_new = dec_tx.update(grads, state.decoder, p)

        # Encoder group: gate both updates and state on encoder_trainable.
        enc_state = jax.tree.map(
            lambda new, old: jnp.where(enc_on, new, old),
            enc_state_new, state.encoder)
        updates = jax.tree.map(
            lambda is_enc, eu, du: jnp.where(
                is_enc, jnp.where(enc_on, eu, jnp.zeros_like(eu)), du),
            enc_mask, enc_updates, dec_updates)
        if frozen_param_mask is not None:
            updates = jax.tree.map(
                lambda u, f: jnp.zeros_like(u) if f else u,
                updates, frozen_param_mask)

        new_state = TrainOptimizerState(
            step=state.step + 1, encoder=enc_state, decoder=dec_state_new)
        return updates, new_state

    return TrainOptimizer(init=init_fn, update=update_fn)
