"""Jitted train/eval steps with gradient accumulation and freeze gating.

TPU-native replacement for the reference's hot loop (reference
qagnn.py:243-278): one compiled program containing LM forward, GNN forward,
loss, backward, clipping, optimizer — no host round-trips, no device copies.

Gradient accumulation (reference's --mini_batch_size inner loop,
qagnn.py:252-266) is a lax.scan over microbatches. Each microbatch updates
BatchNorm batch statistics sequentially, exactly as the reference's per-mini-
batch BN forward does; the loss of microbatch [a:b] is scaled by (b-a)/bs
before summing, matching reference qagnn.py:260.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from qagnn_tpu.graph.container import BatchedGraphs
from qagnn_tpu.train.losses import LOSSES
from qagnn_tpu.train.optim import TrainOptimizer, TrainOptimizerState
from qagnn_tpu.utils.initialization import init_variables
from qagnn_tpu.utils.tpu import tpu_compiler_options

Array = jax.Array


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: TrainOptimizerState
    step: Array                      # global step
    rng: Array                       # dropout PRNG key


class Batch(struct.PyTreeNode):
    """One training batch: LM inputs (B, C, L), graphs (G=B*C), labels (B,)."""
    lm_inputs: dict[str, Array]
    graph: BatchedGraphs
    labels: Array


def init_train_state(model, optimizer: TrainOptimizer, rng: Array,
                     sample_batch: Batch, pretrained: dict | None = None,
                     ) -> TrainState:
    """Initialize model variables + optimizer state from a sample batch.

    Init runs under the scatter backend (see utils.initialization): the
    fused Pallas kernels never compile in a forward-only init jit, so
    their tile/VMEM budget is set solely by the train/eval-step jits."""
    variables = init_variables(model, rng, sample_batch.lm_inputs,
                               sample_batch.graph)
    params = variables["params"]
    if pretrained:
        params = _merge_pretrained(params, pretrained)
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        step=jnp.zeros([], jnp.int32),
        rng=rng,
    )


def _merge_pretrained(params, pretrained):
    """Overlay pretrained leaves (e.g. entity table, LM weights) onto params."""
    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = merge(out[k], v)
            else:
                assert k in out, f"pretrained key {k!r} not in params"
                assert out[k].shape == v.shape, (
                    f"shape mismatch for {k!r}: {out[k].shape} vs {v.shape}")
                out[k] = jnp.asarray(v, out[k].dtype)
        return out
    return merge(params, pretrained)


def make_train_step(
    model,
    optimizer: TrainOptimizer,
    *,
    loss_name: str = "cross_entropy",
    num_microbatches: int = 1,
    encoder_layer_id: int = -1,
) -> Callable[[TrainState, Batch, Array], tuple[TrainState, dict[str, Array]]]:
    """Build the jitted train step.

    num_microbatches splits the leading batch axis for gradient accumulation;
    B must divide evenly (the host-side loader pads/fills partial batches,
    mirroring the reference's fill option, utils/data_utils.py:41-51).

    encoder_trainable is a STATIC python bool: the frozen variant wraps
    the encoder params in stop_gradient, so XLA dead-code-eliminates the
    ENTIRE encoder backward — the reference's freeze_net
    (requires_grad=False, reference qagnn.py:240 + utils/utils.py:33)
    skips encoder autograd the same way, and a traced gate would instead
    pay the full encoder backward every frozen epoch. Two compiled
    variants exist at most (frozen/unfrozen), cached across epochs.
    """
    loss_fn = LOSSES[loss_name]

    def microbatch_loss(params, batch_stats, mb: Batch, dropout_rng, scale,
                        encoder_trainable):
        def forward(p):
            if not encoder_trainable and "encoder" in p:
                p = dict(p)
                p["encoder"] = jax.tree.map(jax.lax.stop_gradient,
                                            p["encoder"])
            logits, new_vars = model.apply(
                {"params": p, "batch_stats": batch_stats},
                mb.lm_inputs, mb.graph,
                layer_id=encoder_layer_id, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
            return loss_fn(logits, mb.labels) * scale, new_vars["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(
            forward, has_aux=True)(params)
        return loss, grads, new_stats

    def split_mb(tree, i):
        return jax.tree.map(
            lambda x: x.reshape((num_microbatches, -1) + x.shape[1:])[i], tree)

    @functools.lru_cache(maxsize=2)
    def build(encoder_trainable: bool):
        @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
        def train_step(state: TrainState, batch: Batch):
            rng = jax.random.fold_in(state.rng, state.step)

            if num_microbatches == 1:
                loss, grads, batch_stats = microbatch_loss(
                    state.params, state.batch_stats, batch, rng, 1.0,
                    encoder_trainable)
            else:
                scale = 1.0 / num_microbatches

                def body(carry, i):
                    stats, grads_acc, loss_acc = carry
                    mb = Batch(lm_inputs=split_mb(batch.lm_inputs, i),
                               graph=split_mb(batch.graph, i),
                               labels=split_mb(batch.labels, i))
                    mb_rng = jax.random.fold_in(rng, i)
                    loss, grads, stats = microbatch_loss(
                        state.params, stats, mb, mb_rng, scale,
                        encoder_trainable)
                    grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                    return (stats, grads_acc, loss_acc + loss), None

                zero_grads = jax.tree.map(jnp.zeros_like, state.params)
                (batch_stats, grads, loss), _ = jax.lax.scan(
                    body, (state.batch_stats, zero_grads, 0.0),
                    jnp.arange(num_microbatches))

            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params, encoder_trainable)
            params = jax.tree.map(jnp.add, state.params, updates)

            new_state = state.replace(
                params=params, batch_stats=batch_stats, opt_state=opt_state,
                step=state.step + 1)
            metrics = {"loss": loss}
            return new_state, metrics
        return train_step

    def train_step(state: TrainState, batch: Batch, encoder_trainable=True):
        return build(bool(encoder_trainable))(state, batch)

    # the underlying jit per freeze variant — tools (collective audit)
    # lower it to inspect the compiled HLO
    train_step.jitted = build
    return train_step


def make_eval_step(model, *, encoder_layer_id: int = -1):
    """Jitted eval: logits (B, C) with BN running averages, no dropout."""

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def eval_step(params, batch_stats, lm_inputs, graph: BatchedGraphs):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            lm_inputs, graph, layer_id=encoder_layer_id, train=False)

    return eval_step


def make_detail_step(model, *, encoder_layer_id: int = -1):
    """Jitted detail eval (reference modeling/modeling_qagnn.py:236-241):
    (logits (B, C), pooler attention, (edge_alphas (k, G, E, H),
    self_alphas (k, G, N, H))). Graph tensors the reference echoes back
    (concept_ids, node_types, edge_index, edge_type) are already in the
    caller's BatchedGraphs."""

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def detail_step(params, batch_stats, lm_inputs, graph: BatchedGraphs):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            lm_inputs, graph, layer_id=encoder_layer_id, train=False,
            detail=True)

    return detail_step


def accuracy(logits: Array, labels: Array) -> Array:
    """Fraction of questions whose argmax choice is the label
    (reference qagnn.py:30-38 evaluate_accuracy)."""
    return jnp.mean((jnp.argmax(logits, axis=1) == labels).astype(jnp.float32))
