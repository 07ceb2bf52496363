"""RAdam parity (vs an independent numpy oracle of the published algorithm)
and freeze/clip/group semantics of the training optimizer."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from qagnn_tpu.train.optim import (
    build_train_optimizer,
    encoder_mask,
    no_decay_mask,
    radam,
    scale_by_radam_ref,
)


def numpy_radam_trajectory(grads_seq, x0, lr, b1=0.9, b2=0.999, eps=1e-8,
                           wd=0.0):
    """Liu et al. RAdam with the reference's conventions: denom=sqrt(v)+eps,
    decoupled wd (p -= lr*wd*p) not scaled by the rectifier, SGD fallback."""
    x = x0.astype(np.float64).copy()
    m = np.zeros_like(x)
    v = np.zeros_like(x)
    rho_inf = 2.0 / (1.0 - b2) - 1.0
    out = []
    for t, g in enumerate(grads_seq, start=1):
        g = g.astype(np.float64)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        b2t = b2 ** t
        rho = rho_inf - 2 * t * b2t / (1 - b2t)
        if wd:
            x = x - lr * wd * x
        if rho >= 5:
            rect = np.sqrt((1 - b2t) * (rho - 4) / (rho_inf - 4)
                           * (rho - 2) / rho * rho_inf / (rho_inf - 2))
            step = rect / (1 - b1 ** t)
            x = x - lr * step * m / (np.sqrt(v) + eps)
        else:
            x = x - lr * m / (1 - b1 ** t)
        out.append(x.copy())
    return out


def test_radam_matches_numpy_oracle_through_warmup_phase():
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal(5).astype(np.float32)
    grads = [rng.standard_normal(5).astype(np.float32) for _ in range(12)]
    lr = 0.01

    tx = radam(lr, weight_decay=0.0)
    params = jnp.asarray(x0)
    state = tx.init(params)
    got = []
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
        got.append(np.asarray(params))

    want = numpy_radam_trajectory(grads, x0, lr)
    # steps 1..4 take the SGD branch (rho < 5), step 5+ the rectified branch.
    # fp32 rectifier scalars vs the oracle's float64 limit agreement to ~1e-4
    # relative near the rho≈5 threshold.
    for g_, w_ in zip(got, want):
        np.testing.assert_allclose(g_, w_, rtol=5e-4, atol=1e-5)


def test_radam_weight_decay_is_decoupled():
    x0 = np.ones(3, np.float32)
    grads = [np.zeros(3, np.float32) for _ in range(3)]
    lr, wd = 0.1, 0.5
    tx = radam(lr, weight_decay=wd)
    params = jnp.asarray(x0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
    want = numpy_radam_trajectory(grads, x0, lr, wd=wd)[-1]
    np.testing.assert_allclose(np.asarray(params), want, rtol=1e-5, atol=1e-6)


def _toy_params():
    return {
        "encoder": {"layer": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)},
                    "layernorm_0": {"scale": jnp.ones(2), "bias": jnp.zeros(2)}},
        "decoder": {"out": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)}},
    }


def test_masks():
    params = _toy_params()
    wd = no_decay_mask(params)
    assert wd["encoder"]["layer"]["kernel"] is True
    assert wd["encoder"]["layer"]["bias"] is False
    assert wd["encoder"]["layernorm_0"]["scale"] is False
    assert wd["decoder"]["out"]["kernel"] is True
    enc = encoder_mask(params)
    assert enc["encoder"]["layer"]["kernel"] is True
    assert enc["decoder"]["out"]["kernel"] is False


def test_freeze_gating_blocks_encoder_updates_and_state():
    params = _toy_params()
    opt = build_train_optimizer(params, optim="radam", encoder_lr=0.1,
                                decoder_lr=0.1, weight_decay=0.0,
                                max_grad_norm=0.0)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    updates, state1 = opt.update(grads, state, params, False)
    # encoder updates zero, state not advanced
    assert float(jnp.abs(updates["encoder"]["layer"]["kernel"]).sum()) == 0.0
    assert int(jax.tree.leaves(state1.encoder)[0]) == 0 or True  # count below
    # decoder updated
    assert float(jnp.abs(updates["decoder"]["out"]["kernel"]).sum()) > 0.0

    # encoder group count stayed 0, decoder advanced to 1
    enc_count = state1.encoder[0].count
    dec_count = state1.decoder[0].count
    assert int(enc_count) == 0
    assert int(dec_count) == 1

    updates, state2 = opt.update(grads, state1, params, True)
    assert float(jnp.abs(updates["encoder"]["layer"]["kernel"]).sum()) > 0.0
    assert int(state2.encoder[0].count) == 1
    assert int(state2.decoder[0].count) == 2


def test_global_norm_clipping():
    params = {"encoder": {"w": jnp.zeros(4)}, "decoder": {"w": jnp.zeros(4)}}
    opt = build_train_optimizer(params, optim="sgd", encoder_lr=1.0,
                                decoder_lr=1.0, weight_decay=0.0,
                                max_grad_norm=1.0)
    state = opt.init(params)
    big = {"encoder": {"w": jnp.full(4, 100.0)},
           "decoder": {"w": jnp.full(4, 100.0)}}
    updates, _ = opt.update(big, state, params, True)
    total = np.sqrt(sum(float(jnp.sum(u ** 2)) for u in jax.tree.leaves(updates)))
    assert total == pytest.approx(1.0, rel=1e-4)


def test_frozen_param_mask_zeroes_entity_table():
    params = {"encoder": {"w": jnp.ones(2)},
              "decoder": {"emb": jnp.ones(3), "w": jnp.ones(2)}}
    frozen = {"encoder": {"w": False}, "decoder": {"emb": True, "w": False}}
    opt = build_train_optimizer(params, optim="sgd", encoder_lr=1.0,
                                decoder_lr=1.0, weight_decay=0.0,
                                max_grad_norm=0.0, frozen_param_mask=frozen)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params, True)
    assert float(jnp.abs(updates["decoder"]["emb"]).sum()) == 0.0
    assert float(jnp.abs(updates["decoder"]["w"]).sum()) > 0.0
