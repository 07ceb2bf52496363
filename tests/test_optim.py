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


def test_static_freeze_through_train_step():
    """make_train_step's encoder_trainable is a STATIC bool: the frozen
    variant stop-gradients the encoder (its backward is dead code), yet
    encoder params + optimizer state stay exactly put, the decoder still
    learns, and flipping the flag mid-training behaves like the
    reference's freeze/unfreeze schedule (reference qagnn.py:240-247)."""
    import numpy as np

    from qagnn_tpu.graph.container import BatchedGraphs
    from qagnn_tpu.models.qagnn import LMQAGNN
    from qagnn_tpu.models.text_encoder import TextEncoder, TextEncoderConfig
    from qagnn_tpu.train import (
        Batch, build_train_optimizer, init_train_state, make_train_step)

    rng = np.random.default_rng(0)
    B, C, L, N, E = 2, 2, 8, 6, 10
    G = B * C
    enc_cfg = TextEncoderConfig.tiny(hidden_size=16, num_layers=1,
                                     max_position_embeddings=L + 4)
    model = LMQAGNN(encoder=TextEncoder(enc_cfg),
                    sent_dim=enc_cfg.hidden_size, k=1, n_ntype=4, n_etype=6,
                    n_concept=32, concept_dim=8, concept_in_dim=12,
                    n_attention_head=2, fc_dim=8, n_fc_layer=0,
                    p_emb=0.0, p_gnn=0.0, p_fc=0.0)
    batch = Batch(
        lm_inputs={
            "input_ids": jnp.asarray(
                rng.integers(0, enc_cfg.vocab_size, (B, C, L)), jnp.int32),
            "attention_mask": jnp.ones((B, C, L), jnp.int32)},
        graph=BatchedGraphs(
            concept_ids=jnp.asarray(rng.integers(1, 32, (G, N)), jnp.int32),
            node_types=jnp.asarray(rng.integers(0, 4, (G, N)), jnp.int32),
            node_scores=jnp.asarray(rng.standard_normal((G, N)), jnp.float32),
            num_nodes=jnp.full((G,), N, jnp.int32),
            edge_src=jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32),
            edge_dst=jnp.asarray(rng.integers(0, N, (G, E)), jnp.int32),
            edge_type=jnp.asarray(rng.integers(0, 6, (G, E)), jnp.int32),
            edge_mask=jnp.ones((G, E), bool)),
        labels=jnp.asarray(rng.integers(0, C, (B,)), jnp.int32))

    key = jax.random.PRNGKey(0)
    from qagnn_tpu.utils.initialization import init_variables
    params_probe = init_variables(model, key, batch.lm_inputs,
                                  batch.graph)["params"]
    optimizer = build_train_optimizer(
        params_probe, optim="radam", encoder_lr=1e-3, decoder_lr=1e-3)
    state = init_train_state(model, optimizer, key, batch)
    step = make_train_step(model, optimizer)

    s1, m1 = step(state, batch, False)          # frozen epoch
    enc0 = jax.tree.leaves(state.params["encoder"])
    enc1 = jax.tree.leaves(s1.params["encoder"])
    for a, b in zip(enc0, enc1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # encoder optimizer moments untouched too
    for a, b in zip(jax.tree.leaves(state.opt_state.encoder),
                    jax.tree.leaves(s1.opt_state.encoder)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the decoder DID move
    dec_moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params["decoder"]),
                        jax.tree.leaves(s1.params["decoder"])))
    assert dec_moved

    s2, m2 = step(s1, batch, True)              # unfrozen epoch
    enc2 = jax.tree.leaves(s2.params["encoder"])
    enc_moved = any(not np.array_equal(np.asarray(a), np.asarray(b))
                    for a, b in zip(enc1, enc2))
    assert enc_moved
    # both variants produce finite losses on the same state shapes
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
