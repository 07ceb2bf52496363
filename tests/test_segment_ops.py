"""Unit tests for masked segment primitives against dense numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from qagnn_tpu.ops import (
    aggregate_onehot,
    out_degree,
    segment_max,
    segment_softmax,
    segment_softmax_with_self_loops,
    segment_sum,
)


def _random_edges(rng, n_edges, n_segments, n_real=None):
    seg = rng.integers(0, n_segments, size=n_edges).astype(np.int32)
    mask = np.ones(n_edges, dtype=bool)
    if n_real is not None:
        mask[n_real:] = False
    return seg, mask


class TestSegmentSum:
    def test_matches_loop(self):
        rng = np.random.default_rng(0)
        seg, mask = _random_edges(rng, 64, 10, n_real=50)
        data = rng.normal(size=(64, 3)).astype(np.float32)

        got = segment_sum(jnp.asarray(data), jnp.asarray(seg), 10, jnp.asarray(mask))

        want = np.zeros((10, 3), np.float32)
        for e in range(50):
            want[seg[e]] += data[e]
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_padding_is_exact_zero(self):
        seg = jnp.array([0, 1, 1], dtype=jnp.int32)
        data = jnp.array([[1.0], [2.0], [1e9]])
        mask = jnp.array([True, True, False])
        got = segment_sum(data, seg, 3, mask)
        np.testing.assert_array_equal(np.asarray(got), [[1.0], [2.0], [0.0]])


class TestSegmentMax:
    def test_matches_loop(self):
        rng = np.random.default_rng(1)
        seg, mask = _random_edges(rng, 40, 6, n_real=30)
        data = rng.normal(size=(40, 2)).astype(np.float32)
        got = np.asarray(segment_max(jnp.asarray(data), jnp.asarray(seg), 6, jnp.asarray(mask)))
        for s in range(6):
            rows = [data[e] for e in range(30) if seg[e] == s]
            if rows:
                np.testing.assert_allclose(got[s], np.max(rows, axis=0), rtol=1e-6)
            else:
                assert (got[s] <= -1e29).all()


class TestSegmentSoftmax:
    def test_sums_to_one_per_segment(self):
        rng = np.random.default_rng(2)
        seg, mask = _random_edges(rng, 100, 8, n_real=80)
        # make sure every segment has at least one real edge
        seg[:8] = np.arange(8)
        scores = rng.normal(size=(100, 4)).astype(np.float32)
        alpha = np.asarray(segment_softmax(
            jnp.asarray(scores), jnp.asarray(seg), 8, jnp.asarray(mask)))
        assert np.all(alpha[~mask] == 0)
        for s in range(8):
            total = alpha[(seg == s) & mask].sum(axis=0)
            np.testing.assert_allclose(total, np.ones(4), rtol=1e-5)

    def test_matches_dense_softmax(self):
        seg = jnp.array([0, 0, 0], dtype=jnp.int32)
        scores = jnp.array([[1.0], [2.0], [3.0]])
        mask = jnp.array([True, True, True])
        alpha = np.asarray(segment_softmax(scores, seg, 1, mask)).ravel()
        want = np.exp([1, 2, 3]) / np.exp([1, 2, 3]).sum()
        np.testing.assert_allclose(alpha, want, rtol=1e-5)

    def test_numerical_stability_large_scores(self):
        seg = jnp.array([0, 0], dtype=jnp.int32)
        scores = jnp.array([[1000.0], [1001.0]])
        alpha = np.asarray(segment_softmax(scores, seg, 1, jnp.array([True, True])))
        assert np.isfinite(alpha).all()
        np.testing.assert_allclose(alpha.sum(), 1.0, rtol=1e-5)


class TestJointSoftmaxWithSelfLoops:
    def test_oracle(self):
        """Joint softmax must equal a dense softmax over edges + self-loop."""
        rng = np.random.default_rng(3)
        S, E, H = 5, 20, 2
        seg, mask = _random_edges(rng, E, S, n_real=15)
        edge_scores = rng.normal(size=(E, H)).astype(np.float32)
        self_scores = rng.normal(size=(S, H)).astype(np.float32)

        ea, sa = segment_softmax_with_self_loops(
            jnp.asarray(edge_scores), jnp.asarray(seg), jnp.asarray(mask),
            jnp.asarray(self_scores))
        ea, sa = np.asarray(ea), np.asarray(sa)

        for s in range(S):
            idx = [e for e in range(15) if seg[e] == s]
            group = np.concatenate(
                [edge_scores[idx], self_scores[s:s + 1]], axis=0)  # (k+1, H)
            dense = np.exp(group - group.max(0)) / np.exp(group - group.max(0)).sum(0)
            np.testing.assert_allclose(ea[idx], dense[:-1], rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(sa[s], dense[-1], rtol=1e-5, atol=1e-6)
        assert np.all(ea[~mask] == 0)

    def test_empty_segment_self_alpha_is_one(self):
        """A node with no outgoing edges gives its self-loop alpha == 1."""
        seg = jnp.array([0], dtype=jnp.int32)
        mask = jnp.array([False])
        ea, sa = segment_softmax_with_self_loops(
            jnp.array([[5.0]]), seg, mask, jnp.array([[0.1], [0.2]]))
        np.testing.assert_allclose(np.asarray(sa), np.ones((2, 1)), rtol=1e-6)
        assert np.asarray(ea)[0, 0] == 0


class TestOutDegree:
    def test_counts(self):
        seg = jnp.array([0, 0, 2, 2, 2], dtype=jnp.int32)
        mask = jnp.array([True, True, True, True, False])
        deg = np.asarray(out_degree(seg, 3, mask, include_self_loop=True))
        np.testing.assert_array_equal(deg, [3.0, 1.0, 3.0])


class TestOnehotAggregate:
    def test_matches_scatter(self):
        rng = np.random.default_rng(4)
        seg, mask = _random_edges(rng, 128, 16, n_real=100)
        data = rng.normal(size=(128, 8)).astype(np.float32)
        a = segment_sum(jnp.asarray(data), jnp.asarray(seg), 16, jnp.asarray(mask))
        b = aggregate_onehot(jnp.asarray(data), jnp.asarray(seg), 16, jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


class TestGradients:
    def test_segment_softmax_grad_finite(self):
        import jax
        rng = np.random.default_rng(5)
        seg = jnp.asarray(rng.integers(0, 4, size=16).astype(np.int32))
        mask = jnp.asarray(np.arange(16) < 12)
        scores = jnp.asarray(rng.normal(size=(16, 2)).astype(np.float32))

        def loss(s):
            return segment_softmax(s, seg, 4, mask).sum()

        g = jax.grad(loss)(scores)
        assert np.isfinite(np.asarray(g)).all()

    def test_joint_softmax_grad_finite(self):
        import jax
        rng = np.random.default_rng(6)
        seg = jnp.asarray(rng.integers(0, 4, size=16).astype(np.int32))
        mask = jnp.asarray(np.arange(16) < 12)
        es = jnp.asarray(rng.normal(size=(16, 2)).astype(np.float32))
        ss = jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))

        def loss(args):
            ea, sa = segment_softmax_with_self_loops(args[0], seg, mask, args[1])
            return (ea ** 2).sum() + (sa ** 2).sum()

        g = jax.grad(loss)((es, ss))
        assert all(np.isfinite(np.asarray(x)).all() for x in g)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))
