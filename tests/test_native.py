"""Native C++ packer: builds, matches the numpy fallback, and is faster."""

import time

import numpy as np
import pytest

from qagnn_tpu.graph import batching
from qagnn_tpu.native import load_native


@pytest.fixture(scope="module")
def lib():
    lib = load_native()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def _random_lists(rng, n_graphs, max_e=50, n_nodes=16):
    ei, et = [], []
    for _ in range(n_graphs):
        e = int(rng.integers(0, max_e))
        ei.append(rng.integers(0, n_nodes, (2, e)).astype(np.int64))
        et.append(rng.integers(0, 7, e).astype(np.int64))
    return ei, et


@pytest.mark.parametrize("sort_by_src", [True, False])
def test_native_pack_matches_numpy(lib, sort_by_src, monkeypatch):
    rng = np.random.default_rng(0)
    ei, et = _random_lists(rng, 17)
    G = len(ei)
    cc = np.zeros((G, 16), np.int32)
    nt = np.zeros((G, 16), np.int32)
    ns = np.zeros((G, 16), np.float32)
    nn = np.full(G, 16, np.int32)

    native = batching.batch_edge_lists(ei, et, cc, nt, ns, nn,
                                       edges_per_graph=32,
                                       sort_by_src=sort_by_src)
    monkeypatch.setattr(batching, "_native_lib", lambda: None)
    numpy_ = batching.batch_edge_lists(ei, et, cc, nt, ns, nn,
                                       edges_per_graph=32,
                                       sort_by_src=sort_by_src)
    np.testing.assert_array_equal(native.edge_src, numpy_.edge_src)
    np.testing.assert_array_equal(native.edge_dst, numpy_.edge_dst)
    np.testing.assert_array_equal(native.edge_type, numpy_.edge_type)
    np.testing.assert_array_equal(native.edge_mask, numpy_.edge_mask)


def test_native_pack_truncates(lib):
    ei = [np.arange(20, dtype=np.int64).reshape(2, 10) % 5]
    et = [np.arange(10, dtype=np.int64)]
    g = batching.batch_edge_lists(
        ei, et, np.zeros((1, 5), np.int32), np.zeros((1, 5), np.int32),
        np.zeros((1, 5), np.float32), np.full(1, 5, np.int32),
        edges_per_graph=4, sort_by_src=False)
    assert g.edge_mask.sum() == 4
    np.testing.assert_array_equal(g.edge_src[0], ei[0][0, :4])


def test_native_pack_is_faster(lib, monkeypatch):
    rng = np.random.default_rng(1)
    ei, et = _random_lists(rng, 320, max_e=6000, n_nodes=200)
    args = (ei, et, np.zeros((320, 200), np.int32),
            np.zeros((320, 200), np.int32), np.zeros((320, 200), np.float32),
            np.full(320, 200, np.int32))

    def best_of(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    batching.batch_edge_lists(*args, edges_per_graph=8192)  # warm (may build)
    t_native = best_of(
        lambda: batching.batch_edge_lists(*args, edges_per_graph=8192))

    monkeypatch.setattr(batching, "_native_lib", lambda: None)
    t_numpy = best_of(
        lambda: batching.batch_edge_lists(*args, edges_per_graph=8192))
    # best-of-N to ride out CPU contention from neighbouring test processes
    assert t_native < t_numpy * 1.5, (t_native, t_numpy)
    print(f"native {t_native*1e3:.1f}ms vs numpy {t_numpy*1e3:.1f}ms")
