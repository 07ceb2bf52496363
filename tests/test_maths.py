"""normalize_sparse_adj (reference utils/maths.py:5) vs a dense oracle."""

import numpy as np
from scipy import sparse

from qagnn_tpu.utils.maths import normalize_sparse_adj


def test_normalize_sparse_adj_matches_dense_oracle():
    rng = np.random.default_rng(0)
    dense = (rng.random((7, 5)) < 0.4) * rng.random((7, 5))
    dense[2, :] = 0.0   # zero-degree row: divides by 1e-5, not 0
    A = sparse.csr_matrix(dense)

    out = normalize_sparse_adj(A)
    assert sparse.isspmatrix_coo(out)

    deg = dense.sum(1)
    deg[deg == 0] = 1e-5
    want = dense / deg[:, None]
    np.testing.assert_allclose(out.toarray(), want, rtol=1e-12)

    out_csr = normalize_sparse_adj(A, sparse_type="csr")
    assert sparse.isspmatrix_csr(out_csr)
    np.testing.assert_allclose(out_csr.toarray(), want, rtol=1e-12)
