"""Sparse-matrix math helpers (legacy preprocessing path).

Port of reference utils/maths.py:5 (normalize_sparse_adj), used by the
reference's legacy normalized-adjacency graph variants
(reference utils/graph.py:525-578). Kept as a CPU/scipy utility: this runs
in offline preprocessing, never on the TPU hot path.
"""

from __future__ import annotations

import numpy as np
from scipy import sparse


def normalize_sparse_adj(A, sparse_type: str = "coo"):
    """Row-normalize a scipy sparse matrix: A[i, :] /= max(sum(A[i, :]), eps).

    Zero-degree rows divide by 1e-5 instead of 0, exactly as the reference
    does (reference utils/maths.py:13-15). Returns a matrix in the requested
    sparse format (default COO).
    """
    in_degree = np.array(A.sum(1)).reshape(-1)
    in_degree[in_degree == 0] = 1e-5
    d_inv = sparse.diags(1.0 / in_degree)
    return getattr(d_inv.dot(A), "to" + sparse_type)()
