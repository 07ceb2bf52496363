"""TPU-gated regression test for the bf16 gradient parity bands.

Wraps tools/tpu_parity_check.py (3-way: pallas + onehot bf16 backends vs a
true-f32 CPU scatter oracle at CSQA bench shapes) so the chip parity
criteria are pytest-enforced on the bench host instead of a manually-run
tool. Skips anywhere without a real TPU.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="chip parity bands are only meaningful on real TPU hardware")


def test_chip_parity_bench_shapes():
    from tools.tpu_parity_check import check
    assert check(small=False, dtype="bfloat16"), (
        "pallas bf16 error bands exceeded 1.25x of the onehot bf16 bands "
        "vs the f32 CPU scatter oracle (see stdout table)")


def test_chip_parity_projected_production_path():
    """The PROJECTED fused kernels through GATConvE (in-kernel edge GEMMs,
    merged scores+denominator, aliased/chained cotangents, linear_1
    composition) — parameter-gradient bands vs the f32 scatter oracle."""
    from tools.tpu_parity_check import check_projected
    assert check_projected(small=False, dtype="bfloat16"), (
        "projected-path bf16 gradient bands exceeded 1.5x of the onehot "
        "bands vs the f32 CPU scatter oracle (see stdout table)")
