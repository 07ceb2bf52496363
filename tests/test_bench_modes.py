"""CPU smoke for bench.py's driver modes: the real eval-step path and
the static-freeze variant execute and report sane numbers. Locks the
programmatic args surface tools (seed_compile_cache,
tests_tpu/test_production_train) build on."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def _args(**overrides):
    a = argparse.Namespace(**vars(bench.parse_args([])))
    a.small = True
    a.iters = 4
    for k, v in overrides.items():
        setattr(a, k, v)
    return a


def test_driver_eval_step_bench_runs():
    value, compile_s = bench.run_driver(_args(mode="driver", eval=True), None)
    assert value > 0 and compile_s > 0


def test_driver_frozen_encoder_bench_runs():
    value, _ = bench.run_driver(
        _args(mode="driver", frozen_encoder=True), None)
    assert value > 0


def test_gnn_infer_bench_runs():
    value, _ = bench.run_gnn(_args(infer=True), None)
    assert value > 0
