"""Pre-seed the persistent XLA/Mosaic compile cache for the bench shapes.

A FRESH environment pays the remote-tunneled Mosaic+XLA cold compile of
the full Pallas train step (minutes to ~20 min, service-dominated) before
its first real step. This script compiles the two hot programs — the
GNN-only bench step and the real driver train step — into the persistent
cache (/tmp/qagnn_tpu_jax_cache) WITHOUT timing anything, so subsequent
`bench.py`, `cli.train`, or test runs start in seconds.

    python tools/seed_compile_cache.py           # both modes, bench shapes
    python tools/seed_compile_cache.py --small   # tiny-shape smoke

The bench itself records the cache state it observed (`compile_cache:
cold|warm`) and its own `compile_s`, so cold-vs-warm cost stays tracked.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--skip-driver", action="store_true")
    ap.add_argument("--all", action="store_true",
                    help="also seed the driver-eval and roberta-base "
                    "driver programs (frozen + unfrozen) — a long cold "
                    "compile session, but every bench mode starts warm "
                    "afterwards")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/qagnn_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import argparse as _argparse

    import bench

    # bench's own defaults (parse_args([])) keep this namespace in sync with
    # any future bench flags; only the seeding-specific overrides are local
    a = _argparse.Namespace(**vars(bench.parse_args([])))
    a.iters = 6
    a.small = args.small

    jobs = [("gnn", bench.run_gnn, {})]
    if not args.skip_driver:
        jobs.append(("driver", bench.run_driver, {}))
        if args.all:
            jobs += [
                ("driver-eval", bench.run_driver, {"eval": True}),
                ("driver-roberta-base", bench.run_driver,
                 {"encoder": "roberta-base"}),
                ("driver-roberta-base-frozen", bench.run_driver,
                 {"encoder": "roberta-base", "frozen_encoder": True}),
            ]
    for mode, runner, overrides in jobs:
        aj = _argparse.Namespace(**vars(a))
        for k, v in overrides.items():
            setattr(aj, k, v)
        t0 = time.perf_counter()
        _, compile_s = runner(aj, None)
        print(f"seeded {mode}: compile {compile_s:.1f}s "
              f"(total {time.perf_counter() - t0:.1f}s)", flush=True)
    cache = "/tmp/qagnn_tpu_jax_cache"
    n = len(os.listdir(cache)) if os.path.isdir(cache) else 0
    print(f"cache dir: {cache} ({n} entries)")


if __name__ == "__main__":
    main()
