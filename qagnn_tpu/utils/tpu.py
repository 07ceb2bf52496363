"""TPU compiler tuning shared by the driver, bench, and entry points.

The fused Pallas kernels stream TILE_E-edge blocks through scoped VMEM; at
production tiles (TILE_E=2048, HD=200) the transposed-layout backward sits
just above XLA's DEFAULT 16 MiB scoped-vmem cap, while the v5e physically
carries 128 MiB of VMEM. Raising the cap is a per-compile proto debug
option (client-side XLA_FLAGS cannot carry it through the remote-compile
tunnel, and the terminal overrides LIBTPU_INIT_ARGS), so every hot-path
jit passes these options explicitly.
"""

from __future__ import annotations

# 32 MiB: 2x the default, ~1/4 of the chip's physical VMEM — roomy for the
# grid-tiled kernels, leaves plenty for XLA's own fusion buffers.
# QAGNN_SCOPED_VMEM_KIB overrides for tile experiments (e.g. 49152 for
# QAGNN_TILE_E=4096).
import os as _os

SCOPED_VMEM_KIB = int(_os.environ.get("QAGNN_SCOPED_VMEM_KIB", "32768"))


def lowering_platform() -> str:
    """Platform computations lower to BY DEFAULT right now.

    Unlike jax.default_backend(), this respects an active
    jax.default_device(...) override — so requesting backend='pallas'
    under jax.default_device(cpu) on a TPU host selects interpret mode
    instead of compiling Mosaic kernels for CPU. A per-call device
    placement (jax.jit(..., device=...)) is still invisible at trace
    time; callers that do that must pass interpret explicitly.
    """
    import jax

    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def tpu_compiler_options() -> dict:
    """compiler_options for jax.jit on TPU; {} elsewhere (CPU tests)."""
    import jax

    if jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": SCOPED_VMEM_KIB}
    return {}
