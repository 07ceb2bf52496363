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
SCOPED_VMEM_KIB = 32768


def tpu_compiler_options() -> dict:
    """compiler_options for jax.jit on TPU; {} elsewhere (CPU tests)."""
    import jax

    if jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib": SCOPED_VMEM_KIB}
    return {}
