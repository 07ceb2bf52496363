"""Masked BatchNorm with torch.nn.BatchNorm1d-compatible semantics.

The reference runs BatchNorm1d over a variable number of rows — the batched
edge list plus one self-loop row per node inside the shared edge encoder
(reference modeling/modeling_qagnn.py:30,431-433) and over all node rows in
each conv's output MLP (reference modeling/modeling_qagnn.py:408,443).

On TPU all shapes are static and padded, so padded rows must be excluded from
the batch statistics by WEIGHT, not by shape. `MaskedBatchNorm` computes
weighted batch moments; with weight == 1 for exactly the rows the reference
would have seen, train-mode normalization matches the reference bit-for-bit
in exact arithmetic.

Torch parity details implemented here:
  * normalization uses BIASED batch variance,
  * running_var is updated with the UNBIASED batch variance (n/(n-1)),
  * running <- (1 - momentum) * running + momentum * batch, momentum = 0.1,
  * eval mode normalizes with running statistics,
  * `num_updates` lets one `__call__` fold k successive EMA updates, matching
    the reference's shared edge encoder being invoked once per GNN layer with
    identical inputs (k identical updates == one update with effective
    momentum 1-(1-m)^k).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class MomentPart(NamedTuple):
    """Pre-reduced contribution to a MaskedBatchNorm batch statistic.

    s1/s2: (features,) f32 row sums sum(x) and sum(x^2); n: scalar row
    count. Lets a caller (the fused edge-encoder path) contribute rows to
    the statistic in closed form WITHOUT the row array existing; keeping
    s1/s2 differentiable in the upstream parameters is the caller's job.
    """

    s1: Array
    s2: Array
    n: Array


class MaskedBatchNorm(nn.Module):
    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    use_running_average: bool | None = None
    num_updates: int = 1

    @nn.compact
    def __call__(self, x, weight: Array | None = None,
                 use_running_average: bool | None = None,
                 return_affine: bool = False):
        """x: (rows, features), or a list of parts sharing ONE statistic.

        A part is (x_i, weight_i) — rows with an optional stat weight
        ((rows,) nonneg; 0 drops a row from stats) — or a MomentPart
        (pre-reduced sum(x)/sum(x^2)/row-count contributed to the
        statistic without any row array existing). Moment parts yield
        None in the output list.

        All rows are normalized/affine-transformed; only statistics are
        masked. The multi-part form computes the moments over the union of
        the parts' rows WITHOUT concatenating them — the batched edge rows
        plus the per-node self-loop rows are one statistical population in
        the reference (reference modeling/modeling_qagnn.py:431-433), but
        materializing their concat (and re-slicing the output) costs two
        row-array copies per step on TPU.

        return_affine: also return the folded per-feature affine
        (a, b) = (scale*inv, bias - mean*scale*inv) in f32 — the form a
        fused kernel applies as x*a + b.
        """
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average)

        multi = isinstance(x, (tuple, list)) and not isinstance(x, MomentPart)
        parts = list(x) if multi else [(x, weight)]
        moment_parts = [p for p in parts if isinstance(p, MomentPart)]
        array_parts = [p for p in parts if not isinstance(p, MomentPart)]

        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features, jnp.float32))

        # Statistics always accumulate in f32 — a bf16 hot path (the
        # reference's fp16 amp keeps BN in fp32 the same way, reference
        # qagnn.py:232-234) must not degrade the moments. The f32 casts fuse
        # into the reductions (no (rows, features) f32 materialization);
        # the final normalize runs in the INPUT dtype so the big edge-row
        # arrays never round-trip HBM at f32. All no-ops for f32 inputs.
        f32 = jnp.float32
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = jnp.asarray(0.0, f32)
            s1 = jnp.zeros(self.features, f32)
            for xi, wi in array_parts:
                x32 = xi.astype(f32)
                if wi is None:
                    n = n + x32.shape[0]
                    s1 = s1 + jnp.sum(x32, axis=0)
                else:
                    w = wi.astype(f32)
                    n = n + jnp.sum(w)
                    s1 = s1 + jnp.sum(x32 * w[:, None], axis=0)
            for mp in moment_parts:
                n = n + mp.n
                s1 = s1 + mp.s1
            n = jnp.maximum(n, 1.0)
            mean = s1 / n
            if moment_parts:
                # one-pass variance: E[x^2] - mean^2 (the pre-reduced
                # moments carry sum(x^2); exact-f32 safe at these scales)
                s2 = jnp.zeros(self.features, f32)
                for xi, wi in array_parts:
                    x2 = jnp.square(xi.astype(f32))
                    s2 = s2 + (jnp.sum(x2, axis=0) if wi is None
                               else jnp.sum(x2 * wi.astype(f32)[:, None],
                                            axis=0))
                for mp in moment_parts:
                    s2 = s2 + mp.s2
                var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
            else:
                s2 = jnp.zeros(self.features, f32)
                for xi, wi in array_parts:
                    d2 = jnp.square(xi.astype(f32) - mean)
                    s2 = s2 + (jnp.sum(d2, axis=0) if wi is None
                               else jnp.sum(d2 * wi.astype(f32)[:, None],
                                            axis=0))
                var = s2 / n

            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                decay = (1.0 - self.momentum) ** self.num_updates
                blend = 1.0 - decay
                ra_mean.value = decay * ra_mean.value + blend * mean
                ra_var.value = decay * ra_var.value + blend * unbiased

        inv = jax.lax.rsqrt(var + self.eps)

        def norm(xi):
            if xi.dtype == jnp.float32:   # torch-parity form, bit-identical
                return (xi.astype(f32) - mean) * inv * scale + bias
            # low-precision inputs: fold (inv, scale, mean, bias) into one
            # per-feature scale/shift applied in the input dtype. NOTE: only
            # the STATISTICS match torch amp here (amp runs the whole BN in
            # fp32); the normalize itself is a bf16 x*a + b, which loses
            # relative precision when |mean| is large against the batch
            # spread (x*a and b then cancel in bf16). Accepted trade-off,
            # drift bounded at 5% by tests/test_layers_extra.py; if tighter
            # parity is ever needed, add the shift b in f32.
            a = (inv * scale).astype(xi.dtype)
            b = (bias - mean * inv * scale).astype(xi.dtype)
            return xi * a + b

        outs = [None if isinstance(p, MomentPart) else norm(p[0])
                for p in parts]
        result = outs if multi else outs[0]
        if return_affine:
            a32 = inv * scale
            b32 = bias - mean * a32
            return result, (a32, b32)
        return result
