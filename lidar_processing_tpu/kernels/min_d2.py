"""Pallas TPU kernel: batched min pairwise squared distance between runs.

The clustering exact tests (ops/stixel.py) reduce to: for P pairs of point
windows u (P, Wu) and v (P, Wv) given as planar x/y/z coordinate planes,
compute min over (i, j) of ‖u_i − v_j‖². XLA materializes the (P, Wu, Wv)
distance block in HBM (gigabytes per frame at the tier shapes), which made
this the pipeline's dominant cost. This kernel tiles P into blocks of B
pairs and keeps the entire distance block in VMEM: per grid step it loads
six (B, W) coordinate planes, accumulates d² = dx² + dy² + dz² on the VPU,
and writes only the (B, 1) min — HBM traffic is exactly the inputs plus P
floats.

Math matches the XLA fallback op-for-op (same f32 ops, same association
order); results agree to within a few ULP — the only divergence source is
whether a given compiler configuration contracts the mul+add accumulation
points into FMAs (asserted by tests/test_kernels.py). Edge verdicts
threshold at r² ≈ 0.18, so a ULP-level wobble cannot flip labels on real
data.

Ref context: this implements the point-level connectivity test of the
reference's FEC radius search (ref: src/clustering.cpp:90-110) for runs of
the sorted point buffer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# pairs per grid step, keyed by (Wu, Wv) block area — keeps the (B, Wu, Wv)
# VMEM block near 2-4 MB
_VMEM_BUDGET = 2 * 1024 * 1024


def _pairs_per_block(wu: int, wv: int, p: int) -> int:
    """Pairs per grid step: a multiple of 8 (Mosaic sublane alignment for
    f32 blocks), sized so the (B, Wu, Wv) distance block stays in budget.
    The caller pads P up to a multiple of the returned B."""
    b = max(8, _VMEM_BUDGET // (wu * wv * 4))
    b -= b % 8
    return min(b, max(8, -(-p // 8) * 8))


def _kernel(ux_ref, uy_ref, uz_ref, vx_ref, vy_ref, vz_ref, out_ref):
    ux = ux_ref[:]                                    # (B, Wu)
    vx = vx_ref[:]                                    # (B, Wv)
    d = ux[:, :, None] - vx[:, None, :]
    d2 = d * d                                        # (B, Wu, Wv)
    d = uy_ref[:][:, :, None] - vy_ref[:][:, None, :]
    d2 = d2 + d * d
    d = uz_ref[:][:, :, None] - vz_ref[:][:, None, :]
    d2 = d2 + d * d
    out_ref[:] = jnp.min(jnp.min(d2, axis=2), axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def min_d2_planar(ux, uy, uz, vx, vy, vz, interpret: bool = False):
    """min_{i,j} ((ux[p,i]-vx[p,j])² + …) per pair p.

    All six inputs (P, W*) f32 with masked lanes pre-filled so that
    u-fill − v-fill is huge (the caller uses +BIG / −BIG). Returns (P,) f32.
    """
    p, wu = ux.shape
    wv = vx.shape[1]
    b = _pairs_per_block(wu, wv, p)
    pp = -(-p // b) * b           # pad P to a block multiple (sliced off)
    if pp != p:
        pad = ((0, pp - p), (0, 0))
        ux, uy, uz = (jnp.pad(a, pad) for a in (ux, uy, uz))
        vx, vy, vz = (jnp.pad(a, pad) for a in (vx, vy, vz))
    grid = (pp // b,)
    spec_u = pl.BlockSpec((b, wu), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((b, wv), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((pp, 1), jnp.float32),
        grid=grid,
        in_specs=[spec_u, spec_u, spec_u, spec_v, spec_v, spec_v],
        out_specs=pl.BlockSpec((b, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=8 * pp * wu * wv,
            bytes_accessed=(3 * pp * (wu + wv) + pp) * 4,
            transcendentals=0),
        interpret=interpret,
    )(ux, uy, uz, vx, vy, vz)
    return out[:p, 0]


def min_d2_planar_xla(ux, uy, uz, vx, vy, vz):
    """XLA fallback with identical math/association order (CPU tests)."""
    d = ux[:, :, None] - vx[:, None, :]
    d2 = d * d
    d = uy[:, :, None] - vy[:, None, :]
    d2 = d2 + d * d
    d = uz[:, :, None] - vz[:, None, :]
    d2 = d2 + d * d
    return jnp.min(jnp.min(d2, axis=2), axis=1)
