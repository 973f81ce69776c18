"""Pallas TPU kernel for the hot pair-interaction evaluation.

Fuses the velocity-dependent half of ``calculate_force`` (pmag-scaled
damping projections + row reductions, see
:func:`icebergs_tpu.ops.forces.eval_pair_ia`) into a single VMEM pass:
one kernel reads the precomputed (N, M) pair slabs and the (N,) velocity
vectors, and writes the five reduced damping sums — instead of ~30
separate HBM-bound elementwise ops + reductions.

Blocks are (BLOCK_N, M) rows per program; M (the candidate width) stays
whole so the row reduction happens entirely in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import IcebergsConfig
from .accel import IA

# 1-D f32 operands must block at multiples of 1024 to match XLA's
# {0:T(1024)} layout on TPU
BLOCK_N = 1024


def _kernel(scale_by_pmag: bool):
    def kernel(active_ref, p11_ref, p12_ref, p22_ref,
               crad_ref, ctan_ref, u2_ref, v2_ref,
               u0_ref, v0_ref, u1_ref, v1_ref, out_ref):
        P11 = p11_ref[:]
        P12 = p12_ref[:]
        P22 = p22_ref[:]
        u2 = u2_ref[:]
        v2 = v2_ref[:]
        act = active_ref[:]

        if scale_by_pmag:
            du1 = u2 - u1_ref[:][:, None]
            dv1 = v2 - v1_ref[:][:, None]
            du0 = u2 - u0_ref[:][:, None]
            dv0 = v2 - v0_ref[:][:, None]

            def mag(a11, a12, a22, du, dv):
                return jnp.sqrt((a11 * du + a12 * dv) ** 2
                                + (a12 * du + a22 * dv) ** 2)

            wr = crad_ref[:] * 0.5 * (mag(P11, P12, P22, du1, dv1)
                                      + mag(P11, P12, P22, du0, dv0))
            Q11 = 1. - P11
            Q12 = -P12
            Q22 = 1. - P22
            wt = ctan_ref[:] * 0.5 * (mag(Q11, Q12, Q22, du1, dv1)
                                      + mag(Q11, Q12, Q22, du0, dv0))
        else:
            wr = crad_ref[:]
            wt = ctan_ref[:]
        wr = jnp.where(act > 0., wr, 0.)
        wt = jnp.where(act > 0., wt, 0.)

        D11 = wr * P11 + wt * (1. - P11)
        D12 = wr * P12 + wt * (-P12)
        D22 = wr * P22 + wt * (1. - P22)

        out_ref[:, 0] = jnp.sum(D11, axis=1)
        out_ref[:, 1] = jnp.sum(D12, axis=1)
        out_ref[:, 2] = jnp.sum(D22, axis=1)
        out_ref[:, 3] = jnp.sum(D11 * u2 + D12 * v2, axis=1)
        out_ref[:, 4] = jnp.sum(D12 * u2 + D22 * v2, axis=1)
        out_ref[:, 5] = jnp.zeros_like(out_ref[:, 5])
        out_ref[:, 6] = jnp.zeros_like(out_ref[:, 6])
        out_ref[:, 7] = jnp.zeros_like(out_ref[:, 7])

    return kernel


@functools.partial(jax.jit, static_argnames=("scale_by_pmag", "interpret"))
def _pallas_eval(active, p11, p12, p22, crad, ctan, u2, v2,
                 u0, v0, u1, v1, *, scale_by_pmag: bool,
                 interpret: bool = False):
    N, M = p11.shape
    nblk = pl.cdiv(N, BLOCK_N)

    def spec2d():
        return pl.BlockSpec((BLOCK_N, M), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)

    def spec1d():
        return pl.BlockSpec((BLOCK_N,), lambda b: (b,),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _kernel(scale_by_pmag),
        grid=(nblk,),
        in_specs=[spec2d()] * 8 + [spec1d()] * 4,
        out_specs=pl.BlockSpec((BLOCK_N, 8), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 8), p11.dtype),
        interpret=interpret,
    )(active.astype(p11.dtype), p11, p12, p22, crad, ctan, u2, v2,
      u0, v0, u1, v1)


def eval_pair_ia_pallas(pd, cfg: IcebergsConfig, u0, v0, u1, v1,
                        interpret: bool = False) -> IA:
    """Drop-in Pallas replacement for
    :func:`icebergs_tpu.ops.forces.eval_pair_ia` (spring sums pass
    through; damping sums computed in one fused kernel)."""
    out = _pallas_eval(pd.active, pd.P11, pd.P12, pd.P22, pd.crad, pd.ctan,
                       pd.u2, pd.v2, u0, v0, u1, v1,
                       scale_by_pmag=cfg.scale_damping_by_pmag,
                       interpret=interpret)
    return IA(IA_x=pd.IA_x, IA_y=pd.IA_y,
              P11=out[:, 0], P12=out[:, 1], P21=out[:, 1], P22=out[:, 2],
              Pu_x=out[:, 3], Pu_y=out[:, 4])
