"""Experimental fused neighbor-force kernel over the cell-sorted slab.

Round-2 seed for PLAN.md's "fused neighbor kernel" design: with the slab
sorted by cell (ops/sorted.sort_state_by_cell), every berg's 3x3-window
candidates live inside one contiguous row window of the sorted arrays.
This kernel processes blocks of BN consecutive bergs, loads each block's
window once, and evaluates the dense (BN, W) pair interaction in VMEM —
no (N, M) candidate slab or PairData ever reaches HBM.

Scope (prototype): the legacy non-bonded contact force of
``pair_forces`` (precompute_pair_data + eval_pair_ia,
icebergs.F90:611-804) with pure-distance engagement.  Equal to the XLA
3x3-window path whenever the pair cutoff is at most the smallest cell
extent (the same class of precondition as the quadrant window) — beyond
one cell the window mask and distance mask diverge.

Status: validated exactly against the XLA path in interpret mode, and
the Pallas->Mosaic MLIR frontend lowering passes on TPU (scalar-prefetch
window starts, explicit HBM->VMEM async copies, transposed window matrix
so column reads are plain row slices, 128-aligned dynamic lane offsets —
each was a required fix).  The remote AOT Mosaic backend of this dev
environment still rejects the kernel with a diagnostic the compile
tunnel does not relay (HTTP 500); finishing the backend debug needs a
directly-attached TPU and is the round-2 work item.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import IcebergsConfig
from ..constants import PI_180
from .accel import IA


_NFEAT = 12          # used feature columns
_FPAD = 128          # Mosaic: lane-dim slice extents must be 128-aligned


def _pack(st, u0, v0, u1, v1):
    alive = st.alive.astype(st.lon.dtype)
    # iterate velocities ride in the matrix so the kernel has no rank-1
    # blocked operands (Mosaic tiling constraint); the feature dim is
    # padded to 128 so per-block row DMAs are lane-aligned slices
    P = jnp.stack([st.lon_old, st.lat_old, st.uvel_old, st.vvel_old,
                   st.fl_k, st.length * st.width, st.mass, alive,
                   u0, v0, u1, v1], axis=-1)
    return jnp.pad(P, ((0, 0), (0, _FPAD - _NFEAT)))


def fused_pair_ia_sorted(st_sorted, cell_starts, grid, cfg: IcebergsConfig,
                         u0, v0, u1, v1, *, block_n: int = 256,
                         window: int = 1024, interpret: bool = True):
    """IA sums for legacy non-bonded contact on a cell-sorted state.

    Returns (ia, window_overflow): ``ia`` matches
    ``pair_forces(..., bonded=False, use_c_crit_dist=False)`` over the
    full 3x3 window whenever cutoff <= cell size and no block's window
    exceeds ``window`` rows (overflow counts the truncated rows).
    """
    N = st_sorted.capacity
    BN, W = block_n, window
    assert N % BN == 0
    nblocks = N // BN
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny

    P = _pack(st_sorted, u0, v0, u1, v1)
    F = P.shape[-1]
    # pad so any window start is loadable at full width; the transposed
    # copy lets the kernel read window columns as (1, W) row slices —
    # Mosaic cannot relayout a (W, 1) slice into (1, W)
    Ppad = jnp.concatenate(
        [P, jnp.zeros((W, F), P.dtype)], axis=0)
    PTpad = Ppad.T

    # per-block window start rows from the sorted cell keys
    key = jnp.where(st_sorted.alive,
                    st_sorted.jne * nx + st_sorted.ine, ncells)
    order_key = key  # already sorted by construction
    c_lo = jnp.minimum(order_key[::BN], ncells - 1)
    c_hi = jnp.minimum(order_key[BN - 1::BN], ncells - 1)
    lo_cell = jnp.clip(c_lo - nx - 1, 0, ncells)
    hi_cell = jnp.clip(c_hi + nx + 2, 0, ncells)
    # align window starts down to 128 rows: dynamic DMA offsets in the
    # transposed matrix's lane (minor) dimension must be lane-aligned
    win_start = (cell_starts[lo_cell] // 128) * 128
    win_need = cell_starts[hi_cell] - win_start
    overflow = jnp.sum(jnp.maximum(win_need - W, 0))

    import math
    spring_coef = float(cfg.contact_spring_coef_eff)
    if cfg.critical_interaction_damping_on:
        radial_damping = 2. * math.sqrt(spring_coef)
        tangental_damping = (2. * math.sqrt(spring_coef) / 4.
                             if cfg.tang_crit_int_damp_on
                             else cfg.tangental_damping_coef)
    else:
        radial_damping = cfg.radial_damping_coef
        tangental_damping = cfg.tangental_damping_coef

    hex_denom = 2. * math.sqrt(3.)

    def radius(A):
        if cfg.hexagonal_icebergs:
            return jnp.sqrt(A / hex_denom)
        if cfg.iceberg_bonds_on:
            return 0.5 * jnp.sqrt(A)
        return jnp.sqrt(A / jnp.pi)

    def kernel(ws_ref, wn_ref, P_ref, PT_ref, out_ref, rows_v, win_v,
               sem):
        b = pl.program_id(0)
        # ws_ref holds win_start/128; multiplying back by 128 here lets
        # Mosaic statically prove the slice offset's lane alignment
        ws = ws_ref[b] * 128
        wn = wn_ref[b]
        # explicit HBM -> VMEM window copies (ANY refs are DMA-only)
        cp_rows = pltpu.make_async_copy(
            P_ref.at[pl.ds(b * BN, BN), :], rows_v, sem)
        cp_rows.start()
        cp_win = pltpu.make_async_copy(
            PT_ref.at[:, pl.ds(ws, W)], win_v, sem)
        cp_win.start()
        cp_rows.wait()
        cp_win.wait()
        rows = rows_v[...]
        win = win_v[...]          # (F, W)

        lon1 = rows[:, 0:1]
        lat1 = rows[:, 1:2]
        fl1 = rows[:, 4:5]
        A1 = rows[:, 5:6]
        M1 = rows[:, 6:7]
        al1 = rows[:, 7:8]
        def wcol(k):
            # (1, W) row slice of the transposed window: plain slicing,
            # no gather and no relayout
            return win[k:k + 1, :]

        lon2 = wcol(0)
        lat2 = wcol(1)
        uo2 = wcol(2)
        vo2 = wcol(3)
        fl2 = wcol(4)
        A2 = wcol(5)
        M2 = wcol(6)
        al2 = wcol(7)

        # self-exclusion by global row index (2-D iotas for Mosaic)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        gid = b * BN + jax.lax.broadcasted_iota(jnp.int32, (BN, 1), 0)
        wid = ws + col
        valid = (gid != wid) & (al1 > 0.5) & (al2 > 0.5) \
            & (col < wn) & (fl1 != -1.) & (fl2 != -1.)

        lat_ref = 0.5 * (lat1 + lat2)
        if cfg.grid_is_latlon:
            dx_dlon = PI_180 * cfg.Rearth * jnp.cos(PI_180 * lat_ref)
            dy_dlat = PI_180 * cfg.Rearth
        else:
            dx_dlon = 1.0
            dy_dlat = 1.0
        rx = (lon1 - lon2) * dx_dlon
        ry = (lat1 - lat2) * dy_dlat
        r = jnp.sqrt(rx * rx + ry * ry)
        rsafe = jnp.where(r > 0., r, 1.)

        R1 = radius(A1)
        R2 = radius(A2)
        crit = jnp.maximum(R1 + R2, cfg.contact_distance)
        active = valid & (r > 0.) & (r < crit)
        M_min = jnp.minimum(M1, M2)
        mm = M_min / M1

        accel_spring = spring_coef * mm * (crit - r)
        IA_x = jnp.sum(jnp.where(active, accel_spring * rx / rsafe, 0.),
                       -1)
        IA_y = jnp.sum(jnp.where(active, accel_spring * ry / rsafe, 0.),
                       -1)

        P11 = (rx * rx) / (rsafe * rsafe)
        P12 = (rx * ry) / (rsafe * rsafe)
        P22 = (ry * ry) / (rsafe * rsafe)
        u0b = rows[:, 8:9]
        v0b = rows[:, 9:10]
        u1b = rows[:, 10:11]
        v1b = rows[:, 11:12]

        def pmag(p11, p12, p22, coef):
            if not cfg.scale_damping_by_pmag:
                return coef
            du1, dv1 = uo2 - u1b, vo2 - v1b
            du0, dv0 = uo2 - u0b, vo2 - v0b
            m1 = jnp.sqrt((p11 * du1 + p12 * dv1) ** 2
                          + (p12 * du1 + p22 * dv1) ** 2)
            m0 = jnp.sqrt((p11 * du0 + p12 * dv0) ** 2
                          + (p12 * du0 + p22 * dv0) ** 2)
            return coef * 0.5 * (m1 + m0)

        wr = jnp.where(active, pmag(P11, P12, P22, radial_damping * mm),
                       0.)
        wt = jnp.where(active, pmag(1. - P11, -P12, 1. - P22,
                                    tangental_damping * mm), 0.)
        D11 = wr * P11 + wt * (1. - P11)
        D12 = wr * P12 + wt * (-P12)
        D22 = wr * P22 + wt * (1. - P22)
        out = jnp.stack([
            IA_x, IA_y, jnp.sum(D11, -1), jnp.sum(D12, -1),
            jnp.sum(D22, -1), jnp.sum(D11 * uo2 + D12 * vo2, -1),
            jnp.sum(D12 * uo2 + D22 * vo2, -1),
            jnp.zeros_like(IA_x)], axis=-1)
        out_ref[...] = out

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BN, 8), lambda b, ws, wn: (b, 0)),
        scratch_shapes=[pltpu.VMEM((BN, F), P.dtype),
                        pltpu.VMEM((F, W), P.dtype),
                        pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, 8), P.dtype),
        interpret=interpret,
    )((win_start // 128).astype(jnp.int32), win_need.astype(jnp.int32),
      Ppad, PTpad)

    return IA(IA_x=out[:, 0], IA_y=out[:, 1], P11=out[:, 2],
              P12=out[:, 3], P21=out[:, 3], P22=out[:, 4],
              Pu_x=out[:, 5], Pu_y=out[:, 6]), overflow
