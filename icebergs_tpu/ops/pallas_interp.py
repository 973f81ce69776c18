"""Sorted-frame field->berg interpolation kernel (Pallas).

``interp_flds`` (ops/interp.py, port of icebergs.F90:4718-4969) costs one
(N, S~80) row gather at 1M bergs — the row buffer tile-pads to 128 lanes
(512 MB) and the random-access gather dominates the phase (~40 of
55 ms/step on v5e).  On the PERSISTENT (cell, id)-sorted slab the gather
rows are *contiguous*: a block of BN consecutive bergs reads a
contiguous cell range of the slot table.  This kernel streams that range
through VMEM (Element-indexed window operand, auto-pipelined) and
extracts each berg's row with an exact 0/1 selection matmul on the MXU —
the ``contact_extract_sorted`` trick (ops/pallas_prepass.py).

Two layers:

* :func:`interp_cell_table` precomputes every per-CELL quantity on the
  2-D grid: the 4 corner values of the 8 corner-interpolated fields, the
  12 ``ddx``/``ddy`` SSH-stencil values (the same arithmetic
  ``interp_flds`` does per berg, hoisted to per cell — elementwise
  identical), the A-grid scalars and ocean depth + ssh.
* :func:`interp_sorted` runs the kernel: per block, one window DMA + one
  (S, CL) @ (CL, BN) selection matmul + the per-berg bilinear/stencil
  math on (1, BN) rows — bitwise identical to ``interp_flds`` (asserted
  by tests/test_pallas_interp.py).

Blocks whose cell span exceeds the static window are flagged; the caller
falls back to the XLA path for those rows (lax.cond — free when no block
overflows, which is the steady state at production densities).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import IcebergsConfig
from ..grid import Grid
from .pallas_pack import _auto_interpret

# Interface-phase backend selection lives in IcebergsConfig
# (``interp_mode``: "table" = the single-gather slot-table path,
# production default; "kernel" = the Mosaic sorted-frame kernel;
# "xla" = per-field grid-table gathers) and ``interp_gathered``
# (kernel-mode window materialization, same trade as the extraction
# kernel's "gathered" impl).  model.make_step resolves eligibility.

# slot-row layout of the per-cell table
# corners: field k in (cosc, sinc, uo, vo, ui, vi, ua, va), corner
# (io, jo) row-major -> rows 4*k + 2*io + jo
S_CORN = 0
# ddx at (ii_off, jj_off) in ((0,1),(0,0),(0,-1),(-1,1),(-1,0),(-1,-1))
S_DDX = 32
# ddy at ((1,0),(0,0),(-1,0),(1,-1),(0,-1),(-1,-1))
S_DDY = 38
S_SST, S_SSS, S_CN, S_HI, S_OD = 44, 45, 46, 47, 48
# nonfinite-ddx/ddy indicator bitmasks (bit s = slot S_DDX/Y + s was
# NaN/inf before scrubbing) — see the NaN note in interp_cell_table
S_NANX, S_NANY = 49, 50
# the walk's 5x5 packed land-mask anchor (dynamics._msk25_table value at
# this cell), split 13 lo + 12 hi bits so each row is f32-exact
S_M25L, S_M25H = 51, 52
# the walk's 9x9 packed anchor rows (dynamics._msk81_rows, 9 bits each,
# f32-exact): with these the whole 4-iteration walk is gather-free
S_M81 = 53            # rows 53..61
S_NROWS = 64          # padded to a sublane-tile multiple


def interp_cell_table(grid: Grid, frc, cfg: IcebergsConfig,
                      with_quad_od: bool = False):
    """(S_NROWS, ncells) per-cell slot table, interior cell-key order
    (key = jne*nx + ine).

    Every row is the exact value ``interp_flds`` reads (corners) or
    computes from per-cell reads only (ddx/ddy) for a berg in that cell;
    the arithmetic is elementwise, so hoisting it from per-berg to
    per-cell is bitwise-neutral.

    ``with_quad_od`` appends 25 rows: the 5x5 neighborhood of
    ``ocean_depth + ssh`` (padded-array offsets -2..+2 around the cell)
    that the MTS quadratic depth read (`quad_interp_from_agrid`)
    touches — the node window starts at ``is_lo - i in {-2..0}`` and
    spans 3 nodes, so every read lands in this neighborhood.  Used by
    the TABLE interp path for MTS configs (rows 56..80; the Pallas
    kernels keep the 56-row layout).
    """
    nx, ny = grid.nx, grid.ny

    def interior(f2d):
        # (nx+2, ny+2) padded field -> (ncells,) interior in key order
        return f2d[1:nx + 1, 1:ny + 1].T.reshape(-1)

    rows = [None] * S_NROWS

    # corner values: value at padded cell (I, J), corner (io, jo) is
    # fpad[I-1+io, J-1+jo] on a (1, 2)-padded field (ops/interp._interp_table)
    for k, f in enumerate([grid.cosc, grid.sinc, frc.uo, frc.vo, frc.ui,
                           frc.vi, frc.ua, frc.va]):
        fp = jnp.pad(f, ((1, 2), (1, 2)))
        for io in (0, 1):
            for jo in (0, 1):
                v = fp[io:io + f.shape[0] + 1, jo:jo + f.shape[1] + 1]
                rows[S_CORN + 4 * k + 2 * io + jo] = interior(
                    v[:f.shape[0], :f.shape[1]])

    # center reads, edge-clamped exactly like _interp_table.center
    def center(f, di, dj):
        fp = jnp.pad(f, ((2, 2), (2, 2)), mode='edge')
        return fp[2 + di:2 + di + f.shape[0], 2 + dj:2 + dj + f.shape[1]]

    ssh, msk, dx, dy = frc.ssh, grid.msk, grid.dx, grid.dy

    # NaN-free like ops/interp.ddx: clamped denominator + den==0 as the
    # poison indicator (a raw slot is nonfinite iff den == 0)
    def ddx(o0, o1):
        dxp = 0.5 * (center(dx, o0 + 1, o1) + center(dx, o0 + 1, o1 - 1))
        dx0 = 0.5 * (center(dx, o0, o1) + center(dx, o0, o1 - 1))
        den = dx0 + dxp
        v = 2. * (center(ssh, o0 + 1, o1) - center(ssh, o0, o1)) \
            / jnp.maximum(den, 1e-30) \
            * center(msk, o0 + 1, o1) * center(msk, o0, o1)
        return v, den == 0.

    def ddy(o0, o1):
        dyp = 0.5 * (center(dy, o0, o1 + 1) + center(dy, o0 - 1, o1 + 1))
        dy0 = 0.5 * (center(dy, o0, o1) + center(dy, o0 - 1, o1))
        den = dy0 + dyp
        v = 2. * (center(ssh, o0, o1 + 1) - center(ssh, o0, o1)) \
            / jnp.maximum(den, 1e-30) \
            * center(msk, o0, o1 + 1) * center(msk, o0, o1)
        return v, den == 0.

    # NaN NOTE: boundary cells divide by zero dx/dy sums -> NaN (inf *
    # msk 0).  interp_flds lets the NaN flow to the berg's rotated
    # ssh_x/ssh_y and scrubs it there (icebergs.F90:4893-4894); a NaN in
    # this table would instead poison every berg in the kernel's window
    # (NaN * one-hot 0.0 = NaN through the matmul).  So nonfinite
    # stencil values are scrubbed to 0 here and recorded in per-cell
    # indicator bitmasks; _env_rows_from_slots re-applies the reference
    # scrub from the bits.  (A +-inf that would survive interp_flds
    # unscrubbed becomes 0 here — that needs dx==0 on an ocean-ocean
    # cell pair, which no valid grid has.)
    nanx = jnp.zeros(nx * ny, jnp.float32)
    nany = jnp.zeros(nx * ny, jnp.float32)
    for s, o in enumerate(((0, 1), (0, 0), (0, -1),
                           (-1, 1), (-1, 0), (-1, -1))):
        v, bad = ddx(*o)
        v, bad = interior(v), interior(bad)
        nanx = nanx + jnp.where(bad, float(1 << s), 0.)
        rows[S_DDX + s] = jnp.where(bad, 0., v)
    for s, o in enumerate(((1, 0), (0, 0), (-1, 0),
                           (1, -1), (0, -1), (-1, -1))):
        v, bad = ddy(*o)
        v, bad = interior(v), interior(bad)
        nany = nany + jnp.where(bad, float(1 << s), 0.)
        rows[S_DDY + s] = jnp.where(bad, 0., v)
    rows[S_NANX] = nanx
    rows[S_NANY] = nany

    rows[S_SST] = interior(frc.sst)
    rows[S_SSS] = interior(frc.sss)
    rows[S_CN] = interior(frc.cn)
    rows[S_HI] = interior(frc.hi)
    rows[S_OD] = interior(grid.ocean_depth + frc.ssh)

    # walk anchor: m25_tab[(i+1)+2, (j+1)+2] per interior cell, split
    # into two <= 2^13 halves (25 packed bits exceed f32's 2^24 integer
    # range through the extraction matmul)
    from ..dynamics import _msk25_table, _msk81_rows
    m25 = _msk25_table(grid.msk)[3:nx + 3, 3:ny + 3].T.reshape(-1)
    rows[S_M25L] = (m25 & 0x1FFF).astype(jnp.float32)
    rows[S_M25H] = (m25 >> 13).astype(jnp.float32)
    m81 = _msk81_rows(grid.msk)          # (9, nx+10, ny+10)
    for k in range(9):
        rows[S_M81 + k] = m81[k, 5:nx + 5, 5:ny + 5].T.reshape(
            -1).astype(jnp.float32)

    z = jnp.zeros_like(rows[0])
    rows = [z if r is None else r for r in rows]
    if with_quad_od:
        fldq = jnp.pad(grid.ocean_depth + frc.ssh, 2, mode='edge')
        for dy in (-2, -1, 0, 1, 2):
            for dx in (-2, -1, 0, 1, 2):
                # padded-array read fld[(i+1)+dx, (j+1)+dy] per interior
                # cell (i, j); the extra edge ring covers offsets the
                # node-window clamp never selects
                rows.append(fldq[3 + dx:3 + dx + nx,
                                 3 + dy:3 + dy + ny].T.reshape(-1))
    return jnp.stack([r.astype(jnp.float32) for r in rows], axis=0)


def _env_rows_from_slots(read, xi, yj, cfg: IcebergsConfig):
    """The per-berg interp math on slot accessors — mirrors
    ``interp_flds`` (ops/interp.py) term for term on whatever shape
    ``read`` returns ((1, BN) in the kernel)."""
    ob = cfg.old_bug_bilin

    vals = []
    for k in range(8):
        f00 = read(S_CORN + 4 * k + 0)
        f01 = read(S_CORN + 4 * k + 1)
        f10 = read(S_CORN + 4 * k + 2)
        f11 = read(S_CORN + 4 * k + 3)
        if ob:
            vals.append((f11 * (1. - xi) + f01 * xi) * (1. - yj)
                        + (f10 * (1. - xi) + f00 * xi) * yj)
        else:
            vals.append((f11 * xi + f01 * (1. - xi)) * yj
                        + (f10 * xi + f00 * (1. - xi)) * (1. - yj))
    cos_rot, sin_rot = vals[0], vals[1]
    uo, vo = vals[2], vals[3]
    ui, vi = vals[4], vals[5]
    ua, va = vals[6], vals[7]

    dX = [read(S_DDX + s) for s in range(6)]   # (0,1),(0,0),(0,-1),(-1,*)
    dY = [read(S_DDY + s) for s in range(6)]   # (1,0),(0,0),(-1,0),(*,-1)

    hxp = jnp.where(yj >= 0.5,
                    (yj - 0.5) * dX[0] + (1.5 - yj) * dX[1],
                    (yj + 0.5) * dX[1] + (0.5 - yj) * dX[2])
    hxm = jnp.where(yj >= 0.5,
                    (yj - 0.5) * dX[3] + (1.5 - yj) * dX[4],
                    (yj + 0.5) * dX[4] + (0.5 - yj) * dX[5])
    ssh_x = xi * hxp + (1. - xi) * hxm

    hyp = jnp.where(xi >= 0.5,
                    (xi - 0.5) * dY[0] + (1.5 - xi) * dY[1],
                    (xi + 0.5) * dY[1] + (0.5 - xi) * dY[2])
    hym = jnp.where(xi >= 0.5,
                    (xi - 0.5) * dY[3] + (1.5 - xi) * dY[4],
                    (xi + 0.5) * dY[4] + (0.5 - xi) * dY[5])
    ssh_y = yj * hyp + (1. - yj) * hym

    def rot(u, v):
        return cos_rot * u + sin_rot * v, cos_rot * v - sin_rot * u

    uo, vo = rot(uo, vo)
    ui, vi = rot(ui, vi)
    ua, va = rot(ua, va)
    ssh_x, ssh_y = rot(ssh_x, ssh_y)

    # the reference NaN scrub (icebergs.F90:4893-4894), reconstructed
    # from the table's nonfinite-indicator bits: a rotated component is
    # NaN iff any ddx/ddy slot its taken where-branches touched was
    # nonfinite (0 * NaN = NaN keeps zero-weight terms poisonous, and
    # the rotation mixes x into y and vice versa)
    bx = read(S_NANX).astype(jnp.int32)
    by = read(S_NANY).astype(jnp.int32)

    def bitmask(bits):
        m = 0
        for k in bits:
            m |= 1 << k
        return m

    # keep the bit tests in i32 until ONE final compare: Mosaic cannot
    # lower the i8->i1 truncations a select on boolean operands emits
    # ("Unsupported target bitwidth for truncation", seen on the
    # gathered-interp compile 2026-08-20)
    mlo, mhi = bitmask((0, 1, 3, 4)), bitmask((1, 2, 4, 5))
    px = bx & jnp.where(yj >= 0.5, mlo, mhi)
    py = by & jnp.where(xi >= 0.5, mlo, mhi)
    poison = (px | py) != 0
    ssh_x = jnp.where(poison, 0., ssh_x)
    ssh_y = jnp.where(poison, 0., ssh_y)

    return [uo, vo, ui, vi, ua, va, ssh_x, ssh_y,
            read(S_SST), read(S_SSS), read(S_CN), read(S_HI),
            read(S_OD), read(S_M25L), read(S_M25H)]


E_NOUT = 16           # 13 Env + 2 walk-anchor rows + 1 pad row


def interp_sorted(tbl, key_s, xi, yj, grid: Grid, cfg: IcebergsConfig, *,
                  block_n: int = 128, cell_window: int = 384,
                  interpret: bool = None, gathered: bool = None):
    """Env rows for a (cell, id)-sorted slab.

    tbl: (S_NROWS, ncells) from :func:`interp_cell_table`
    key_s: (N,) sorted cell keys (dead rows = ncells)
    xi/yj: (N,) intra-cell coordinates (sorted frame)

    Returns (env_rows (15, N): 13 Env + 2 walk-anchor halves, bad_row
    (N,) bool).  ``bad_row`` marks
    rows in blocks whose cell span exceeds ``cell_window`` (their output
    is garbage — the caller re-does them through the XLA path).
    Requires ``coastal_drift == tidal_drift == 0`` and the non-MTS
    ocean-depth read (PCM od+ssh); callers gate on that.
    """
    interpret = _auto_interpret(interpret)
    from jax._src.pallas.core import Element as _Element

    assert cfg.coastal_drift == 0. and cfg.tidal_drift == 0.
    assert not cfg.mts
    N = key_s.shape[0]
    BN = block_n
    CL = -(-(cell_window + 128) // 128) * 128
    nblocks = -(-N // BN)
    Npad = nblocks * BN
    ncells = tbl.shape[1]
    dtype = xi.dtype

    tbl_pad = jnp.concatenate(
        [tbl, jnp.zeros((S_NROWS, CL), tbl.dtype)], axis=1)
    key = jnp.concatenate(
        [key_s.astype(jnp.int32),
         jnp.full((Npad - N,), ncells, jnp.int32)])
    P = jnp.stack([key.astype(dtype),
                   jnp.concatenate([xi, jnp.zeros((Npad - N,), dtype)]),
                   jnp.concatenate([yj, jnp.zeros((Npad - N,), dtype)]),
                   jnp.zeros((Npad,), dtype),
                   jnp.zeros((Npad,), dtype),
                   jnp.zeros((Npad,), dtype),
                   jnp.zeros((Npad,), dtype),
                   jnp.zeros((Npad,), dtype)], axis=0)   # (8, Npad)

    c0 = key[::BN]
    c1 = jnp.minimum(key[BN - 1::BN], ncells - 1)
    w0 = jnp.minimum(c0, ncells - 1) // 128 * 128
    bad = (c1 - w0 + 1) > CL

    if gathered is None:
        gathered = False
    if gathered:
        # tile-granular up-front window materialization (see
        # pallas_prepass.contact_extract_sorted_g): each block's
        # CL-cell window is ntw whole (S_NROWS, 128) lane tiles
        ntw = CL // 128
        Wt = -(-(ncells + CL) // 128) * 128
        tblw = jnp.concatenate(
            [tbl, jnp.zeros((S_NROWS, Wt - ncells), tbl.dtype)], axis=1)
        tblr = tblw.reshape(S_NROWS, Wt // 128, 128)
        tidx = (w0.astype(jnp.int32)[:, None] // 128
                + jnp.arange(ntw, dtype=jnp.int32))      # (nb, ntw)
        Wg = jnp.take(tblr, tidx.reshape(-1), axis=1)
        # block-major (nblocks, S_NROWS, CL): Mosaic requires the last
        # two BLOCK dims (8, 128)-aligned — a (R, 1, W) block fails
        Wg = jnp.swapaxes(Wg.reshape(S_NROWS, nblocks, CL), 0, 1)

    def kernel(w0_ref, self_ref, win_ref, out_ref):
        b = pl.program_id(0)
        rows = self_ref[...]                   # (8, BN)
        keyb = rows[0:1, :]
        xib = rows[1:2, :]
        yjb = rows[2:3, :]
        win = (win_ref[0, :, :] if gathered
               else win_ref[...])              # (S_NROWS, CL)

        w0b = w0_ref[b]
        cells = (w0b + jax.lax.broadcasted_iota(jnp.int32, (CL, 1), 0)
                 ).astype(dtype)               # (CL, 1)
        oh = jnp.where(cells == keyb, 1., 0.).astype(dtype)   # (CL, BN)
        # exact extraction: each product is 1.0 * slot or 0.0
        # (HIGHEST: Mosaic's default dot truncates f32 operands to bf16)
        g = jax.lax.dot_general(
            win, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST)              # (S, BN)

        env = _env_rows_from_slots(lambda s: g[s:s + 1, :], xib, yjb, cfg)
        out_ref[...] = jnp.concatenate(
            env + [jnp.zeros((E_NOUT - len(env), BN), dtype)], axis=0)

    win_spec = (pl.BlockSpec((1, S_NROWS, CL), lambda b, *_: (b, 0, 0))
                if gathered else
                pl.BlockSpec((_Element(S_NROWS), _Element(CL)),
                             lambda b, w0r: (0, w0r[b])))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((8, BN), lambda b, *_: (0, b)), win_spec],
        out_specs=pl.BlockSpec((E_NOUT, BN), lambda b, *_: (0, b)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E_NOUT, Npad), dtype),
        interpret=interpret,
    )(w0.astype(jnp.int32), P, Wg if gathered else tbl_pad)[:15, :N]

    bad_row = jnp.repeat(bad, BN, total_repeat_length=Npad)[:N]
    return out, bad_row


S_QOD = S_NROWS       # 25 quad-od rows when with_quad_od


def _quad_od_from_rows(read, key, xi, yj, grid: Grid,
                       cfg: IcebergsConfig, dtype):
    """MTS quadratic depth read from the 25-row od neighborhood.

    Reproduces ``quad_interp_from_agrid`` (regular-grid path,
    icebergs_framework.F90:7168-7255) with the local coordinate derived
    from ``i + xi`` instead of the berg's stored lon/lat — equal in
    exact arithmetic; differs by O(ulp(lon)/dlon) in f32 (the stored
    coordinate carries km-scale magnitudes), so parity with the XLA
    path is tolerance-level, not bitwise."""
    nx, ny = grid.nx, grid.ny
    i = key % nx
    j = key // nx
    mind = 0 if cfg.rev_mind else 1
    par_i = (i + 1) % 2
    par_j = (j + 1) % 2
    is_lo = jnp.where(par_i == mind, jnp.where(xi >= 0.5, i, i - 2),
                      i - 1)
    js_lo = jnp.where(par_j == mind, jnp.where(yj >= 0.5, j, j - 2),
                      j - 1)
    is_lo = jnp.clip(is_lo, -1, nx - 2)
    js_lo = jnp.clip(js_lo, -1, ny - 2)
    dxo = is_lo - i                      # node-window start, in {-2..0}
    dyo = js_lo - j

    xloc = (i - is_lo).astype(dtype) + xi - 1.5
    yloc = (j - js_lo).astype(dtype) + yj - 1.5
    xb = (0.5 * xloc * (xloc - 1.), (1. + xloc) * (1. - xloc),
          0.5 * xloc * (xloc + 1.))
    yb = (0.5 * yloc * (yloc - 1.), (1. + yloc) * (1. - yloc),
          0.5 * yloc * (yloc + 1.))

    def coeff(basis, d, o):
        # weight of neighborhood offset o: basis index a with d + a == o
        c = jnp.zeros_like(basis[0])
        for a in range(3):
            c = c + jnp.where(d == o - a, basis[a], 0.)
        return c

    cx = [coeff(xb, dxo, o) for o in (-2, -1, 0, 1, 2)]
    cy = [coeff(yb, dyo, o) for o in (-2, -1, 0, 1, 2)]
    out = jnp.zeros_like(xi)
    for oy in range(5):
        for ox in range(5):
            out = out + cx[ox] * cy[oy] * read(S_QOD + oy * 5 + ox)
    return out


def interp_to_bergs_table(st, grid: Grid, frc, cfg: IcebergsConfig):
    """Single-gather interface phase: the per-cell slot table
    (:func:`interp_cell_table`) is transposed to (ncells+1, 64 lanes)
    and each berg reads its row with ONE packed row gather; the env
    then comes from the identical per-berg arithmetic the kernel runs
    (:func:`_env_rows_from_slots`).

    Same table, same expressions as the kernel path — and unlike the
    kernel it needs no sorted frame (the gather is keyed), no Mosaic,
    and no window-overflow fallback.  At 1M bergs this replaces the XLA
    interp's ~56 separate (N,) grid-table gathers (~72 ms measured on
    v5e, session-13 leave-one-out) with one ~16 ms packed gather.

    Returns ``(state_with_env, m25_pre)`` like
    :func:`interp_to_bergs_sorted`.
    """
    assert cfg.coastal_drift == 0. and cfg.tidal_drift == 0.
    # MTS configs read ocean depth through the quadratic A-grid stencil
    # instead of the PCM row — served by 25 extra table rows (the
    # A68_test analytic branch keeps the XLA path)
    mts_quad = cfg.mts
    assert not (cfg.mts and cfg.A68_test)
    from . import pallas_pack as _pk
    ncells = grid.nx * grid.ny
    key = jnp.where(st.alive, st.jne * grid.nx + st.ine,
                    ncells).astype(jnp.int32)
    tbl = interp_cell_table(grid, frc, cfg, with_quad_od=mts_quad)
    tbl = jnp.concatenate(
        [tbl, jnp.zeros((tbl.shape[0], 1), tbl.dtype)], axis=1)
    if cfg.pack_kernel:
        # same trick as the re-sort transport: the row gather itself is
        # cheap, but XLA's (N, 56->128-lane-padded) result layout and
        # per-column slicing are not — transpose via the Pallas block
        # kernels and hand the env math contiguous (N,) rows.  u32
        # transport, bitwise.
        P = _pk.pack_rows_to_lanes(
            jax.lax.bitcast_convert_type(tbl, jnp.uint32))
        S = jnp.take(P, key, axis=0)                  # (N, 128) u32
        rowsC = jax.lax.bitcast_convert_type(
            _pk.unpack_lanes_to_rows(S, tbl.shape[0]), tbl.dtype)
        read = lambda s: rowsC[s]
    else:
        rows = tbl.T[key]                             # (N, NR)
        read = lambda s: rows[:, s]
    out = _env_rows_from_slots(read, st.xi, st.yj, cfg)
    od = out[12]
    if mts_quad:
        od = _quad_od_from_rows(read, key, st.xi, st.yj, grid, cfg,
                                st.lon.dtype)
    m25_pre = (out[13].astype(jnp.int32)
               + out[14].astype(jnp.int32) * 8192)
    # 9x9 walk-anchor rows ride the same gather: the walk becomes
    # gather-free (dynamics._walk4 m81 path; round-5 lever)
    m81_pre = jnp.stack([read(S_M81 + k).astype(jnp.int32)
                         for k in range(9)], axis=0)
    st = st.replace(uo=out[0], vo=out[1], ui=out[2], vi=out[3],
                    ua=out[4], va=out[5], ssh_x=out[6], ssh_y=out[7],
                    sst=out[8], sss=out[9], cn=out[10], hi=out[11],
                    od=od)
    return st, (m25_pre, m81_pre)


def interp_to_bergs_sorted(st, grid: Grid, frc, cfg: IcebergsConfig, *,
                           block_n: int = 128, cell_window: int = 384,
                           interpret: bool = None):
    """Kernel-path twin of ``model.interp_to_bergs`` for the persistent
    sorted slab: bitwise-identical Env caching, with a full-XLA fallback
    under ``lax.cond`` when any block's cell span overflows the window
    (zero cost in the steady state)."""
    interpret = _auto_interpret(interpret)
    from .interp import interp_flds
    from ..dynamics import _msk25_table

    ncells = grid.nx * grid.ny
    key_s = jnp.where(st.alive, st.jne * grid.nx + st.ine, ncells)
    tbl = interp_cell_table(grid, frc, cfg)
    rows, bad_row = interp_sorted(
        tbl, key_s, st.xi, st.yj, grid, cfg, block_n=block_n,
        cell_window=cell_window, interpret=interpret,
        gathered=cfg.interp_gathered)

    def with_fallback(rows):
        env = interp_flds(grid, frc, cfg, st.lon, st.lat, st.ine, st.jne,
                          st.xi, st.yj)
        m25 = _msk25_table(grid.msk)[st.ine + 3, st.jne + 3]
        xla = jnp.stack([env.uo, env.vo, env.ui, env.vi, env.ua, env.va,
                         env.ssh_x, env.ssh_y, env.sst, env.sss, env.cn,
                         env.hi, env.od,
                         (m25 & 0x1FFF).astype(rows.dtype),
                         (m25 >> 13).astype(rows.dtype)], axis=0)
        return jnp.where(bad_row[None, :], xla, rows)

    rows = jax.lax.cond(jnp.any(bad_row), with_fallback,
                        lambda r: r, rows)
    # the walk's first-anchor packed mask, recombined (dead rows read 0
    # = all-land: the walk then leaves them in place, which is as
    # meaningful as the XLA path's stale-cell gather)
    # combine in INT space: lo + hi*8192 reaches 2^25, beyond f32's
    # exact-integer range
    m25_pre = (rows[13].astype(jnp.int32)
               + rows[14].astype(jnp.int32) * 8192)
    st = st.replace(uo=rows[0], vo=rows[1], ui=rows[2], vi=rows[3],
                    ua=rows[4], va=rows[5], ssh_x=rows[6],
                    ssh_y=rows[7], sst=rows[8], sss=rows[9],
                    cn=rows[10], hi=rows[11], od=rows[12])
    return st, m25_pre
