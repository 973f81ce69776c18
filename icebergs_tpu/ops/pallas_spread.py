"""Pallas segment-sum kernel for the reproducible spreading pass.

The round-2 slot-sum backends (ops/spread.py `_cell_slot_sums*`) reduce
per-cell in a fixed K-slot tree; at 1M bergs the (9F+FX, ncells*K) slot
traffic costs 420-590 ms/step on v5e — the whole step's dominant cost.
This kernel computes the same per-cell sums as ONE pass over the
cell-sorted payload rows with 0/1 selection matmuls on the MXU (the
`contact_extract_sorted` trick, ops/pallas_prepass.py):

* rows are sorted by (cell, id) — ONE `lax.sort` with ~26 payload rows
  (~22 ms at 1M; measured +0.5 ms/payload row);
* each program owns `cb` consecutive cells and DMAs the window of
  sorted rows covering them (alignment slop rows carry out-of-range
  keys and die on the one-hot compare);
* the 3x3 spreading weights (spread_weights' rectangle model,
  icebergs.F90:3960-4001) are computed IN KERNEL from xi/yj/area rows —
  the 9 per-berg neighbor-mask values come from a per-CELL table looked
  up with the same one-hot matmul (exact: every product is 1.0*x);
* per-cell sums are one (OUT, W) @ (W, cb) matmul.  The MXU accumulates
  the contraction dim sequentially, so each cell's rows sum in (cell,
  id) order — the REFERENCE's own reproducing semantics (id-ordered
  per-cell lists, icebergs_framework.F90:33), with zeros from other
  cells' rows as exact identity adds.  Bitwise layout-invariant as long
  as no block overflows its window (the analog of the slot backends'
  "occupancy <= K" bound; overflow is counted and falls back).

NOTE the summation association differs from the slot backends' pairwise
tree: results are deterministic and layout-invariant but not bitwise
equal to slot_sum_method="scatter"/"gather"/"scatter_t" runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import IcebergsConfig
from .pallas_pack import _auto_interpret

# Spread-kernel window-feed selection lives in IcebergsConfig
# (``spread_impl``): "manual" (production default — explicit copy/wait
# DMAs; the pipelined/gathered variants lost their same-window A/Bs),
# "gathered" (tile-granular up-front window gather), or "pipelined"
# (Element-indexed window operands).  Bit-identical outputs.

# payload-row indices in the sorted stack (values set in build_rows)
R_KEY = 0          # cell key as f32 (exact below 2^24 cells)
R_XI = 1
R_YJ = 2
R_AREA = 3         # L*W (raw element area, for the weight shrink L)
R_MASS = 4         # berg_spread_mass, POST-thermo-alive masked
R_LWMS = 5         # L*W*mass_scaling, alive-masked
R_U = 6            # uvel (raw)
R_V = 7            # vvel (raw)
R_MASSMS = 8       # mass*mass_scaling, alive-masked
R_VIRT = 9         # virtual-area column (precomputed, alive-masked)
R_BITS = 10        # (mass_of_bits+fl_bergy)*w_cell  [full column]
R_FLB = 11         # mass_of_fl_bits*w_cell          [full column]
R_FLBB = 12        # mass_of_fl_bergy_bits*w_cell    [full column]
R_NFIX = 13        # melt/extra pass-through columns start here

# per-cell static table rows: 9 neighbor masks (dj,di row-major like
# spread_weights) then the cell area
T_MSK0 = 0
T_AREA = 9
T_NROWS = 16       # padded to a sublane multiple


def cell_tables(grid):
    """(T_NROWS, ncells) static per-cell table: 9 neighbor masks +
    grid.area, cell id = jne*nx + ine (interior indexing)."""
    nx, ny = grid.nx, grid.ny
    msk = grid.msk
    area = grid.area
    rows = []
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            rows.append(msk[1 + di:nx + 1 + di, 1 + dj:ny + 1 + dj]
                        .T.reshape(-1))
    rows.append(area[1:-1, 1:-1].T.reshape(-1))
    z = jnp.zeros_like(rows[0])
    rows += [z] * (T_NROWS - len(rows))
    return jnp.stack([r.astype(jnp.float32) for r in rows], axis=0)


def _weights_from_rows(rows, tblrows, cfg, dtype):
    """Rectangle spreading weights (9, W) from sorted payload rows —
    mirrors ops/spread.spread_weights' rectangle branch exactly
    (icebergs.F90:3960-4001)."""
    x = rows[R_XI:R_XI + 1, :]
    y = rows[R_YJ:R_YJ + 1, :]
    Area = rows[R_AREA:R_AREA + 1, :]
    area_cell = tblrows[T_AREA:T_AREA + 1, :]
    m = [tblrows[T_MSK0 + k:T_MSK0 + k + 1, :] for k in range(9)]

    L = jnp.where(area_cell > 0.,
                  jnp.minimum(jnp.sqrt(Area / jnp.maximum(area_cell,
                                                          1e-30)), 1.0),
                  1.0)
    if cfg.use_old_spreading:
        xL = jnp.minimum(0.5, jnp.maximum(0., 0.5 - x))
        xR = jnp.minimum(0.5, jnp.maximum(0., x - 0.5))
        yD = jnp.minimum(0.5, jnp.maximum(0., 0.5 - y))
        yU = jnp.minimum(0.5, jnp.maximum(0., y - 0.5))
    else:
        Ls = jnp.maximum(L, 1e-30)
        xL = jnp.minimum(0.5, jnp.maximum(0., 0.5 - x / Ls))
        xR = jnp.minimum(0.5, jnp.maximum(0., x / Ls + (0.5 - 1. / Ls)))
        yD = jnp.minimum(0.5, jnp.maximum(0., 0.5 - y / Ls))
        yU = jnp.minimum(0.5, jnp.maximum(0., y / Ls + (0.5 - 1. / Ls)))
    xC = jnp.maximum(0., 1. - (xL + xR))
    yC = jnp.maximum(0., 1. - (yD + yU))

    # weight order: (dj, di) row-major over dj in (-1,0,1), di in (-1,0,1)
    yDxL = yD * xL * m[0]
    yDxC = yD * xC * m[1]
    yDxR = yD * xR * m[2]
    yCxL = yC * xL * m[3]
    yCxR = yC * xR * m[5]
    yUxL = yU * xL * m[6]
    yUxC = yU * xC * m[7]
    yUxR = yU * xR * m[8]
    yCxC = 1. - (((yDxL + yUxR) + (yDxR + yUxL))
                 + ((yCxL + yCxR) + (yDxC + yUxC)))
    return jnp.concatenate([yDxL, yDxC, yDxR, yCxL, yCxC, yCxR,
                            yUxL, yUxC, yUxR], axis=0).astype(dtype)


def auto_window(N, ncells, cell_block, headroom: float = 4.0):
    """Static window rows per cell block: `headroom` x the uniform
    expected occupancy + slop (128-alignment + margin)."""
    exp = cell_block * N / max(ncells, 1)
    return -(-int(exp * headroom + 256) // 128) * 128


def segment_spread_sums(rows_s, cell_starts, tbl, cfg:
                        IcebergsConfig, n_extra: int, *,
                        cell_block: int = 128, window: int = None,
                        interpret: bool = False):
    """Per-cell sums of the 36 spread products + 7 cell columns +
    ``n_extra`` pass-through columns from CELL-SORTED payload rows.

    rows_s: (R_NFIX+n_extra, N) sorted payload stack (see R_* indices;
            row R_KEY carries the sorted cell key as f32, dead = ncells)
    cell_starts: (ncells+1,) i32 row offsets per cell
    tbl: (T_NROWS, ncells) from :func:`cell_tables`

    Returns (S, bad): S (ncells, 36+7+n_extra) per-cell sums in the
    scatter9_slots column order; bad (nblocks,) bool marks cell blocks
    whose row window overflowed `window` (their S columns are garbage —
    the caller falls back for those runs).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, N = rows_s.shape
    cb = cell_block
    ncells = tbl.shape[1]
    nblocks = -(-ncells // cb)
    ncpad = nblocks * cb
    if window is None:
        window = auto_window(N, ncells, cb)
    OUT = 36 + 7 + n_extra
    # Mosaic requires HBM memref slices and output blocks 8-row aligned
    Rpad = -(-R // 8) * 8
    OUTP = -(-OUT // 8) * 8
    WL = -(-(window + 128) // 128) * 128
    dtype = rows_s.dtype

    rows_pad = jnp.concatenate(
        [rows_s, jnp.zeros((R, WL), dtype)
         .at[R_KEY].set(float(ncells))], axis=1)
    rows_pad = jnp.concatenate(
        [rows_pad, jnp.zeros((Rpad - R, N + WL), dtype)], axis=0)
    tbl_pad = jnp.concatenate(
        [tbl, jnp.zeros((T_NROWS, ncpad - ncells), tbl.dtype)], axis=1)

    b0 = jnp.arange(nblocks, dtype=jnp.int32) * cb
    ws = cell_starts[jnp.minimum(b0, ncells)]
    ws128 = ws // 128
    wend = cell_starts[jnp.minimum(b0 + cb, ncells)]
    win_need = wend - ws128 * 128
    bad = win_need > WL

    def kernel(ws_ref, tbl_ref, rows_ref, out_ref, strip_v, sem):
        b = pl.program_id(0)
        w0 = ws_ref[b] * 128
        cp = pltpu.make_async_copy(rows_ref.at[:, pl.ds(w0, WL)],
                                   strip_v, sem)
        cp.start()
        tblblk = tbl_ref[...]                          # (T_NROWS, cb)
        cp.wait()
        rows = strip_v[...]                            # (Rpad, WL)

        key2 = rows[R_KEY:R_KEY + 1, :]                # (1, WL)
        cells = (b * cb
                 + jax.lax.broadcasted_iota(jnp.int32, (cb, 1), 0)
                 ).astype(dtype)                       # (cb, 1)
        ohT = jnp.where(cells == key2, 1., 0.).astype(dtype)  # (cb, WL)
        # window alignment slop rows belong to OTHER cells' ranges: the
        # one-hot zeroes their products, but their tblrows extraction is
        # 0 → area_c collapses to 1e-30 and w_cell overflows to inf,
        # and inf * 0.0 = NaN THROUGH the matmul.  Mask them hard.
        lo = (b * cb).astype(dtype)
        hi = (b * cb + cb).astype(dtype)
        rowok = jnp.where((key2 >= lo) & (key2 < hi), 1., 0.)

        # per-row static cell data: (T_NROWS, cb) @ (cb, WL) — exact
        # (HIGHEST: the default TPU dot truncates f32 operands to bf16)
        tblrows = jax.lax.dot_general(
            tblblk, ohT, (((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST)       # (T_NROWS, WL)

        w9 = _weights_from_rows(rows, tblrows, cfg, dtype)   # (9, WL)

        area_c = jnp.maximum(tblrows[T_AREA:T_AREA + 1, :], 1e-30)
        Mass = rows[R_MASS:R_MASS + 1, :]
        LWms = rows[R_LWMS:R_LWMS + 1, :]
        u = rows[R_U:R_U + 1, :]
        v = rows[R_V:R_V + 1, :]
        massms = rows[R_MASSMS:R_MASSMS + 1, :] * rowok
        w_cell = massms / area_c
        vals = jnp.concatenate([Mass, LWms, u * LWms, v * LWms], axis=0)
        # (9, 1, WL) * (1, 4, WL) -> (36, WL), row index k*4+f like
        # scatter9_slots' contrib reshape
        P9 = (w9[:, None, :] * vals[None, :, :]).reshape(36, WL)
        Pc = jnp.concatenate(
            [w_cell, w_cell * u, w_cell * v,
             rows[R_VIRT:R_VIRT + 1, :], rows[R_BITS:R_BITS + 1, :],
             rows[R_FLB:R_FLB + 1, :], rows[R_FLBB:R_FLBB + 1, :]],
            axis=0)                                    # (7, WL)
        parts = [P9, Pc]
        if R > R_NFIX:           # Mosaic rejects zero-row slices
            parts.append(rows[R_NFIX:R, :])
        if OUTP > OUT:
            parts.append(jnp.zeros((OUTP - OUT, WL), dtype))
        P = jnp.concatenate(parts, axis=0)

        # contraction over WL: the MXU accumulates k sequentially, so
        # each cell sums its rows in sorted (cell, id) order with exact
        # zero-identity adds for other cells' rows
        out_ref[...] = jax.lax.dot_general(
            P, ohT, (((1,), (1,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST)       # (OUTP, cb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((T_NROWS, cb), lambda b, *_: (0, b)),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((OUTP, cb), lambda b, *_: (0, b)),
        scratch_shapes=[pltpu.VMEM((Rpad, WL), dtype),
                        pltpu.SemaphoreType.DMA],
    )
    S = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((OUTP, ncpad), dtype),
        interpret=interpret,
    )(ws128.astype(jnp.int32), tbl_pad, rows_pad)[:OUT, :ncells]
    return S.T, bad


def segment_spread_sums_p(rows_s, cell_starts, tbl, cfg: IcebergsConfig,
                          n_extra: int, *, cell_block: int = 128,
                          window: int = None, interpret: bool = None):
    """Auto-pipelined twin of :func:`segment_spread_sums` (same sums
    bit-for-bit): the sorted-row window rides a ``pl.Element``-indexed
    input operand so the pipeline emitter double-buffers the DMA across
    cell blocks instead of the manual copy/wait."""
    interpret = _auto_interpret(interpret)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax._src.pallas.core import Element as _Element

    R, N = rows_s.shape
    cb = cell_block
    ncells = tbl.shape[1]
    nblocks = -(-ncells // cb)
    ncpad = nblocks * cb
    if window is None:
        window = auto_window(N, ncells, cb)
    OUT = 36 + 7 + n_extra
    Rpad = -(-R // 8) * 8
    OUTP = -(-OUT // 8) * 8
    WL = -(-(window + 128) // 128) * 128
    dtype = rows_s.dtype

    rows_pad = jnp.concatenate(
        [rows_s, jnp.zeros((R, WL), dtype)
         .at[R_KEY].set(float(ncells))], axis=1)
    rows_pad = jnp.concatenate(
        [rows_pad, jnp.zeros((Rpad - R, N + WL), dtype)], axis=0)
    tbl_pad = jnp.concatenate(
        [tbl, jnp.zeros((T_NROWS, ncpad - ncells), tbl.dtype)], axis=1)

    b0 = jnp.arange(nblocks, dtype=jnp.int32) * cb
    ws = cell_starts[jnp.minimum(b0, ncells)]
    ws128 = ws // 128
    wend = cell_starts[jnp.minimum(b0 + cb, ncells)]
    win_need = wend - ws128 * 128
    bad = win_need > WL

    def kernel(ws_ref, tbl_ref, strip_ref, out_ref):
        b = pl.program_id(0)
        tblblk = tbl_ref[...]                          # (T_NROWS, cb)
        rows = strip_ref[...]                          # (Rpad, WL)

        key2 = rows[R_KEY:R_KEY + 1, :]                # (1, WL)
        cells = (b * cb
                 + jax.lax.broadcasted_iota(jnp.int32, (cb, 1), 0)
                 ).astype(dtype)                       # (cb, 1)
        ohT = jnp.where(cells == key2, 1., 0.).astype(dtype)  # (cb, WL)
        lo = (b * cb).astype(dtype)
        hi = (b * cb + cb).astype(dtype)
        rowok = jnp.where((key2 >= lo) & (key2 < hi), 1., 0.)

        tblrows = jax.lax.dot_general(
            tblblk, ohT, (((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST)       # (T_NROWS, WL)

        w9 = _weights_from_rows(rows, tblrows, cfg, dtype)   # (9, WL)

        area_c = jnp.maximum(tblrows[T_AREA:T_AREA + 1, :], 1e-30)
        Mass = rows[R_MASS:R_MASS + 1, :]
        LWms = rows[R_LWMS:R_LWMS + 1, :]
        u = rows[R_U:R_U + 1, :]
        v = rows[R_V:R_V + 1, :]
        massms = rows[R_MASSMS:R_MASSMS + 1, :] * rowok
        w_cell = massms / area_c
        vals = jnp.concatenate([Mass, LWms, u * LWms, v * LWms], axis=0)
        P9 = (w9[:, None, :] * vals[None, :, :]).reshape(36, WL)
        Pc = jnp.concatenate(
            [w_cell, w_cell * u, w_cell * v,
             rows[R_VIRT:R_VIRT + 1, :], rows[R_BITS:R_BITS + 1, :],
             rows[R_FLB:R_FLB + 1, :], rows[R_FLBB:R_FLBB + 1, :]],
            axis=0)                                    # (7, WL)
        parts = [P9, Pc]
        if R > R_NFIX:
            parts.append(rows[R_NFIX:R, :])
        if OUTP > OUT:
            parts.append(jnp.zeros((OUTP - OUT, WL), dtype))
        P = jnp.concatenate(parts, axis=0)

        out_ref[...] = jax.lax.dot_general(
            P, ohT, (((1,), (1,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST)       # (OUTP, cb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((T_NROWS, cb), lambda b, *_: (0, b)),
                  pl.BlockSpec((_Element(Rpad), _Element(WL)),
                               lambda b, ws: (0, ws[b] * 128))],
        out_specs=pl.BlockSpec((OUTP, cb), lambda b, *_: (0, b)),
    )
    S = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((OUTP, ncpad), dtype),
        interpret=interpret,
    )(ws128.astype(jnp.int32), tbl_pad, rows_pad)[:OUT, :ncells]
    return S.T, bad


def segment_spread_sums_g(rows_s, cell_starts, tbl, cfg: IcebergsConfig,
                          n_extra: int, *, cell_block: int = 128,
                          window: int = None, interpret: bool = None):
    """Gathered-window twin of :func:`segment_spread_sums` (same sums
    bit-for-bit): every cell block's sorted-row window is materialized
    UP FRONT by one tile-granular XLA gather (128-aligned starts make
    each chunk a whole (Rpad, 128) lane tile) and the kernel consumes
    them through the standard double-buffered block pipeline — no
    per-block DMA latency stall, no Element-indexed operands.  Costs an
    (Rpad, nblocks, WL) f32 intermediate in HBM (~1.2 GB at 1M bergs,
    cb=128)."""
    interpret = _auto_interpret(interpret)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, N = rows_s.shape
    cb = cell_block
    ncells = tbl.shape[1]
    nblocks = -(-ncells // cb)
    ncpad = nblocks * cb
    if window is None:
        window = auto_window(N, ncells, cb)
    OUT = 36 + 7 + n_extra
    Rpad = -(-R // 8) * 8
    OUTP = -(-OUT // 8) * 8
    WL = -(-(window + 128) // 128) * 128
    dtype = rows_s.dtype

    rows_pad = jnp.concatenate(
        [rows_s, jnp.zeros((R, WL), dtype)
         .at[R_KEY].set(float(ncells))], axis=1)
    rows_pad = jnp.concatenate(
        [rows_pad, jnp.zeros((Rpad - R, N + WL), dtype)], axis=0)
    tbl_pad = jnp.concatenate(
        [tbl, jnp.zeros((T_NROWS, ncpad - ncells), tbl.dtype)], axis=1)

    b0 = jnp.arange(nblocks, dtype=jnp.int32) * cb
    ws = cell_starts[jnp.minimum(b0, ncells)]
    ws128 = ws // 128
    wend = cell_starts[jnp.minimum(b0 + cb, ncells)]
    win_need = wend - ws128 * 128
    bad = win_need > WL

    # tile-granular window materialization: tile t of block b is
    # lane-tile ws128[b] + t of rows_pad (cell_starts <= N keeps the
    # max tile index within the padded width)
    ntw = WL // 128
    Wt = -(-(N + WL) // 128) * 128
    if Wt > N + WL:
        rows_pad = jnp.concatenate(
            [rows_pad, jnp.zeros((Rpad, Wt - (N + WL)), dtype)], axis=1)
    rowsr = rows_pad.reshape(Rpad, Wt // 128, 128)
    tidx = (ws128.astype(jnp.int32)[:, None]
            + jnp.arange(ntw, dtype=jnp.int32))          # (nb, ntw)
    Wg = jnp.take(rowsr, tidx.reshape(-1), axis=1)
    # block-major (nblocks, Rpad, WL): Mosaic requires the last two
    # BLOCK dims (8, 128)-aligned — a (R, 1, W) block fails to lower
    Wg = jnp.swapaxes(Wg.reshape(Rpad, nblocks, WL), 0, 1)

    def kernel(ws_ref, tbl_ref, strip_ref, out_ref):
        b = pl.program_id(0)
        tblblk = tbl_ref[...]                          # (T_NROWS, cb)
        rows = strip_ref[0, :, :]                      # (Rpad, WL)

        key2 = rows[R_KEY:R_KEY + 1, :]                # (1, WL)
        cells = (b * cb
                 + jax.lax.broadcasted_iota(jnp.int32, (cb, 1), 0)
                 ).astype(dtype)                       # (cb, 1)
        ohT = jnp.where(cells == key2, 1., 0.).astype(dtype)  # (cb, WL)
        lo = (b * cb).astype(dtype)
        hi = (b * cb + cb).astype(dtype)
        rowok = jnp.where((key2 >= lo) & (key2 < hi), 1., 0.)

        tblrows = jax.lax.dot_general(
            tblblk, ohT, (((1,), (0,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST)       # (T_NROWS, WL)

        w9 = _weights_from_rows(rows, tblrows, cfg, dtype)   # (9, WL)

        area_c = jnp.maximum(tblrows[T_AREA:T_AREA + 1, :], 1e-30)
        Mass = rows[R_MASS:R_MASS + 1, :]
        LWms = rows[R_LWMS:R_LWMS + 1, :]
        u = rows[R_U:R_U + 1, :]
        v = rows[R_V:R_V + 1, :]
        massms = rows[R_MASSMS:R_MASSMS + 1, :] * rowok
        w_cell = massms / area_c
        vals = jnp.concatenate([Mass, LWms, u * LWms, v * LWms], axis=0)
        P9 = (w9[:, None, :] * vals[None, :, :]).reshape(36, WL)
        Pc = jnp.concatenate(
            [w_cell, w_cell * u, w_cell * v,
             rows[R_VIRT:R_VIRT + 1, :], rows[R_BITS:R_BITS + 1, :],
             rows[R_FLB:R_FLB + 1, :], rows[R_FLBB:R_FLBB + 1, :]],
            axis=0)                                    # (7, WL)
        parts = [P9, Pc]
        if R > R_NFIX:
            parts.append(rows[R_NFIX:R, :])
        if OUTP > OUT:
            parts.append(jnp.zeros((OUTP - OUT, WL), dtype))
        P = jnp.concatenate(parts, axis=0)

        out_ref[...] = jax.lax.dot_general(
            P, ohT, (((1,), (1,)), ((), ())),
            preferred_element_type=dtype,
            precision=jax.lax.Precision.HIGHEST)       # (OUTP, cb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((T_NROWS, cb), lambda b, *_: (0, b)),
                  pl.BlockSpec((1, Rpad, WL), lambda b, *_: (b, 0, 0))],
        out_specs=pl.BlockSpec((OUTP, cb), lambda b, *_: (0, b)),
    )
    S = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((OUTP, ncpad), dtype),
        interpret=interpret,
    )(ws128.astype(jnp.int32), tbl_pad, Wg)[:OUT, :ncells]
    return S.T, bad


def build_rows(st, grid, frc, cfg: IcebergsConfig, extra_cols,
               key_alive=None):
    """The UNSORTED payload stack + sort keys for the spread kernel.

    Mirrors the column definitions of create_gridded_icebergs_fields /
    calculate_mass_on_ocean (ops/spread.py): 4 spread values (mass,
    area, U, V momenta), the 7 per-cell diagnostic columns' inputs, and
    ``extra_cols`` pass-through (thermo's deferred melt columns).

    ``key_alive``: aliveness for the SORT key (pre-thermo — rows that
    died during thermo keep their cell so their melt still lands;
    matches _origin_frame_ranks' semantics); value columns mask with
    the CURRENT st.alive.
    """
    from .spread import berg_spread_mass
    from .thermo import fl_bits_dimensions

    nx = grid.nx
    alive = st.alive
    if key_alive is None:
        key_alive = alive
    key = jnp.where(key_alive, st.jne * nx + st.ine, grid.nx * grid.ny)
    af = alive.astype(st.lon.dtype)

    L, W, T = st.length, st.width, st.thickness
    Area = L * W
    Mass = jnp.where(alive, berg_spread_mass(st, grid, frc, cfg), 0.)
    LWms = Area * st.mass_scaling * af
    massms = st.mass * st.mass_scaling * af

    I, J = st.ine + 1, st.jne + 1
    area_c = jnp.maximum(grid.area[I, J], 1e-30)
    if cfg.bergy_bit_erosion_fraction > 0.:
        Lbits = jnp.maximum(jnp.minimum(jnp.minimum(L, W),
                                        jnp.minimum(T, 40.)), 1e-30)
        Abits = (st.mass_of_bits / cfg.rho_bergs) / Lbits
    else:
        Abits = jnp.zeros_like(L)
    if cfg.fl_style == 'fl_bits':
        Lfl, Wfl, Tfl = fl_bits_dimensions(cfg, T)
        Abits_fl = (st.mass_of_fl_bits / cfg.rho_bergs) \
            / jnp.maximum(Tfl, 1e-30)
        if cfg.bergy_bit_erosion_fraction > 0.:
            Lb2 = jnp.maximum(jnp.minimum(jnp.minimum(Lfl, Wfl),
                                          jnp.minimum(Tfl, 40.)), 1e-30)
            Abits_flb = (st.mass_of_fl_bergy_bits / cfg.rho_bergs) / Lb2
        else:
            Abits_flb = jnp.zeros_like(L)
    else:
        Abits_fl = jnp.zeros_like(L)
        Abits_flb = jnp.zeros_like(L)
    virt = (W * L + Abits + Abits_fl + Abits_flb) * st.mass_scaling * af
    w_cell_grid = jnp.where(alive, st.mass_scaling / area_c, 0.)
    bits = (st.mass_of_bits + st.mass_of_fl_bergy_bits) * w_cell_grid
    flb = st.mass_of_fl_bits * w_cell_grid
    flbb = st.mass_of_fl_bergy_bits * w_cell_grid

    rows = [key.astype(st.lon.dtype), st.xi, st.yj, Area, Mass, LWms,
            st.uvel, st.vvel, massms, virt, bits, flb, flbb] \
        + [jnp.asarray(c) for c in (extra_cols or [])]
    return key, rows


def sort_rows(key, st, rows):
    """One (cell, id)-keyed sort carrying every payload row (~0.5 ms per
    row at 1M vs ~6-10 ms per permutation gather).  Returns
    (key_s, rows_s stacked (R, N), cell_starts-ready key_s)."""
    out = jax.lax.sort((key.astype(jnp.int32), st.id_cnt, st.id_ij,
                        *rows), num_keys=3)
    key_s = out[0]
    rows_s = jnp.stack(out[3:], axis=0)
    return key_s, rows_s


def spread_cell_sums(st, grid, frc, cfg: IcebergsConfig, extra_cols,
                     *, key_alive=None, presorted: bool = False,
                     cell_starts=None, cell_block: int = 128,
                     window: int = None, interpret: bool = None):
    """End-to-end kernel path: build rows -> payload sort -> kernel.

    ``presorted=True``: the state slab is already physically (cell, id)
    sorted for ``key_alive`` rows (the persistent-layout step), so the
    payload sort is skipped — rows stack directly.  Rows that died
    AFTER the sort (key_alive True, st.alive False) stay in place; only
    their sort key must still be their cell, which ``key_alive``
    guarantees.

    Returns (S (ncells, 43+n_extra), nbad, key_s, rows_s).  The caller
    checks nbad and falls back (lax.cond) for overflowing runs using
    key_s/rows_s (already sorted — no extra gathers).
    """
    interpret = _auto_interpret(interpret)
    ncells = grid.nx * grid.ny
    key, rows = build_rows(st, grid, frc, cfg, extra_cols,
                           key_alive=key_alive)
    if presorted:
        key_s = key.astype(jnp.int32)
        rows_s = jnp.stack(rows, axis=0)
    else:
        key_s, rows_s = sort_rows(key, st, rows)
        cell_starts = None
    if cell_starts is not None:
        # the persistent step's carried offsets (same key, same
        # aliveness) — skip the 262k-query searchsorted
        starts = cell_starts.astype(jnp.int32)
    else:
        starts = jnp.searchsorted(
            key_s, jnp.arange(ncells + 1, dtype=key_s.dtype)).astype(
            jnp.int32)
    tbl = cell_tables(grid)
    seg = (segment_spread_sums_g if cfg.spread_impl == "gathered"
           else segment_spread_sums_p if cfg.spread_impl == "pipelined"
           else segment_spread_sums)
    S, bad = seg(
        rows_s, starts, tbl, cfg, len(extra_cols or []),
        cell_block=cell_block, window=window, interpret=interpret)
    return S, jnp.sum(bad.astype(jnp.int32)), key_s, rows_s, starts
