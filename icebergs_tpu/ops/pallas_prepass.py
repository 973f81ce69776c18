"""Fused contact-search prepass over the cell-sorted slab (Pallas).

The legacy interactive force (``interactive_force`` + ``calculate_force``,
/root/reference/src/icebergs.F90:479-804) engages only bergs within
``crit = max(R1+R2, contact_distance)`` of each other — a few percent at
production densities.  The expensive part on TPU is the *search*: the XLA
path gathers ~50 candidate rows per berg from HBM (random access, slow);
this kernel instead streams the cell-sorted slab through VMEM in three
contiguous row strips (grid rows j-1, j, j+1 of each block's cell range)
and does a dense distance test — contiguous DMA + VPU compares, no
gathers.

Output per berg: engaged-candidate count and the min/max engaged partner
slot.  Bergs with count <= 2 have their full partner set in {pmin, pmax};
the (rare) count >= 3 bergs and any block whose strip exceeds the static
window are flagged for an exact XLA fallback pass, so the wrapped search
is exact, not a truncation (cf. round-1 MAX_PER_CELL dropping).

Precondition (same as the quadrant window): the largest pair cutoff must
not exceed the smallest cell extent, so distance-engagement implies the
3x3-cell window.  ``can_use_quadrant_window`` checks exactly this.

The engagement test uses r^2 <= crit^2 * (1+1e-6): a strict superset of
the XLA path's sqrt-based test under f32 rounding.  Spurious extras are
re-masked by ``precompute_pair_data`` on the compacted pairs, so parity
is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import IcebergsConfig
from ..constants import PI_180
from . import forces as _forces
from .pallas_pack import _auto_interpret

# Extraction-kernel window-feed selection lives in IcebergsConfig
# (``extract_impl``): "gathered" (production default — materialize
# window strips by a tile-granular XLA gather up front; same-window
# floor-subtracted A/B on v5e measured 9.6 ms vs 25.1 ms for the
# manual-DMA kernel at bn128_w288/1M, at the cost of one gathered
# window buffer ~768 MB), "manual" (explicit copy/wait DMAs), or
# "pipelined" (Element-indexed operands).  Bit-identical outputs.

# packed feature columns: lon_old, lat_old, radius, fl_k, alive, key
_F_LON, _F_LAT, _F_RAD, _F_FLK, _F_ALIVE, _F_KEY = range(6)
_NFEAT = 8           # sublane tile (f32) for the transposed window matrix
_FPAD = 128          # lane tile for the per-block rows matrix


def _pack(st, grid, cfg):
    dtype = st.lon.dtype
    alive = st.alive.astype(dtype)
    A = st.length * st.width
    R = _forces._interaction_radius(cfg, A)
    key = jnp.where(st.alive, st.jne * grid.nx + st.ine,
                    grid.nx * grid.ny).astype(dtype)
    P = jnp.stack([st.lon_old, st.lat_old, R, st.fl_k, alive, key,
                   jnp.zeros_like(alive), jnp.zeros_like(alive)], axis=-1)
    return P


def contact_prepass_sorted(st_sorted, cell_starts, grid,
                           cfg: IcebergsConfig, *, block_n: int = 256,
                           window: int = 512, interpret: bool = None,
                           P=None, key=None, radius: int = 1,
                           exclude_same_group: bool = False):
    """Engaged-contact search on a cell-sorted state.

    Returns ``(cnt, pmin, pmax, bad_block)`` where for each slot i of the
    sorted slab: ``cnt[i]`` counts engaged candidates (distance superset),
    ``pmin/pmax[i]`` are the smallest/largest engaged partner slots, and
    ``bad_block[i]`` is True when slot i's block could not be searched
    exactly (strip window overflow or block cell-span > nx-(2*radius+1))
    and must go through the XLA fallback.

    ``P``/``key`` let the sortless fused path pass pre-gathered packed
    features and cell keys directly instead of a physically sorted state
    (``st_sorted`` is then only consulted for capacity/dtype).

    ``radius`` widens the candidate window to (2*radius+1)^2 cells (the
    reference's contact_cells for contact_distance > a cell,
    icebergs_framework.F90:1493-1527).  ``exclude_same_group`` filters
    candidates whose group id (packed feature column 6) equals the
    berg's own — the MTS Part-1 cross-conglomerate collision search
    (interactive_force's conglomerate filter, icebergs.F90:565-607).
    """
    interpret = _auto_interpret(interpret)
    N = st_sorted.capacity if st_sorted is not None else P.shape[0]
    BN, W = block_n, window
    nblocks = -(-N // BN)            # ceil: last block zero-padded
    Npad = nblocks * BN
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    nstrips = 2 * radius + 1

    if P is None:
        P = _pack(st_sorted, grid, cfg)
    dtype = P.dtype
    Ppad = jnp.concatenate(
        [P, jnp.zeros((Npad - N + W, _NFEAT), dtype)], axis=0)
    # rows matrix: lane-dim padded to 128; window strips are ROW slices
    # of this matrix (sublane granularity: starts align to 8, so the
    # alignment slop is <= 7 rows — the lane-aligned strip layout wasted
    # up to 127 window rows, a third of the compute at W=384)
    Prows = jnp.pad(Ppad, ((0, 0), (0, _FPAD - _NFEAT)))
    PT = Ppad.T                      # (8, Npad+W): per-block self rows

    if key is None:
        key = jnp.where(st_sorted.alive,
                        st_sorted.jne * nx + st_sorted.ine, ncells)
    key = jnp.concatenate(
        [key, jnp.full((Npad - N,), ncells, key.dtype)])
    c0 = key[::BN]
    c1 = key[BN - 1::BN]
    c1c = jnp.minimum(c1, ncells - 1)            # all-dead block -> c1c<c0
    span_bad = (c1c - c0) > (nx - nstrips)

    # inclusive cell ranges of the strips (grid rows j-radius..j+radius)
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.int32) * nx
    c_lo = jnp.clip(c0[:, None] - radius + offs[None, :], 0, ncells - 1)
    c_hi = jnp.clip(c1c[:, None] + radius + offs[None, :], -1, ncells - 1)
    ws = cell_starts[c_lo]
    ws8 = ws // 8
    win_need = cell_starts[c_hi + 1] - ws8 * 8
    win_bad = jnp.any(win_need > W, axis=1)
    bad = span_bad | win_bad

    slack = 1. + 1e-6
    cd = float(cfg.contact_distance)
    if cfg.grid_is_latlon:
        rearth = float(cfg.Rearth)
    BIG = float(2 * N)

    def kernel(ws_ref, clo_ref, chi_ref, PT_ref, PR_ref, out_ref,
               rows_v, win_v, sem, wsem):
        # NOTE: the scalar-prefetch refs are 1-D (nblocks*3,) — SMEM pads
        # the minor dim of 2-D scalar operands to 128 lanes, which blows
        # the 1 MB SMEM budget at 1M bergs (3907 blocks -> 2 MB each).
        # Compute orientation: window candidates on SUBLANES (W, 1),
        # block self-rows on LANES (1, BN) — both operands slice natively
        # from their DMA layouts, no in-kernel transposes.
        b = pl.program_id(0)
        cp_rows = pltpu.make_async_copy(
            PT_ref.at[:, pl.ds(b * BN, BN)], rows_v, sem)
        cp_rows.start()
        # prefetch ALL window strips up front so the DMAs overlap
        wcps = []
        for s in range(nstrips):
            ws_s = ws_ref[b * nstrips + s] * 8
            cp = pltpu.make_async_copy(
                PR_ref.at[pl.ds(ws_s, W), :], win_v.at[s], wsem.at[s])
            cp.start()
            wcps.append(cp)
        cp_rows.wait()
        rows = rows_v[...]               # (8, BN)
        lon1 = rows[_F_LON:_F_LON + 1, :]
        lat1 = rows[_F_LAT:_F_LAT + 1, :]
        R1 = rows[_F_RAD:_F_RAD + 1, :]
        fl1 = rows[_F_FLK:_F_FLK + 1, :]
        al1 = rows[_F_ALIVE:_F_ALIVE + 1, :]

        gid = b * BN + jax.lax.broadcasted_iota(jnp.int32, (1, BN), 1)
        if exclude_same_group:
            grp1 = rows[6:7, :]                  # feature column 6
        rowi = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)

        cnt = jnp.zeros((BN,), dtype)
        vmin = jnp.full((BN,), BIG, dtype)
        vmax = jnp.full((BN,), -1., dtype)

        for s in range(nstrips):
            ws_s = ws_ref[b * nstrips + s] * 8
            wcps[s].wait()
            win = win_v[s]               # (W, 128)
            lon2 = win[:, _F_LON:_F_LON + 1]
            lat2 = win[:, _F_LAT:_F_LAT + 1]
            R2 = win[:, _F_RAD:_F_RAD + 1]
            fl2 = win[:, _F_FLK:_F_FLK + 1]
            al2 = win[:, _F_ALIVE:_F_ALIVE + 1]
            key2 = win[:, _F_KEY:_F_KEY + 1]

            clo = clo_ref[b * nstrips + s].astype(dtype)
            chi = chi_ref[b * nstrips + s].astype(dtype)
            wid = ws_s + rowi            # (W, 1)
            valid = ((key2 >= clo) & (key2 <= chi) & (al2 > 0.5)
                     & (al1 > 0.5) & (wid != gid)
                     & (fl1 != -1.) & (fl2 != -1.))
            if exclude_same_group:
                valid = valid & (win[:, 6:7] != grp1)

            if cfg.grid_is_latlon:
                lat_ref = 0.5 * (lat1 + lat2)
                dx_dlon = PI_180 * rearth * jnp.cos(PI_180 * lat_ref)
                rx = (lon1 - lon2) * dx_dlon
                ry = (lat1 - lat2) * (PI_180 * rearth)
            else:
                rx = lon1 - lon2
                ry = lat1 - lat2
            r2 = rx * rx + ry * ry
            crit = jnp.maximum(R1 + R2, cd)
            engaged = valid & (r2 > 0.) & (r2 <= crit * crit * slack)

            cnt = cnt + jnp.sum(jnp.where(engaged, 1., 0.),
                                axis=0, dtype=dtype)
            widf = wid.astype(dtype)
            vmin = jnp.minimum(vmin, jnp.min(
                jnp.where(engaged, widf, BIG), axis=0))
            vmax = jnp.maximum(vmax, jnp.max(
                jnp.where(engaged, widf, -1.), axis=0))

        out_ref[...] = jnp.stack(
            [cnt, vmin, vmax, jnp.zeros_like(cnt)], axis=-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BN, 4), lambda b, *_: (b, 0)),
        scratch_shapes=[pltpu.VMEM((_NFEAT, BN), dtype),
                        pltpu.VMEM((nstrips, W, _FPAD), dtype),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA((nstrips,))],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Npad, 4), dtype),
        interpret=interpret,
    )(ws8.astype(jnp.int32).reshape(-1),
      c_lo.astype(jnp.int32).reshape(-1),
      c_hi.astype(jnp.int32).reshape(-1), PT, Prows)[:N]

    cnt = out[:, 0].astype(jnp.int32)
    pmin = jnp.where(out[:, 1] >= BIG, -1, out[:, 1]).astype(jnp.int32)
    pmax = jnp.where(out[:, 2] < 0., -1, out[:, 2]).astype(jnp.int32)
    bad_block = jnp.repeat(bad, BN, total_repeat_length=Npad)[:N]
    return cnt, pmin, pmax, bad_block


# ---------------------------------------------------------------------------
# Merged search + partner-feature extraction (round-3 kernel)
# ---------------------------------------------------------------------------

# PT feature rows.  0-5 are the EVAL features extracted for each partner
# (the selection matmul lhs is the contiguous 8-row sublane tile 0..7;
# rows 6-7 are spares), 8+ are engagement-only.  AREA = length*width:
# the pair eval only consumes the product (A2 -> R2, M_min), so one row
# replaces separate length/width and the origin-frame inverse mapping
# shrinks by two rows per partner.  fl_k is engagement-only: the
# kernel's valid mask already excludes fl_k == -1 on both sides
# (icebergs.F90:514, 652), so extracted partners never need re-masking.
PT_LON, PT_LAT, PT_U, PT_V, PT_AREA, PT_MASS = range(6)
PT_RAD, PT_ALIVE, PT_KEY, PT_GRP, PT_FLK = 8, 9, 10, 11, 12
PT_NF = 16                    # sublane-tile padded row count
PT_NEVAL = 6                  # meaningful extracted rows per partner

# output rows of contact_extract_sorted
EX_CNT, EX_VMIN, EX_VMAX = 0, 1, 2
EX_F1 = 4                     # rows 4..9: partner-1 eval features
EX_F2 = 12                    # rows 12..17: partner-2 eval features
EX_NOUT = 24
# epilogue-mode rows (contact_extract_sorted_g(epilogue=True)): the
# velocity-independent pair precompute runs IN the kernel, so rows
# F1/F2 carry (u, v, P11, P12, P22, mm, exact) per partner and the
# spring-accel sums come out pre-reduced
EX_IAX, EX_IAY = 3, 20
EX_EPI_NP = 7                 # per-partner epilogue rows


def contact_extract_sorted(PT, key_s, cell_starts, grid,
                           cfg: IcebergsConfig, *, block_n: int = 256,
                           window: int = 512, interpret: bool = None,
                           radius: int = 1,
                           exclude_same_group: bool = False):
    """Contact search + in-kernel partner-feature extraction.

    One Pallas pass over the cell-sorted transposed feature matrix ``PT``
    ((PT_NF, Npad) — minor dim N so nothing tile-pads; a (N, F<=128) f32
    layout costs N*512 bytes of HBM regardless of F) that returns, per
    sorted slot, the engaged-candidate count, min/max engaged partner
    slots AND the 8 eval features of those two partners — extracted on
    the MXU with selection matmuls (engaged&(wid==vmin) as a 0/1 matrix
    against the window's feature rows), so the XLA side needs NO partner
    gathers at all for the <=2-candidate majority.

    Returns ``(out, bad_block)`` with ``out`` of shape (EX_NOUT, N): rows
    EX_CNT/EX_VMIN/EX_VMAX and EX_F1+0..5 / EX_F2+0..5 per the PT_* eval
    order (lon, lat, u, v, area, mass; rows +6/+7 are spares).
    Extraction sums are exact: each selection product is 1.0*feature or
    0.0.

    Window DMAs slice the LANE dim at 128-aligned starts; the <=127
    rows of slop ahead of each strip carry keys below the strip's cell
    range and are killed by the existing key-range mask.
    """
    interpret = _auto_interpret(interpret)
    N = PT.shape[1]
    BN = block_n
    # +128 lane-aligned start slop, rounded up to a lane-tile multiple
    # (Mosaic memref_slice requires 128-multiple lane extents)
    WL = -(-(window + 128) // 128) * 128
    nblocks = -(-N // BN)
    Npad = nblocks * BN
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    nstrips = 2 * radius + 1
    dtype = PT.dtype

    PTpad = jnp.concatenate(
        [PT, jnp.zeros((PT_NF, Npad - N + WL), dtype)], axis=1)
    key = jnp.concatenate(
        [key_s, jnp.full((Npad - N,), ncells, key_s.dtype)])
    c0 = key[::BN]
    c1 = key[BN - 1::BN]
    c1c = jnp.minimum(c1, ncells - 1)
    span_bad = (c1c - c0) > (nx - nstrips)

    offs = jnp.arange(-radius, radius + 1, dtype=jnp.int32) * nx
    c_lo = jnp.clip(c0[:, None] - radius + offs[None, :], 0, ncells - 1)
    c_hi = jnp.clip(c1c[:, None] + radius + offs[None, :], -1, ncells - 1)
    ws = cell_starts[c_lo]
    ws128 = ws // 128
    win_need = cell_starts[c_hi + 1] - ws128 * 128
    win_bad = jnp.any(win_need > WL, axis=1)
    bad = span_bad | win_bad

    slack = 1. + 1e-6
    cd = float(cfg.contact_distance)
    if cfg.grid_is_latlon:
        rearth = float(cfg.Rearth)
    BIG = float(2 * N)

    def kernel(ws_ref, clo_ref, chi_ref, PT_ref, out_ref, self_v,
               win_v, sem, wsem):
        b = pl.program_id(0)
        cp_self = pltpu.make_async_copy(
            PT_ref.at[:, pl.ds(b * BN, BN)], self_v, sem)
        cp_self.start()
        wcps = []
        for s in range(nstrips):
            w0 = ws_ref[b * nstrips + s] * 128
            cp = pltpu.make_async_copy(
                PT_ref.at[:, pl.ds(w0, WL)], win_v.at[s], wsem.at[s])
            cp.start()
            wcps.append(cp)
        cp_self.wait()
        rows = self_v[...]                    # (PT_NF, BN)
        lon1 = rows[PT_LON:PT_LON + 1, :]
        lat1 = rows[PT_LAT:PT_LAT + 1, :]
        R1 = rows[PT_RAD:PT_RAD + 1, :]
        fl1 = rows[PT_FLK:PT_FLK + 1, :]
        al1 = rows[PT_ALIVE:PT_ALIVE + 1, :]
        if exclude_same_group:
            grp1 = rows[PT_GRP:PT_GRP + 1, :]

        gid = b * BN + jax.lax.broadcasted_iota(jnp.int32, (1, BN), 1)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (WL, 1), 0)

        cnt = jnp.zeros((1, BN), dtype)
        vmin = jnp.full((1, BN), BIG, dtype)
        vmax = jnp.full((1, BN), -1., dtype)
        f1 = jnp.zeros((8, BN), dtype)
        f2 = jnp.zeros((8, BN), dtype)

        for s in range(nstrips):
            w0 = ws_ref[b * nstrips + s] * 128
            wcps[s].wait()
            win = win_v[s]                    # (PT_NF, WL)
            winT = win.T                      # (WL, PT_NF)
            lon2 = winT[:, PT_LON:PT_LON + 1]
            lat2 = winT[:, PT_LAT:PT_LAT + 1]
            R2 = winT[:, PT_RAD:PT_RAD + 1]
            fl2 = winT[:, PT_FLK:PT_FLK + 1]
            al2 = winT[:, PT_ALIVE:PT_ALIVE + 1]
            key2 = winT[:, PT_KEY:PT_KEY + 1]

            clo = clo_ref[b * nstrips + s].astype(dtype)
            chi = chi_ref[b * nstrips + s].astype(dtype)
            wid = w0 + rowi                   # (WL, 1)
            valid = ((key2 >= clo) & (key2 <= chi) & (al2 > 0.5)
                     & (al1 > 0.5) & (wid != gid)
                     & (fl1 != -1.) & (fl2 != -1.))
            if exclude_same_group:
                valid = valid & (winT[:, PT_GRP:PT_GRP + 1] != grp1)

            if cfg.grid_is_latlon:
                lat_ref_ = 0.5 * (lat1 + lat2)
                dx_dlon = PI_180 * rearth * jnp.cos(PI_180 * lat_ref_)
                rx = (lon1 - lon2) * dx_dlon
                ry = (lat1 - lat2) * (PI_180 * rearth)
            else:
                rx = lon1 - lon2
                ry = lat1 - lat2
            r2 = rx * rx + ry * ry
            crit = jnp.maximum(R1 + R2, cd)
            engaged = valid & (r2 > 0.) & (r2 <= crit * crit * slack)
            engf = jnp.where(engaged, 1., 0.).astype(dtype)   # (WL, BN)

            cnt = cnt + jnp.sum(engf, axis=0, keepdims=True)
            widf = wid.astype(dtype)
            lmin = jnp.min(jnp.where(engaged, widf, BIG), axis=0,
                           keepdims=True)                     # (1, BN)
            lmax = jnp.max(jnp.where(engaged, widf, -1.), axis=0,
                           keepdims=True)

            feats = win[0:8, :]                               # (8, WL)
            e1 = engf * jnp.where(widf == lmin, 1., 0.)
            e2 = engf * jnp.where(widf == lmax, 1., 0.)
            # Precision.HIGHEST is REQUIRED for exactness: Mosaic's
            # default dot truncates f32 operands to bf16 (measured
            # 2e-3 rel error on selection matmuls — km-scale position
            # error at 1e6-m coordinates)
            f1s = jax.lax.dot_general(
                feats, e1, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST)          # (8, BN)
            f2s = jax.lax.dot_general(
                feats, e2, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST)
            take1 = lmin < vmin
            take2 = lmax > vmax
            f1 = jnp.where(take1, f1s, f1)
            f2 = jnp.where(take2, f2s, f2)
            vmin = jnp.minimum(vmin, lmin)
            vmax = jnp.maximum(vmax, lmax)

        pad = jnp.zeros((1, BN), dtype)
        out_ref[...] = jnp.concatenate(
            [cnt, vmin, vmax, pad, f1, f2,
             jnp.zeros((EX_NOUT - 20, BN), dtype)], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((EX_NOUT, BN), lambda b, *_: (0, b)),
        scratch_shapes=[pltpu.VMEM((PT_NF, BN), dtype),
                        pltpu.VMEM((nstrips, PT_NF, WL), dtype),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA((nstrips,))],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((EX_NOUT, Npad), dtype),
        interpret=interpret,
    )(ws128.astype(jnp.int32).reshape(-1),
      c_lo.astype(jnp.int32).reshape(-1),
      c_hi.astype(jnp.int32).reshape(-1), PTpad)[:, :N]

    bad_block = jnp.repeat(bad, BN, total_repeat_length=Npad)[:N]
    return out, bad_block


def contact_extract_sorted_p(PT, key_s, cell_starts, grid,
                             cfg: IcebergsConfig, *, block_n: int = 128,
                             window: int = 288, interpret: bool = None,
                             radius: int = 1,
                             exclude_same_group: bool = False):
    """Auto-pipelined twin of :func:`contact_extract_sorted`.

    Same outputs bit-for-bit; the window strips are ``pl.Element``-indexed
    input operands (element starts from the scalar-prefetch table), so
    Pallas's pipeline emitter double-buffers every DMA across grid steps
    instead of the manual copy/wait (which exposed the full HBM latency
    of ~100 KB per block, ~7.8k blocks at 1M bergs).
    """
    interpret = _auto_interpret(interpret)
    from jax._src.pallas.core import Element as _Element

    N = PT.shape[1]
    BN = block_n
    WL = -(-(window + 128) // 128) * 128
    nblocks = -(-N // BN)
    Npad = nblocks * BN
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    nstrips = 2 * radius + 1
    dtype = PT.dtype

    PTpad = jnp.concatenate(
        [PT, jnp.zeros((PT_NF, Npad - N + WL), dtype)], axis=1)
    key = jnp.concatenate(
        [key_s, jnp.full((Npad - N,), ncells, key_s.dtype)])
    c0 = key[::BN]
    c1 = key[BN - 1::BN]
    c1c = jnp.minimum(c1, ncells - 1)
    span_bad = (c1c - c0) > (nx - nstrips)

    offs = jnp.arange(-radius, radius + 1, dtype=jnp.int32) * nx
    c_lo = jnp.clip(c0[:, None] - radius + offs[None, :], 0, ncells - 1)
    c_hi = jnp.clip(c1c[:, None] + radius + offs[None, :], -1, ncells - 1)
    ws = cell_starts[c_lo]
    ws128 = ws // 128
    win_need = cell_starts[c_hi + 1] - ws128 * 128
    win_bad = jnp.any(win_need > WL, axis=1)
    bad = span_bad | win_bad

    slack = 1. + 1e-6
    cd = float(cfg.contact_distance)
    if cfg.grid_is_latlon:
        rearth = float(cfg.Rearth)
    BIG = float(2 * N)

    def kernel(ws_ref, clo_ref, chi_ref, self_ref, *win_refs_and_out):
        win_refs = win_refs_and_out[:nstrips]
        out_ref = win_refs_and_out[nstrips]
        b = pl.program_id(0)
        rows = self_ref[...]                  # (PT_NF, BN)
        lon1 = rows[PT_LON:PT_LON + 1, :]
        lat1 = rows[PT_LAT:PT_LAT + 1, :]
        R1 = rows[PT_RAD:PT_RAD + 1, :]
        fl1 = rows[PT_FLK:PT_FLK + 1, :]
        al1 = rows[PT_ALIVE:PT_ALIVE + 1, :]
        if exclude_same_group:
            grp1 = rows[PT_GRP:PT_GRP + 1, :]

        gid = b * BN + jax.lax.broadcasted_iota(jnp.int32, (1, BN), 1)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (WL, 1), 0)

        cnt = jnp.zeros((1, BN), dtype)
        vmin = jnp.full((1, BN), BIG, dtype)
        vmax = jnp.full((1, BN), -1., dtype)
        f1 = jnp.zeros((8, BN), dtype)
        f2 = jnp.zeros((8, BN), dtype)

        for s in range(nstrips):
            w0 = ws_ref[b * nstrips + s] * 128
            win = win_refs[s][...]            # (PT_NF, WL)
            winT = win.T                      # (WL, PT_NF)
            lon2 = winT[:, PT_LON:PT_LON + 1]
            lat2 = winT[:, PT_LAT:PT_LAT + 1]
            R2 = winT[:, PT_RAD:PT_RAD + 1]
            fl2 = winT[:, PT_FLK:PT_FLK + 1]
            al2 = winT[:, PT_ALIVE:PT_ALIVE + 1]
            key2 = winT[:, PT_KEY:PT_KEY + 1]

            clo = clo_ref[b * nstrips + s].astype(dtype)
            chi = chi_ref[b * nstrips + s].astype(dtype)
            wid = w0 + rowi                   # (WL, 1)
            valid = ((key2 >= clo) & (key2 <= chi) & (al2 > 0.5)
                     & (al1 > 0.5) & (wid != gid)
                     & (fl1 != -1.) & (fl2 != -1.))
            if exclude_same_group:
                valid = valid & (winT[:, PT_GRP:PT_GRP + 1] != grp1)

            if cfg.grid_is_latlon:
                lat_ref_ = 0.5 * (lat1 + lat2)
                dx_dlon = PI_180 * rearth * jnp.cos(PI_180 * lat_ref_)
                rx = (lon1 - lon2) * dx_dlon
                ry = (lat1 - lat2) * (PI_180 * rearth)
            else:
                rx = lon1 - lon2
                ry = lat1 - lat2
            r2 = rx * rx + ry * ry
            crit = jnp.maximum(R1 + R2, cd)
            engaged = valid & (r2 > 0.) & (r2 <= crit * crit * slack)
            engf = jnp.where(engaged, 1., 0.).astype(dtype)   # (WL, BN)

            cnt = cnt + jnp.sum(engf, axis=0, keepdims=True)
            widf = wid.astype(dtype)
            lmin = jnp.min(jnp.where(engaged, widf, BIG), axis=0,
                           keepdims=True)                     # (1, BN)
            lmax = jnp.max(jnp.where(engaged, widf, -1.), axis=0,
                           keepdims=True)

            feats = win[0:8, :]                               # (8, WL)
            e1 = engf * jnp.where(widf == lmin, 1., 0.)
            e2 = engf * jnp.where(widf == lmax, 1., 0.)
            # Precision.HIGHEST is REQUIRED for exactness (Mosaic's
            # default dot truncates f32 operands to bf16)
            f1s = jax.lax.dot_general(
                feats, e1, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST)          # (8, BN)
            f2s = jax.lax.dot_general(
                feats, e2, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST)
            take1 = lmin < vmin
            take2 = lmax > vmax
            f1 = jnp.where(take1, f1s, f1)
            f2 = jnp.where(take2, f2s, f2)
            vmin = jnp.minimum(vmin, lmin)
            vmax = jnp.maximum(vmax, lmax)

        pad = jnp.zeros((1, BN), dtype)
        out_ref[...] = jnp.concatenate(
            [cnt, vmin, vmax, pad, f1, f2,
             jnp.zeros((EX_NOUT - 20, BN), dtype)], axis=0)

    def strip_spec(s):
        return pl.BlockSpec(
            (_Element(PT_NF), _Element(WL)),
            lambda b, ws, clo, chi, s=s: (0, ws[b * nstrips + s] * 128))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((PT_NF, BN), lambda b, *_: (0, b))]
        + [strip_spec(s) for s in range(nstrips)],
        out_specs=pl.BlockSpec((EX_NOUT, BN), lambda b, *_: (0, b)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((EX_NOUT, Npad), dtype),
        interpret=interpret,
    )(ws128.astype(jnp.int32).reshape(-1),
      c_lo.astype(jnp.int32).reshape(-1),
      c_hi.astype(jnp.int32).reshape(-1), PTpad,
      *([PTpad] * nstrips))[:, :N]

    bad_block = jnp.repeat(bad, BN, total_repeat_length=Npad)[:N]
    return out, bad_block


def contact_extract_sorted_g(PT, key_s, cell_starts, grid,
                             cfg: IcebergsConfig, *, block_n: int = 128,
                             window: int = 288, interpret: bool = None,
                             radius: int = 1,
                             exclude_same_group: bool = False,
                             epilogue: bool = False):
    """Gathered-window twin of :func:`contact_extract_sorted`.

    Same outputs bit-for-bit.  Instead of in-kernel window DMAs (manual
    copy/wait exposes full HBM latency per block; Element-indexed
    operands depend on Mosaic's emitter handling dynamic starts), every
    block's three strip windows are materialized UP FRONT by one
    tile-granular XLA gather — the 128-aligned window starts make each
    gathered chunk a whole (PT_NF, 128) lane tile (8 KB), so the gather
    streams at near HBM bandwidth — and the kernel consumes them through
    the standard block pipeline (regular double-buffered prefetch, no
    per-block latency stall).  Costs one (nblocks, nstrips*WL) * PT_NF
    f32 intermediate in HBM (~768 MB at 1M bergs, BN=128, W=288).
    """
    interpret = _auto_interpret(interpret)
    N = PT.shape[1]
    BN = block_n
    WL = -(-(window + 128) // 128) * 128
    ntw = WL // 128
    nblocks = -(-N // BN)
    Npad = nblocks * BN
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    nstrips = 2 * radius + 1
    dtype = PT.dtype

    # pad to a whole number of 128-lane tiles (Npad itself need not be
    # 128-aligned when BN < 128 — small test capacities)
    NT = -(-(Npad + WL) // 128) * 128
    PTpad = jnp.concatenate(
        [PT, jnp.zeros((PT_NF, NT - N), dtype)], axis=1)
    key = jnp.concatenate(
        [key_s, jnp.full((Npad - N,), ncells, key_s.dtype)])
    c0 = key[::BN]
    c1 = key[BN - 1::BN]
    c1c = jnp.minimum(c1, ncells - 1)
    span_bad = (c1c - c0) > (nx - nstrips)

    offs = jnp.arange(-radius, radius + 1, dtype=jnp.int32) * nx
    c_lo = jnp.clip(c0[:, None] - radius + offs[None, :], 0, ncells - 1)
    c_hi = jnp.clip(c1c[:, None] + radius + offs[None, :], -1, ncells - 1)
    ws = cell_starts[c_lo]
    ws128 = ws // 128                        # (nblocks, nstrips)
    win_need = cell_starts[c_hi + 1] - ws128 * 128
    win_bad = jnp.any(win_need > WL, axis=1)
    bad = span_bad | win_bad

    # tile-granular window materialization: tile t of strip (b, s) is
    # lane-tile ws128[b, s] + t of PTpad.  max index <= N/128 + ntw - 1
    # <= T - 1 by construction (cell_starts <= N), no clamp needed.
    T = NT // 128
    PTr = PTpad.reshape(PT_NF, T, 128)
    tidx = (ws128.astype(jnp.int32)[:, :, None]
            + jnp.arange(ntw, dtype=jnp.int32))          # (nb, ns, ntw)
    Wg = jnp.take(PTr, tidx.reshape(-1), axis=1)
    # block-major (nblocks, PT_NF, nstrips*WL): Mosaic requires the last
    # two BLOCK dims (8, 128)-aligned, so the per-block window must live
    # in the trailing axes (a (R, 1, W) block fails to lower)
    Wg = jnp.swapaxes(Wg.reshape(PT_NF, nblocks, nstrips * WL), 0, 1)

    slack = 1. + 1e-6
    cd = float(cfg.contact_distance)
    if cfg.grid_is_latlon:
        rearth = float(cfg.Rearth)
    BIG = float(2 * N)
    if epilogue:
        # legacy non-bonded contact group scalars (the XLA
        # precompute's spring/damping constants)
        spring = float(cfg.contact_spring_coef_eff)

    def kernel(ws_ref, clo_ref, chi_ref, self_ref, win_ref, out_ref):
        b = pl.program_id(0)
        rows = self_ref[...]                  # (PT_NF, BN)
        winall = win_ref[0, :, :]             # (PT_NF, nstrips*WL)
        lon1 = rows[PT_LON:PT_LON + 1, :]
        lat1 = rows[PT_LAT:PT_LAT + 1, :]
        R1 = rows[PT_RAD:PT_RAD + 1, :]
        fl1 = rows[PT_FLK:PT_FLK + 1, :]
        al1 = rows[PT_ALIVE:PT_ALIVE + 1, :]
        if exclude_same_group:
            grp1 = rows[PT_GRP:PT_GRP + 1, :]

        gid = b * BN + jax.lax.broadcasted_iota(jnp.int32, (1, BN), 1)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (WL, 1), 0)

        cnt = jnp.zeros((1, BN), dtype)
        vmin = jnp.full((1, BN), BIG, dtype)
        vmax = jnp.full((1, BN), -1., dtype)
        f1 = jnp.zeros((8, BN), dtype)
        f2 = jnp.zeros((8, BN), dtype)
        if epilogue:
            iax = jnp.zeros((1, BN), dtype)
            iay = jnp.zeros((1, BN), dtype)
            d1 = jnp.zeros((5, BN), dtype)    # P11 P12 P22 mm exact
            d2 = jnp.zeros((5, BN), dtype)

        for s in range(nstrips):
            w0 = ws_ref[b * nstrips + s] * 128
            win = winall[:, s * WL:(s + 1) * WL]          # (PT_NF, WL)
            winT = win.T                      # (WL, PT_NF)
            lon2 = winT[:, PT_LON:PT_LON + 1]
            lat2 = winT[:, PT_LAT:PT_LAT + 1]
            R2 = winT[:, PT_RAD:PT_RAD + 1]
            fl2 = winT[:, PT_FLK:PT_FLK + 1]
            al2 = winT[:, PT_ALIVE:PT_ALIVE + 1]
            key2 = winT[:, PT_KEY:PT_KEY + 1]

            clo = clo_ref[b * nstrips + s].astype(dtype)
            chi = chi_ref[b * nstrips + s].astype(dtype)
            wid = w0 + rowi                   # (WL, 1)
            valid = ((key2 >= clo) & (key2 <= chi) & (al2 > 0.5)
                     & (al1 > 0.5) & (wid != gid)
                     & (fl1 != -1.) & (fl2 != -1.))
            if exclude_same_group:
                valid = valid & (winT[:, PT_GRP:PT_GRP + 1] != grp1)

            if cfg.grid_is_latlon:
                lat_ref_ = 0.5 * (lat1 + lat2)
                dx_dlon = PI_180 * rearth * jnp.cos(PI_180 * lat_ref_)
                rx = (lon1 - lon2) * dx_dlon
                ry = (lat1 - lat2) * (PI_180 * rearth)
            else:
                rx = lon1 - lon2
                ry = lat1 - lat2
            r2 = rx * rx + ry * ry
            crit = jnp.maximum(R1 + R2, cd)
            engaged = valid & (r2 > 0.) & (r2 <= crit * crit * slack)
            engf = jnp.where(engaged, 1., 0.).astype(dtype)   # (WL, BN)

            cnt = cnt + jnp.sum(engf, axis=0, keepdims=True)
            widf = wid.astype(dtype)
            lmin = jnp.min(jnp.where(engaged, widf, BIG), axis=0,
                           keepdims=True)                     # (1, BN)
            lmax = jnp.max(jnp.where(engaged, widf, -1.), axis=0,
                           keepdims=True)

            feats = win[0:8, :]                               # (8, WL)
            e1 = engf * jnp.where(widf == lmin, 1., 0.)
            e2 = engf * jnp.where(widf == lmax, 1., 0.)
            # Precision.HIGHEST is REQUIRED for exactness (Mosaic's
            # default dot truncates f32 operands to bf16)
            f1s = jax.lax.dot_general(
                feats, e1, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST)          # (8, BN)
            f2s = jax.lax.dot_general(
                feats, e2, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST)
            take1 = lmin < vmin
            take2 = lmax > vmax
            f1 = jnp.where(take1, f1s, f1)
            f2 = jnp.where(take2, f2s, f2)

            if epilogue:
                # the velocity-independent pair precompute, in-kernel
                # (precompute_pair_data_T's geometry chain): exact
                # engagement (r < crit, the sqrt-based test the XLA
                # re-mask applies), spring-accel sums over ALL exact
                # pairs, damping projections + mass ratio + exactness
                # per selected partner
                r = jnp.sqrt(r2)
                rsafe = jnp.where(r2 > 0., r, 1.)
                exact = valid & (r2 > 0.) & (r < crit)
                exf = jnp.where(exact, 1., 0.).astype(dtype)
                M1 = jnp.maximum(rows[PT_MASS:PT_MASS + 1, :], 1e-30)
                M2 = winT[:, PT_MASS:PT_MASS + 1]
                mmat = jnp.minimum(M1, M2) / M1               # (WL, BN)
                aspr = spring * mmat * (crit - r)
                iax = iax + jnp.sum(
                    jnp.where(exact, aspr * (rx / rsafe), 0.),
                    axis=0, keepdims=True)
                iay = iay + jnp.sum(
                    jnp.where(exact, aspr * (ry / rsafe), 0.),
                    axis=0, keepdims=True)
                rs2 = rsafe * rsafe
                P11c = (rx * rx) / rs2
                P12c = (rx * ry) / rs2
                P22c = (ry * ry) / rs2
                ds = [P11c, P12c, P22c, mmat, exf]
                d1s = jnp.concatenate(
                    [jnp.sum(e1 * m, axis=0, keepdims=True)
                     for m in ds], axis=0)                    # (5, BN)
                d2s = jnp.concatenate(
                    [jnp.sum(e2 * m, axis=0, keepdims=True)
                     for m in ds], axis=0)
                d1 = jnp.where(take1, d1s, d1)
                d2 = jnp.where(take2, d2s, d2)

            vmin = jnp.minimum(vmin, lmin)
            vmax = jnp.maximum(vmax, lmax)

        pad = jnp.zeros((1, BN), dtype)
        if epilogue:
            # rows: cnt vmin vmax IAX | u v P11 P12 P22 mm ex pad |
            #       u v P11 P12 P22 mm ex pad | IAY zeros
            out_ref[...] = jnp.concatenate(
                [cnt, vmin, vmax, iax,
                 f1[PT_U:PT_V + 1, :], d1, pad,
                 f2[PT_U:PT_V + 1, :], d2, pad,
                 iay, jnp.zeros((EX_NOUT - 21, BN), dtype)], axis=0)
        else:
            out_ref[...] = jnp.concatenate(
                [cnt, vmin, vmax, pad, f1, f2,
                 jnp.zeros((EX_NOUT - 20, BN), dtype)], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((PT_NF, BN), lambda b, *_: (0, b)),
                  pl.BlockSpec((1, PT_NF, nstrips * WL),
                               lambda b, *_: (b, 0, 0))],
        out_specs=pl.BlockSpec((EX_NOUT, BN), lambda b, *_: (0, b)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((EX_NOUT, Npad), dtype),
        interpret=interpret,
    )(ws128.astype(jnp.int32).reshape(-1),
      c_lo.astype(jnp.int32).reshape(-1),
      c_hi.astype(jnp.int32).reshape(-1), PTpad, Wg)[:, :N]

    bad_block = jnp.repeat(bad, BN, total_repeat_length=Npad)[:N]
    return out, bad_block
