"""Mass spreading of bergs onto the ocean grid + derived gridded fields.

TPU-native port of ``spread_mass_across_ocean_cells`` /
``spread_variable_across_cells`` / ``calculate_mass_on_ocean`` /
``sum_up_spread_fields`` / ``create_gridded_icebergs_fields``
(``src/icebergs.F90:3390-3491, 3895-4243, 4970-5013, 6077-6152``).

The reference accumulates each berg's 9-point footprint into per-cell
9-slot buffers and halo-reduces them with MPI; here each berg scatter-adds
its 9 weights directly into the halo-padded field (the halo ring is folded
by the multi-device layer when sharded).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as C
from ..config import IcebergsConfig
from .thermo import fl_bits_dimensions
from .hexagon import hexagon_into_quadrants_using_triangles


class SpreadDiags(NamedTuple):
    spread_mass: jnp.ndarray     # (nx+2, ny+2) kg/m2
    spread_area: jnp.ndarray     # area fraction
    spread_uvel: jnp.ndarray
    spread_vvel: jnp.ndarray
    ustar_iceberg: jnp.ndarray
    mass_on_ocean: jnp.ndarray   # kg per cell (not divided by area)
    u_iceberg: jnp.ndarray
    v_iceberg: jnp.ndarray
    # per-cell (non-spread) sums, calculate_sum_over_bergs_diagnositcs
    # (icebergs.F90:5026-5070)
    mass: jnp.ndarray            # kg/m2 per cell
    virtual_area: jnp.ndarray    # m2
    bergy_mass: jnp.ndarray      # kg/m2
    fl_bits_mass: jnp.ndarray    # kg/m2
    fl_bergy_bits_mass: jnp.ndarray  # kg/m2


def find_orientation_using_iceberg_bonds(st, cfg: IcebergsConfig,
                                         orientation):
    """Hexagon orientation from bond directions (vectorized port of
    find_orientation_using_iceberg_bonds, icebergs.F90:3829-3894).

    NOTE bug-compat: the reference returns this angle in *radians*
    (mod pi/3) but feeds it to the hexagon rotation which expects
    *degrees* (rotate_and_translate, icebergs.F90:4537; the reference
    marks the rotation "\\todo not working yet").  We reproduce that
    behavior so spreading weights match.
    """
    import math as _m
    other = jnp.maximum(st.bond_idx, 0)
    valid = (st.bond_idx >= 0) & st.alive[:, None] & st.alive[other]

    lat1 = st.lat[:, None]
    lon1 = st.lon[:, None]
    lat2 = st.lat[other]
    lon2 = st.lon[other]
    from ..grid import convert_from_grid_to_meters
    lat_ref = 0.5 * (lat1 + lat2)
    dx_dlon, dy_dlat = convert_from_grid_to_meters(
        lat_ref, cfg.grid_is_latlon, cfg.Rearth)
    rx = (lon2 - lon1) * dx_dlon
    ry = (lat2 - lat1) * dy_dlat

    halfpi = C.PI / 2.
    ang = jnp.where(
        rx == 0., halfpi,
        jnp.mod((halfpi - orientation[:, None] * (C.PI / 180.))
                - jnp.arctan(ry / jnp.where(rx == 0., 1., rx)),
                C.PI / 3.))
    cnt = jnp.sum(valid, axis=1).astype(st.dtype)
    avg = jnp.sum(jnp.where(valid, ang, 0.), axis=1) \
        / jnp.maximum(cnt, 1.)
    return jnp.where(cnt > 0., jnp.mod(avg, C.PI / 3.),
                     jnp.mod(jnp.zeros_like(avg), C.PI / 3.))


def spread_weights(st, grid, cfg: IcebergsConfig, *, Tn=None, Area=None):
    """Per-berg 3x3 spreading weights (yDxL..yUxR order -> (9,N)).

    Rectangle model (default, icebergs.F90:3960-4001) or hexagon model
    (icebergs.F90:4003-4090).  Returns (weights[9, N], I_fraction_used).
    Weight order: (dj, di) in row-major over dj in (-1,0,1), di in (-1,0,1).
    """
    x, y = st.xi, st.yj
    i, j = st.ine, st.jne
    I, J = i + 1, j + 1
    msk = grid.msk
    if Area is None:
        Area = st.length * st.width
    area_cell = grid.area[I, J]

    m = {}
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            m[(di, dj)] = msk[I + di, J + dj]

    if not cfg.hexagonal_icebergs:
        L = jnp.where(area_cell > 0.,
                      jnp.minimum(jnp.sqrt(Area / jnp.maximum(area_cell, 1e-30)),
                                  1.0), 1.0)
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

        yDxL = yD * xL * m[(-1, -1)]
        yDxC = yD * xC * m[(0, -1)]
        yDxR = yD * xR * m[(1, -1)]
        yCxL = yC * xL * m[(-1, 0)]
        yCxR = yC * xR * m[(1, 0)]
        yUxL = yU * xL * m[(-1, 1)]
        yUxC = yU * xC * m[(0, 1)]
        yUxR = yU * xR * m[(1, 1)]
        yCxC = 1. - (((yDxL + yUxR) + (yDxR + yUxL))
                     + ((yCxL + yCxR) + (yDxC + yUxC)))
        I_frac = jnp.ones_like(x)
    else:
        # hexagonal elements: exact quadrant areas around the nearest corner
        orientation = jnp.full_like(x, cfg.initial_orientation)
        if cfg.iceberg_bonds_on and cfg.rotate_icebergs_for_mass_spreading:
            orientation = find_orientation_using_iceberg_bonds(
                st, cfg, orientation)
        H = jnp.where(area_cell > 0.,
                      jnp.minimum(jnp.sqrt(Area / (2. * math.sqrt(3.)))
                                  / jnp.sqrt(jnp.maximum(area_cell, 1e-30)), 1.),
                      (math.sqrt(3.) / 2.) * 0.49)
        origin_x = jnp.where(x < 0.5, 0., 1.)
        origin_y = jnp.where(y < 0.5, 0., 1.)
        x0 = x - origin_x
        y0 = y - origin_y
        Area_hex, Q1, Q2, Q3, Q4 = hexagon_into_quadrants_using_triangles(
            x0, y0, H, orientation)
        Ah = jnp.maximum(Area_hex, 1e-30)
        Q1, Q2, Q3, Q4 = Q1 / Ah, Q2 / Ah, Q3 / Ah, Q4 / Ah

        right = x >= 0.5
        top = y >= 0.5
        z = jnp.zeros_like(x)
        # quadrant -> cell assignment by nearest-vertex quadrant
        # (icebergs.F90:4043-4064)
        yUxR = jnp.where(right & top, Q1, z)
        yUxC = jnp.where(right & top, Q2, jnp.where(~right & top, Q1, z))
        yUxL = jnp.where(~right & top, Q2, z)
        yCxL = jnp.where(~right & top, Q3, jnp.where(~right & ~top, Q2, z))
        yCxC = jnp.where(right & top, Q3,
                         jnp.where(~right & top, Q4,
                                   jnp.where(~right & ~top, Q1, Q2)))
        yCxR = jnp.where(right & top, Q4, jnp.where(right & ~top, Q1, z))
        yDxL = jnp.where(~right & ~top, Q3, z)
        yDxC = jnp.where(~right & ~top, Q4, jnp.where(right & ~top, Q3, z))
        yDxR = jnp.where(right & ~top, Q4, z)

        frac = (yDxL * m[(-1, -1)] + yDxC * m[(0, -1)] + yDxR * m[(1, -1)]
                + yCxL * m[(-1, 0)] + yCxR * m[(1, 0)] + yUxL * m[(-1, 1)]
                + yUxC * m[(0, 1)] + yUxR * m[(1, 1)]
                + yCxC ** m[(0, 0)])   # NOTE: '**' reproduces yCxC**msk
        frac = jnp.where(st.static_berg == 1., 1., frac)
        I_frac = 1. / jnp.maximum(frac, 1e-30)

    w = jnp.stack([yDxL, yDxC, yDxR, yCxL, yCxC, yCxR, yUxL, yUxC, yUxR])
    return w, I_frac


def _lex_cell_id_order(st, key):
    """Layout-invariant (cell, id) lexicographic permutation."""
    from .sorted import lex_cell_id_order
    return lex_cell_id_order(key, st.id_cnt, st.id_ij)


def make_sort_ctx(st, grid, alive=None):
    """(order, key_s, rank) for the deterministic scatters, shared by
    the melt-field, per-cell-sum and 9-slot spreading scatters in one
    step (one lexsort instead of three)."""
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    if alive is None:
        alive = st.alive
    key = jnp.where(alive, st.jne * nx + st.ine, ncells)
    order = _lex_cell_id_order(st, key)
    key_s = key[order]
    starts = jnp.searchsorted(
        key_s, jnp.arange(ncells + 1, dtype=key_s.dtype)).astype(jnp.int32)
    rank = jnp.arange(st.capacity, dtype=jnp.int32) - starts[
        jnp.minimum(key_s, ncells)]
    return order, key_s, rank


# Slot-sum backend selection lives in IcebergsConfig
# (``slot_sum_method``; production default "pallas" = payload sort +
# MXU segment-sum kernel, dispatched in create_gridded_icebergs_fields;
# the per-call ``method`` argument below takes the non-pallas value,
# cfg.slot_sum_method_eff).  For cells with occupancy <= K every
# backend produces BITWISE-identical sums (same tree, same slot
# positions); they differ only in how denser cells accumulate.
# In-situ A/B at 1M bergs on v5e: scatter 108 ms vs gather 170 ms —
# the gather's while_loop overflow pass forces the (N, 9F) contrib
# (128-lane padded, 512 MB) to materialize instead of fusing into the
# update stream, so scatter is the non-pallas default.


def _cell_slot_sums_gather(key_s, contribT, ncells, K):
    """Per-cell sums of sorted rows by transposed GATHER blocks.

    The scatter formulation writes a (ncells*K, F) slot buffer whose
    minor dim pads to 128 lanes — a multi-GB intermediate that costs
    ~100 ms/step at 1M bergs on v5e.  Here each cell's first K rows are
    fetched as ONE gather along the minor axis of the (F, N) transposed
    contributions — (F, K, ncells), no lane padding — and reduced with
    the same fixed pairwise tree.  Cells denser than K accumulate exact
    additional K-row blocks through a while_loop (entered only when the
    max occupancy demands it), so no mass is ever dropped.

    ``contribT`` is (F, N) — ALREADY transposed, so no (N, F<=128)
    padded slab ever materializes upstream.

    Bitwise spec (layout-invariant): result = tree(rows 0..K-1)
    + tree(rows K..2K-1) + ... in (cell, id) row order.
    """
    F, N = contribT.shape
    starts = jnp.searchsorted(
        key_s, jnp.arange(ncells + 1, dtype=key_s.dtype)).astype(jnp.int32)
    cT = jnp.concatenate(
        [contribT, jnp.zeros((F, 1), contribT.dtype)], axis=-1)
    base, ends = starts[:-1], starts[1:]
    ks = jnp.arange(K, dtype=jnp.int32)[:, None]

    def tree_block(r):
        idx = base[None, :] + r * K + ks          # (K, ncells)
        valid = idx < ends[None, :]
        idxc = jnp.where(valid, jnp.minimum(idx, N - 1), N)
        x = cT[:, idxc]                           # (F, K, ncells)
        k = K
        while k > 1:
            if k % 2:
                x = jnp.concatenate(
                    [x, jnp.zeros((F, 1, ncells), x.dtype)], axis=1)
                k += 1
            x = x[:, 0::2] + x[:, 1::2]
            k //= 2
        return x[:, 0]                            # (F, ncells)

    acc = tree_block(jnp.int32(0))
    max_cnt = jnp.max(ends - base)

    def cond(c):
        r, _ = c
        return r * K < max_cnt

    def body(c):
        r, a = c
        return r + 1, a + tree_block(r)

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(1), acc))
    return acc.T                                  # (ncells, F)


def _cell_slot_sums_scatter_t(key, rank, contribT, ncells, K):
    """Scatter backend on a TRANSPOSED (F, ncells*K) slot buffer.

    Same slot assignment and fixed tree as :func:`_cell_slot_sums`
    (bitwise identical), but the slot buffer keeps the long dim minor so
    it occupies F*ncells*K*4 bytes instead of the (ncells*K, F<=128)
    row-major form's ncells*K*512 bytes (2.1 GB at 512x512, K=16).

    ``key``/``rank``/``contribT`` may be in ANY row order (every berg
    owns a unique (cell, rank) slot, so the scatter needs no sorted
    input) — callers pass ORIGINAL-frame rows and skip the per-column
    permutation gathers entirely."""
    F = contribT.shape[0]
    idx = jnp.where(key < ncells,
                    key * K + jnp.minimum(rank, K - 1), ncells * K)
    buf = jnp.zeros((F, ncells * K), contribT.dtype).at[:, idx].add(
        contribT, mode='drop')
    x = buf.reshape(F, ncells, K)
    k = K
    while k > 1:
        if k % 2:
            x = jnp.concatenate(
                [x, jnp.zeros((F, ncells, 1), x.dtype)], axis=2)
            k += 1
        x = x[:, :, 0::2] + x[:, :, 1::2]
        k //= 2
    return x[:, :, 0].T


def _ktree(x, axis):
    """Fixed pairwise-add tree over ``axis`` (zero-padded to even at each
    level) — the same association as :func:`_cell_slot_sums`' explicit
    tree, expressed on any axis.  Never reassociated by XLA."""
    k = x.shape[axis]
    while k > 1:
        if k % 2:
            pad = [(0, 0, 0)] * x.ndim
            pad[axis] = (0, 1, 0)
            x = jax.lax.pad(x, jnp.zeros((), x.dtype), pad)
            k += 1
        lo = jax.lax.slice_in_dim(x, 0, k, 2, axis)
        hi = jax.lax.slice_in_dim(x, 1, k, 2, axis)
        x = lo + hi
        k //= 2
    return jnp.squeeze(x, axis)


def _slot_sums_raw(order, key_s, w9s, value_rows, extra_rows, ncells, K,
                   mm=False):
    """Per-cell slot sums computed from RAW (N,) rows with the 9-weight
    product fused INTO the block reduction.

    The round-2 backends first materialize the full (9F+FX, N)
    contribution matrix (w9 x vals outer product) and then slot-sum it
    through a multi-GB (ncells*K) buffer — at 1M bergs that is ~420-590
    ms/step on v5e, the whole step's dominant cost.  Here each cell's
    K-row block gathers the ~9+F+FX RAW rows once (consecutive sorted
    indices) and forms the product per block, so HBM never sees the
    (9F, N) matrix or a slot buffer at all.

    * ``mm=False`` (``gather_raw``): pairwise-tree reduction — BITWISE
      identical to the ``gather``/``scatter``/``scatter_t`` backends for
      any occupancy (same block structure as ``gather``).
    * ``mm=True`` (``gather_mm``): the 9xF product-sum runs as one
      batched matmul ``einsum('wkc,fkc->wfc')`` on the MXU
      (precision=HIGHEST).  Deterministic and layout-invariant (the
      contraction dim K is fixed), but a different fp association than
      the tree backends; extras always reduce by tree.

    Returns S (ncells, 9F+FX): columns [9F spread | FX extras], matching
    the other backends' layout.
    """
    F = len(value_rows)
    FX = len(extra_rows)
    nw = 9 if w9s is not None else 0
    rows = ([w9s[k] for k in range(9)] if nw else []) \
        + list(value_rows) + list(extra_rows)
    N = key_s.shape[0]
    dtype = rows[0].dtype
    if order is not None:
        rows = [r[order] for r in rows]
    rows_p = [jnp.concatenate([r, jnp.zeros((1,), r.dtype)]) for r in rows]
    starts = jnp.searchsorted(
        key_s, jnp.arange(ncells + 1, dtype=key_s.dtype)).astype(jnp.int32)
    base, ends = starts[:-1], starts[1:]
    ks = jnp.arange(K, dtype=jnp.int32)[:, None]

    def reduce_block(r):
        idx = base[None, :] + r * K + ks          # (K, ncells)
        valid = idx < ends[None, :]
        idxc = jnp.where(valid, jnp.minimum(idx, N - 1), N)
        g = [rp[idxc] for rp in rows_p]           # each (K, ncells)
        parts = []
        if nw and F:
            Wg = jnp.stack(g[:nw], 0)             # (9, K, ncells)
            Vg = jnp.stack(g[nw:nw + F], 0)       # (F, K, ncells)
            if mm:
                S9 = jnp.einsum('wkc,fkc->wfc', Wg, Vg,
                                precision=jax.lax.Precision.HIGHEST)
            else:
                S9 = _ktree(Wg[:, None] * Vg[None], axis=2)
            parts.append(S9.reshape(9 * F, ncells))
        if FX:
            Eg = jnp.stack(g[nw + F:], 0)         # (FX, K, ncells)
            parts.append(_ktree(Eg, axis=1))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)

    acc = reduce_block(jnp.int32(0))
    max_cnt = jnp.max(ends - base)

    def cond(c):
        r, _ = c
        return r * K < max_cnt

    def body(c):
        r, a = c
        return r + 1, a + reduce_block(r)

    _, acc = jax.lax.while_loop(cond, body, (jnp.int32(1), acc))
    return acc.T


def _origin_frame_ranks(st, grid, order, key_s, alive):
    """Per-ORIGINAL-slot (key, within-cell id rank): the slot coordinates
    of the deterministic scatters without permuting any value column.

    The key comes from the SORT (``key_s[inv]``), not from the caller's
    aliveness: rows that died after the sort keep their slot and
    contribute whatever their (already-masked) columns hold — exactly
    the permuted backends' semantics (a melting berg's final melt flux
    must still land)."""
    ncells = grid.nx * grid.ny
    N = st.capacity
    inv = jnp.zeros((N,), jnp.int32).at[order].set(
        jnp.arange(N, dtype=jnp.int32))
    key_o = key_s[inv]
    starts = jnp.searchsorted(
        key_s, jnp.arange(ncells + 1, dtype=key_s.dtype)).astype(jnp.int32)
    rank_o = inv - starts[jnp.minimum(key_o, ncells)]
    return key_o, rank_o


def _cell_slot_sums(key_s, rank, contrib, ncells, K):
    """Per-cell sums of sorted, ranked rows with a fixed reduction tree.

    Rows with rank < K land in unique (cell, rank) slots and are reduced
    with a static pairwise-add tree; rank >= K overflow rows (cells
    denser than K bergs) clamp onto slot K-1 where the scatter
    accumulates them exactly — deterministic per program, and bitwise
    layout-invariant whenever density <= K.
    """
    F = contrib.shape[-1]
    # overflow rows (cells denser than K) clamp onto slot K-1, where
    # scatter-add accumulates them exactly (order deterministic per
    # program; bitwise layout invariance holds for density <= K, the
    # documented bound).  ONE scatter — the previous separate overflow
    # scatter was a second full-N pass for almost always zero rows.
    idx = jnp.where(key_s < ncells,
                    key_s * K + jnp.minimum(rank, K - 1), ncells * K)
    buf = jnp.zeros((ncells * K, F), contrib.dtype).at[idx].add(
        contrib, mode='drop')
    # explicit pairwise-add tree, NOT jnp.sum: XLA's reduce lowering (and
    # hence fp association) varies with the surrounding shape, breaking
    # bitwise layout invariance; explicit adds are never reassociated
    x = buf.reshape(ncells, K, F)
    k = K
    while k > 1:
        if k % 2:
            x = jnp.concatenate(
                [x, jnp.zeros((ncells, 1, F), x.dtype)], axis=1)
            k += 1
        x = x[:, 0::2] + x[:, 1::2]
        k //= 2
    return x[:, 0]


def scatter9_slots(grid, st, w, I_frac, value_list, alive, K: int = 16,
                   sort_ctx=None, extra_value_list=None,
                   method: str = "scatter"):
    """Layout-invariant 9-point scatter: the reference's 9-slot
    ``mass_on_ocean(i,j,1:9)`` buffers (calculate_mass_on_ocean,
    icebergs.F90:4970-5013).

    Bergs are ordered (cell, id) — the reference's id-ordered per-cell
    lists — so each target cell's slot k is a fixed-tree sum over one
    source cell's bergs in id order: bitwise independent of the device
    layout (parallel_reprod, icebergs_framework.F90:33).

    Returns ``out9`` of shape (nx+2, ny+2, 9, F).  ``sum_slots`` folds it
    to fields; the sharded layer halo-folds the slot planes first.

    ``extra_value_list``: plain owning-cell columns that ride along in
    the SAME slot-sum pass (the scatter indices are identical to
    :func:`scatter_cell_deterministic`'s, so appending columns changes
    no bits of any column) — returns ``(out9, cell_fields)`` then.
    """
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    N = st.capacity
    F = len(value_list)
    order, key_s, rank = (sort_ctx if sort_ctx is not None
                          else make_sort_ctx(st, grid, alive))
    # order=None: rows are already physically (cell, id)-sorted (the
    # persistent layout) — skip the permutation gathers
    FX = len(extra_value_list) if extra_value_list else 0
    if method in ("gather_raw", "gather_mm"):
        # raw-row block gathers with the 9-weight product fused into the
        # reduction: no (9F, N) contribution matrix, no slot buffer
        scale_v = jnp.where(alive, I_frac, 0.)
        w9s = w * scale_v[None, :]                # (9, N)
        S = _slot_sums_raw(order, key_s, w9s, list(value_list),
                           list(extra_value_list or []), ncells, K,
                           mm=(method == "gather_mm"))
    elif method == "scatter_t":
        # ORIGINAL-frame transposed build: every berg owns a unique
        # (cell, rank) slot, so the column scatter needs no sorted rows —
        # no per-column permutation gathers at all
        scale_v = jnp.where(alive, I_frac, 0.)
        valsT = jnp.stack(value_list, axis=0)
        w9 = w * scale_v[None, :]
        contribT = (w9[:, None, :] * valsT[None, :, :]).reshape(9 * F, N)
        if FX:
            contribT = jnp.concatenate(
                [contribT, jnp.stack(extra_value_list, axis=0)], axis=0)
        if order is not None:
            key_o, rank_o = _origin_frame_ranks(st, grid, order, key_s,
                                                alive)
        else:
            key_o, rank_o = key_s, rank
        S = _cell_slot_sums_scatter_t(key_o, rank_o, contribT, ncells, K)
    elif method == "gather":
        # transposed build: (9F, N) with the long dim minor, so neither
        # the contributions nor the gathered slot blocks ever tile-pad
        # (an (N, 9F<=128) f32 slab is 512 MB at 1M bergs)
        scale_v = jnp.where(alive, I_frac, 0.)
        if order is not None:
            valsT = jnp.stack([v[order] for v in value_list], axis=0)
            w9 = w[:, order] * scale_v[order][None, :]    # (9, N)
        else:
            valsT = jnp.stack(value_list, axis=0)
            w9 = w * scale_v[None, :]
        contribT = (w9[:, None, :] * valsT[None, :, :]).reshape(9 * F, N)
        if FX:
            exT = jnp.stack([v[order] for v in extra_value_list]
                            if order is not None else extra_value_list,
                            axis=0)
            contribT = jnp.concatenate([contribT, exT], axis=0)
        S = _cell_slot_sums_gather(key_s, contribT, ncells, K)
    else:
        vals = jnp.stack(value_list, axis=-1)             # (N, F)
        wT = w.T                                          # (N, 9)
        scale = jnp.where(alive, I_frac, 0.)[:, None]
        if order is not None:
            vals, wT, scale = vals[order], wT[order], scale[order]

        # ONE row scatter for all 9 offsets x F fields (nine separate
        # scatter+reduce rounds measured +120 ms at 1M bergs on v5e)
        contrib = (vals[:, None, :] * (wT * scale)[:, :, None]).reshape(
            N, 9 * F)
        if FX:
            ex = jnp.stack([v[order] for v in extra_value_list]
                           if order is not None else extra_value_list,
                           axis=-1)
            contrib = jnp.concatenate([contrib, ex], axis=-1)
        S = _cell_slot_sums(key_s, rank, contrib, ncells, K)
    Sx = S[:, 9 * F:]
    S = S[:, :9 * F]
    Sg = S.reshape(ny, nx, 9, F).transpose(1, 0, 2, 3)     # (nx, ny, 9, F)

    out9 = jnp.zeros((nx + 2, ny + 2, 9, F), value_list[0].dtype)
    k = 0
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            out9 = out9.at[1 + di:nx + 1 + di,
                           1 + dj:ny + 1 + dj, k].add(Sg[:, :, k])
            k += 1
    if not FX:
        return out9
    Sxg = Sx.reshape(ny, nx, FX).transpose(1, 0, 2)
    outx = jnp.zeros((nx + 2, ny + 2, FX), value_list[0].dtype)
    outx = outx.at[1:-1, 1:-1, :].set(Sxg)
    return out9, [outx[..., f] for f in range(FX)]


def sum_slots(out9):
    """Fixed-order sum over the 9 slots (sum_up_spread_fields,
    icebergs.F90:6077-6152): returns a list of F (nx+2, ny+2) fields."""
    F = out9.shape[-1]
    acc = out9[:, :, 0, :]
    for k in range(1, 9):
        acc = acc + out9[:, :, k, :]
    return [acc[..., f] for f in range(F)]


def scatter_cell_deterministic(grid, st, value_list, alive, K: int = 16,
                               sort_ctx=None, method: str = "scatter"):
    """Layout-invariant owning-cell scatter (no spreading): fixed-tree
    per-cell sums in (cell, id) order.  The deterministic counterpart of
    ``.at[I, J].add`` for the per-cell diagnostics/melt fields."""
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    N = st.capacity
    order, key_s, rank = (sort_ctx if sort_ctx is not None
                          else make_sort_ctx(st, grid, alive))
    if method in ("gather_raw", "gather_mm"):
        # plain owning-cell columns reduce by tree in both modes —
        # bitwise identical to the gather/scatter backends
        S = _slot_sums_raw(order, key_s, None, [], list(value_list),
                           ncells, K, mm=False)
        dtype = value_list[0].dtype
    elif method == "scatter_t":
        valsT = jnp.stack(value_list, axis=0)
        if order is not None:
            key_o, rank_o = _origin_frame_ranks(st, grid, order, key_s,
                                                alive)
        else:
            key_o, rank_o = key_s, rank
        S = _cell_slot_sums_scatter_t(key_o, rank_o, valsT, ncells, K)
        dtype = valsT.dtype
    elif method == "gather":
        if order is not None:
            valsT = jnp.stack([v[order] for v in value_list], axis=0)
        else:
            valsT = jnp.stack(value_list, axis=0)
        S = _cell_slot_sums_gather(key_s, valsT, ncells, K)
        dtype = valsT.dtype
    else:
        vals = jnp.stack(value_list, axis=-1)
        if order is not None:
            vals = vals[order]
        S = _cell_slot_sums(key_s, rank, vals, ncells, K)
        dtype = vals.dtype
    F = len(value_list)
    Sg = S.reshape(ny, nx, F).transpose(1, 0, 2)
    out = jnp.zeros((nx + 2, ny + 2, F), dtype)
    out = out.at[1:-1, 1:-1, :].set(Sg)
    return [out[..., f] for f in range(F)]


def _scatter9_packed(grid, st, w, I_frac, value_list, alive):
    """Scatter-add the 9-point footprints of F fields in ONE scatter.

    Indices for all 9 offsets are concatenated and the F per-berg values
    stacked on the last axis, so the TPU sees a single (9N, F) row
    scatter-add instead of 9*F scalar scatters.
    """
    F = len(value_list)
    N = st.capacity
    I, J = st.ine + 1, st.jne + 1
    vals = jnp.stack(value_list, axis=-1)          # (N, F)
    rows = []
    cols = []
    contribs = []
    k = 0
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            rows.append(I + di)
            cols.append(J + dj)
            wk = jnp.where(alive, w[k] * I_frac, 0.)
            contribs.append(vals * wk[:, None])
            k += 1
    rows = jnp.concatenate(rows)
    cols = jnp.concatenate(cols)
    contribs = jnp.concatenate(contribs, axis=0)   # (9N, F)
    out = jnp.zeros((grid.nx + 2, grid.ny + 2, F), vals.dtype)
    out = out.at[rows, cols].add(contribs)
    return [out[..., f] for f in range(F)]


def berg_spread_mass(st, grid, frc, cfg: IcebergsConfig, *, Mberg=None,
                     Mbits=None, scaling=None, Area=None, Tn=None,
                     addfootloose=True):
    """Per-berg total mass to spread (incl. grounding trim & clipping).

    Port of the preamble of ``spread_mass_across_ocean_cells``
    (icebergs.F90:3929-3958).  NOTE the reference shadows rho_seawater with
    1035 inside this routine; reproduced here.
    """
    rho_sw = 1035.0
    if Mberg is None:
        Mberg = st.mass
    if Mbits is None:
        Mbits = st.mass_of_bits
    if scaling is None:
        scaling = st.mass_scaling
    if Tn is None:
        Tn = st.thickness
    I, J = st.ine + 1, st.jne + 1

    Mfl = st.mass_of_fl_bits if addfootloose else jnp.zeros_like(Mberg)
    Mbits_fl = st.mass_of_fl_bergy_bits if addfootloose \
        else jnp.zeros_like(Mberg)

    Mass_berg = Mberg
    if cfg.grounding_fraction > 0.:
        Hocean = cfg.grounding_fraction * (grid.ocean_depth[I, J]
                                           + frc.ssh[I, J])
        Dn = (cfg.rho_bergs / rho_sw) * Tn
        trim = jnp.minimum(1., Hocean / jnp.maximum(Dn, 1e-30))
        Mass_berg = jnp.where(Dn > Hocean, Mass_berg * trim, Mass_berg)
        Lfl, Wfl, Tfl = fl_bits_dimensions(cfg, st.thickness)
        Dnf = (cfg.rho_bergs / rho_sw) * Tfl
        trimf = jnp.minimum(1., Hocean / jnp.maximum(Dnf, 1e-30))
        Mfl = jnp.where((Mfl > 0.) & (Dnf > Hocean), Mfl * trimf, Mfl)

    Mass = (Mass_berg + Mfl + Mbits + Mbits_fl) * scaling
    if cfg.clipping_depth > 0.:
        Mass = jnp.minimum(Mass, cfg.clipping_depth * grid.area[I, J] * rho_sw)
    return Mass


def calculate_mass_on_ocean(st, grid, frc, cfg: IcebergsConfig,
                            sort_ctx=None, extra_value_list=None):
    """Scatter mass/area/momentum onto the grid
    (calculate_mass_on_ocean, icebergs.F90:4970-5013).

    With ``cfg.parallel_reprod`` (default, the reference's reproducing
    mode) the scatter goes through the 9-slot fixed-order machinery so
    the fields are bitwise independent of the device layout; halo
    replicas spread too, which reproduces the owner's interior
    contributions without a gridded fold."""
    alive = st.alive
    w, I_frac = spread_weights(st, grid, cfg)
    Mass = berg_spread_mass(st, grid, frc, cfg)
    Area = st.length * st.width
    value_list = [Mass, Area * st.mass_scaling,
                  st.uvel * Area * st.mass_scaling,
                  st.vvel * Area * st.mass_scaling]
    extra_out = None
    if cfg.parallel_reprod:
        out9 = scatter9_slots(grid, st, w, I_frac, value_list, alive,
                              K=cfg.reprod_max_per_cell,
                              sort_ctx=sort_ctx,
                              extra_value_list=extra_value_list,
                              method=cfg.slot_sum_method_eff)
        if extra_value_list:
            out9, extra_out = out9
        mass_on_ocean, area_on_ocean, U_on_ocean, V_on_ocean = \
            sum_slots(out9)
    else:
        mass_on_ocean, area_on_ocean, U_on_ocean, V_on_ocean = \
            _scatter9_packed(grid, st, w, I_frac, value_list, alive)
    if extra_value_list:
        return (mass_on_ocean, area_on_ocean, U_on_ocean, V_on_ocean,
                extra_out)
    return mass_on_ocean, area_on_ocean, U_on_ocean, V_on_ocean


def _pallas_spread_sums(st, grid, frc, cfg: IcebergsConfig,
                        extra_cell_cols, key_alive=None,
                        presorted=False, cell_starts=None):
    """Kernel-path per-cell sums: ONE payload sort + the pallas
    segment-sum kernel (ops/pallas_spread.py), with a lax.cond fallback
    to the scatter_t slot machinery for runs whose row windows overflow
    (fallback bits differ — tree vs sequential association — but both
    are deterministic; no-overflow runs are bitwise layout-invariant).

    Returns S (ncells, 36 + 7 + n_extra)."""
    from . import pallas_spread as ps

    ncells = grid.nx * grid.ny
    K = cfg.reprod_max_per_cell
    n_extra = len(extra_cell_cols or [])
    interp = PALLAS_SPREAD_INTERPRET
    if interp is None:
        interp = jax.default_backend() != "tpu"
    S, nbad, key_s, rows_s, starts = ps.spread_cell_sums(
        st, grid, frc, cfg, extra_cell_cols, key_alive=key_alive,
        presorted=presorted, cell_starts=cell_starts,
        cell_block=PALLAS_SPREAD_CB, window=PALLAS_SPREAD_WINDOW,
        interpret=interp)
    tbl = ps.cell_tables(grid)
    dtype = rows_s.dtype

    def fallback(_):
        key_c = jnp.minimum(key_s, ncells - 1)
        tblrows = tbl[:, key_c]                        # (16, N) gathers
        w9 = ps._weights_from_rows(rows_s, tblrows, cfg, dtype)
        area_c = jnp.maximum(tblrows[ps.T_AREA:ps.T_AREA + 1, :], 1e-30)
        Mass = rows_s[ps.R_MASS:ps.R_MASS + 1, :]
        LWms = rows_s[ps.R_LWMS:ps.R_LWMS + 1, :]
        u = rows_s[ps.R_U:ps.R_U + 1, :]
        v = rows_s[ps.R_V:ps.R_V + 1, :]
        w_cell = rows_s[ps.R_MASSMS:ps.R_MASSMS + 1, :] / area_c
        vals = jnp.concatenate([Mass, LWms, u * LWms, v * LWms], axis=0)
        P9 = (w9[:, None, :] * vals[None, :, :]).reshape(36, -1)
        Pc = jnp.concatenate(
            [w_cell, w_cell * u, w_cell * v,
             rows_s[ps.R_VIRT:ps.R_VIRT + 1, :],
             rows_s[ps.R_BITS:ps.R_BITS + 1, :],
             rows_s[ps.R_FLB:ps.R_FLB + 1, :],
             rows_s[ps.R_FLBB:ps.R_FLBB + 1, :]], axis=0)
        contribT = jnp.concatenate([P9, Pc, rows_s[ps.R_NFIX:, :]],
                                   axis=0)
        rank = (jnp.arange(key_s.shape[0], dtype=jnp.int32)
                - starts[jnp.minimum(key_s, ncells)])
        return _cell_slot_sums_scatter_t(key_s, rank, contribT, ncells, K)

    return jax.lax.cond(nbad > 0, fallback, lambda _: S, None)


# kernel-path knobs: window None = auto (~4x headroom over uniform
# density, ops/pallas_spread.auto_window), interpret None = auto
# (False on TPU).  cb=128 keeps the (cb, WL) one-hot inside the 16 MB
# scoped-VMEM budget with HIGHEST-precision matmuls.
PALLAS_SPREAD_CB = 128
PALLAS_SPREAD_WINDOW = None
PALLAS_SPREAD_INTERPRET = None


def create_gridded_icebergs_fields(st, grid, frc, cfg: IcebergsConfig,
                                   sort_ctx=None, extra_cell_cols=None,
                                   key_alive=None, cell_starts=None):
    """Derive spread_mass/area/uvel/vvel and gridded ustar
    (create_gridded_icebergs_fields, icebergs.F90:3390-3491).

    ``extra_cell_cols`` (reprod mode): further owning-cell columns (e.g.
    thermo's deferred melt columns) folded into the same slot-sum pass;
    returns ``(diags, extra_fields)`` then.

    ``cfg.slot_sum_method == "pallas"`` (rectangle spreading + reprod only):
    the whole pass runs as one payload sort + the pallas segment-sum
    kernel; ``sort_ctx`` is ignored and ``key_alive`` supplies the
    sort-key aliveness (pre-thermo, so rows that died during thermo
    keep their cell — _origin_frame_ranks' semantics)."""
    use_kernel = (cfg.parallel_reprod and cfg.slot_sum_method == "pallas"
                  and not cfg.hexagonal_icebergs)
    if use_kernel:
        nx, ny = grid.nx, grid.ny
        FX = len(extra_cell_cols or [])
        # identity sort_ctx (order=None) marks the persistent-layout
        # step: the slab is already physically (cell, id) sorted
        presorted = sort_ctx is not None and sort_ctx[0] is None
        S = _pallas_spread_sums(st, grid, frc, cfg, extra_cell_cols,
                                key_alive=key_alive,
                                presorted=presorted,
                                cell_starts=cell_starts)
        dt_ = S.dtype
        Sg = S[:, :36].reshape(ny, nx, 9, 4).transpose(1, 0, 2, 3)
        out9 = jnp.zeros((nx + 2, ny + 2, 9, 4), dt_)
        k = 0
        for dj in (-1, 0, 1):
            for di in (-1, 0, 1):
                out9 = out9.at[1 + di:nx + 1 + di,
                               1 + dj:ny + 1 + dj, k].add(Sg[:, :, k])
                k += 1
        mass_on, area_on, U_on, V_on = sum_slots(out9)
        Scell = S[:, 36:43].reshape(ny, nx, 7).transpose(1, 0, 2)
        cpad = jnp.zeros((nx + 2, ny + 2, 7), dt_).at[
            1:-1, 1:-1, :].set(Scell)
        (mass_cell, mom_u, mom_v, virtual_area, bergy_mass,
         fl_bits_mass, fl_bergy_bits_mass) = [cpad[..., f]
                                              for f in range(7)]
        if FX:
            Sx = S[:, 43:].reshape(ny, nx, FX).transpose(1, 0, 2)
            xpad = jnp.zeros((nx + 2, ny + 2, FX), dt_).at[
                1:-1, 1:-1, :].set(Sx)
            extra_fields = [xpad[..., f] for f in range(FX)]
        return _gridded_epilogue(
            st, grid, frc, cfg, mass_on, area_on, U_on, V_on,
            mass_cell, mom_u, mom_v, virtual_area, bergy_mass,
            fl_bits_mass, fl_bergy_bits_mass,
            extra_fields if FX else None,
            extra_cell_cols is not None)

    if cfg.parallel_reprod and sort_ctx is None:
        sort_ctx = make_sort_ctx(st, grid)

    # per-cell sums (calculate_sum_over_bergs_diagnositcs,
    # icebergs.F90:5026-5070), computed up front so they ride along in
    # the SAME slot-sum pass as the 9-point spreading (identical scatter
    # indices; per-column results unchanged)
    alive = st.alive
    I, J = st.ine + 1, st.jne + 1
    area_c = jnp.maximum(grid.area[I, J], 1e-30)
    w_cell = jnp.where(alive, st.mass_scaling / area_c, 0.)
    L, W, T = st.length, st.width, st.thickness
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

    cols = [st.mass * w_cell,
            st.mass * w_cell * st.uvel,
            st.mass * w_cell * st.vvel,
            (W * L + Abits + Abits_fl + Abits_flb)
            * jnp.where(alive, st.mass_scaling, 0.),
            (st.mass_of_bits + st.mass_of_fl_bergy_bits) * w_cell,
            st.mass_of_fl_bits * w_cell,
            st.mass_of_fl_bergy_bits * w_cell]
    cols = [jnp.where(alive, c, 0.) for c in cols]

    if cfg.parallel_reprod:
        n_own = len(cols)
        allcols = cols + list(extra_cell_cols or [])
        mass_on, area_on, U_on, V_on, cell_fields = \
            calculate_mass_on_ocean(st, grid, frc, cfg,
                                    sort_ctx=sort_ctx,
                                    extra_value_list=allcols)
        (mass_cell, mom_u, mom_v, virtual_area, bergy_mass,
         fl_bits_mass, fl_bergy_bits_mass) = cell_fields[:n_own]
        extra_fields = cell_fields[n_own:]
    else:
        mass_on, area_on, U_on, V_on = calculate_mass_on_ocean(
            st, grid, frc, cfg, sort_ctx=sort_ctx)
    if not cfg.parallel_reprod:
        vals = jnp.stack(cols, axis=-1)
        packed = jnp.zeros((grid.nx + 2, grid.ny + 2, len(cols)),
                           mass_on.dtype).at[I, J].add(vals)
        (mass_cell, mom_u, mom_v, virtual_area, bergy_mass, fl_bits_mass,
         fl_bergy_bits_mass) = [packed[..., k] for k in range(len(cols))]
        extra_fields = None
    return _gridded_epilogue(
        st, grid, frc, cfg, mass_on, area_on, U_on, V_on,
        mass_cell, mom_u, mom_v, virtual_area, bergy_mass,
        fl_bits_mass, fl_bergy_bits_mass, extra_fields,
        extra_cell_cols is not None)


def _gridded_epilogue(st, grid, frc, cfg, mass_on, area_on, U_on, V_on,
                      mass_cell, mom_u, mom_v, virtual_area, bergy_mass,
                      fl_bits_mass, fl_bergy_bits_mass, extra_fields,
                      want_extras):
    """Gridded-field derivations shared by the slot and kernel paths
    (icebergs.F90:3440-3491)."""
    area_g = jnp.maximum(grid.area, 1e-30)
    spread_mass = mass_on / area_g * (grid.msk > 0.)
    spread_area = area_on / area_g * (grid.msk > 0.)
    asafe = jnp.maximum(area_on, 1e-30)
    spread_uvel = jnp.where(area_on > 0., U_on / asafe, 0.)
    spread_vvel = jnp.where(area_on > 0., V_on / asafe, 0.)

    # gridded friction velocity under bergs (icebergs.F90:3459-3469)
    # corner B-grid uo/vo averaged to centers for the relative speed
    uo_c = 0.25 * (frc.uo[:-1, :-1] + frc.uo[1:, :-1] + frc.uo[:-1, 1:]
                   + frc.uo[1:, 1:])
    vo_c = 0.25 * (frc.vo[:-1, :-1] + frc.vo[1:, :-1] + frc.vo[:-1, 1:]
                   + frc.vo[1:, 1:])
    uo_p = jnp.zeros_like(spread_mass).at[1:-1, 1:-1].set(uo_c)
    vo_p = jnp.zeros_like(spread_mass).at[1:-1, 1:-1].set(vo_c)
    dvo = jnp.sqrt((spread_uvel - uo_p) ** 2 + (spread_vvel - vo_p) ** 2)
    ustar = jnp.sqrt(cfg.cdrag_icebergs * (dvo ** 2 + cfg.utide_icebergs ** 2))
    ustar_h = jnp.maximum(cfg.ustar_icebergs_bg, ustar)
    ustar_iceberg = jnp.where(spread_area == 0., 0., ustar_h)

    # mass-weighted mean berg velocity over the OWNING cell
    # (icebergs.F90:3451-3465: u_iceberg/mass with per-cell mass)
    msafe = jnp.maximum(mass_cell, 1e-30)
    u_ice = jnp.where(mass_cell > 0., mom_u / msafe, 0.)
    v_ice = jnp.where(mass_cell > 0., mom_v / msafe, 0.)

    diags = SpreadDiags(spread_mass=spread_mass, spread_area=spread_area,
                        spread_uvel=spread_uvel, spread_vvel=spread_vvel,
                        ustar_iceberg=ustar_iceberg, mass_on_ocean=mass_on,
                        u_iceberg=u_ice, v_iceberg=v_ice,
                        mass=mass_cell, virtual_area=virtual_area,
                        bergy_mass=bergy_mass, fl_bits_mass=fl_bits_mass,
                        fl_bergy_bits_mass=fl_bergy_bits_mass)
    if want_extras:
        return diags, extra_fields
    return diags
