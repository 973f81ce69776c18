"""Cell-sorted particle layout: the TPU-native neighbor structure.

Instead of bucket tables (random gathers), the whole particle slab is
physically reordered by cell key each step.  Neighbor candidates for a
berg in cell (i, j) are then three *contiguous* strips of the sorted
arrays (rows j-1, j, j+1, cells i-1..i+1), so pair-force gathers have
strong index locality and the layout maps directly onto a future Pallas
block kernel (DMA contiguous slabs into VMEM).

This plays the role of the reference's per-cell linked lists
(``bergs%list`` + ``move_berg_between_cells``,
icebergs_framework.F90:1758-1798) — rebuilt per step instead of pointer
surgery.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import IcebergsConfig
from ..grid import Grid
from .forces import NeighborTables


def lex_cell_id_order(key, id_cnt, id_ij):
    """Layout-invariant (cell, id_cnt, id_ij) lexicographic permutation.

    ONE multi-operand ``lax.sort`` (num_keys=3) — measured 1.6x faster at
    1M rows on v5e than the equivalent stable 3-pass argsort chain, with
    the identical comparator, hence bitwise-identical downstream sums.
    """
    idx = jnp.arange(key.shape[0], dtype=jnp.int32)
    _, _, _, order = jax.lax.sort((key, id_cnt, id_ij, idx), num_keys=3)
    return order


def permute_tree_rows(tree, order):
    """Permute every (N, ...) leaf of a pytree by ``order``.

    Plain per-leaf row gathers: measured 15 ms for the full 70-leaf
    BergState at 1M bergs on v5e.  (A packed-matrix variant was tried and
    rejected: (N, 1) reshape temps tile as T(8, 128) on TPU — a 128x
    padding expansion that OOMs HBM at 1M bergs.)
    """
    return jax.tree.map(lambda x: x[order], tree)


def sort_state_by_cell(st, grid: Grid, *, id_tiebreak: bool = True):
    """Reorder every state leaf by (cell key, id) — dead bergs last.

    Returns (sorted_state, cell_starts) where cell_starts[(j*nx+i)] is the
    first sorted slot of cell (i, j) (length ncells+1 exclusive end).
    Bond indices are remapped through the permutation.

    The id tiebreak gives a layout-invariant within-cell order, which
    makes strip-window pair sums (and hence interactive runs) bitwise
    reproducible across device layouts — the role played by the
    reference's id-ordered per-cell lists (parallel_reprod contract,
    icebergs_framework.F90:33; insert_berg_into_list ordering
    framework:1638-1676).
    """
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    key = jnp.where(st.alive, st.jne * nx + st.ine, ncells)
    if id_tiebreak:
        order = lex_cell_id_order(key, st.id_cnt, st.id_ij)
    else:
        order = jnp.argsort(key)             # stable
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype))

    new = permute_tree_rows(st, order)
    # remap bond partner slots through the permutation
    bidx = new.bond_idx
    remapped = jnp.where(bidx >= 0, inv[jnp.maximum(bidx, 0)], -1)
    new = new.replace(bond_idx=remapped.astype(jnp.int32))

    sorted_key = key[order]
    cell_starts = jnp.searchsorted(sorted_key,
                                   jnp.arange(ncells + 1, dtype=key.dtype))
    return new, cell_starts.astype(jnp.int32)


def strip_neighbor_tables(st, grid: Grid, cfg: IcebergsConfig,
                          cell_starts, strip_width: int = 16,
                          ncells_radius: int = 1) -> NeighborTables:
    """Candidate partners as (2r+1) contiguous strips of the sorted slab.

    For each berg: rows j-r..j+r, columns i-r..i+r are contiguous in the
    (j*nx + i) sort order, so each row contributes one strip
    [start(j', i-r), end(j', i+r)] capped at ``strip_width`` entries.
    """
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    r = ncells_radius
    N = st.capacity
    self_idx = jnp.arange(N, dtype=jnp.int32)

    cands = []
    valids = []
    for dj in range(-r, r + 1):
        jrow = st.jne + dj
        ilo = jnp.clip(st.ine - r, 0, nx - 1)
        ihi = jnp.clip(st.ine + r, 0, nx - 1)
        ok_row = (jrow >= 0) & (jrow < ny) & st.alive
        jrow_c = jnp.clip(jrow, 0, ny - 1)
        c_lo = jrow_c * nx + ilo
        c_hi = jrow_c * nx + ihi
        s = cell_starts[jnp.where(ok_row, c_lo, ncells)]
        e = cell_starts[jnp.where(ok_row, c_hi + 1, ncells)]
        # strip of candidate slots [s, e) capped at strip_width
        offs = jnp.arange(strip_width, dtype=jnp.int32)
        idx = s[:, None] + offs[None, :]
        valid = ok_row[:, None] & (idx < e[:, None])
        cands.append(jnp.where(valid, idx, 0))
        valids.append(valid)
    cand_idx = jnp.concatenate(cands, axis=1)
    valid = jnp.concatenate(valids, axis=1)
    valid = valid & (cand_idx != self_idx[:, None])
    valid = valid & st.alive[jnp.minimum(cand_idx, N - 1)]

    if cfg.iceberg_bonds_on:
        bond_idx = st.bond_idx
        is_bonded = jnp.any(
            cand_idx[:, :, None] ==
            jnp.where(bond_idx >= 0, bond_idx, -2)[:, None, :],
            axis=-1) & valid
    else:
        is_bonded = jnp.zeros_like(valid)
    return NeighborTables(cand_idx=cand_idx, cand_valid=valid,
                          is_bond_partner=is_bonded)
