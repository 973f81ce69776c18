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


# Re-sort transport selection (``packed_permute`` argument of
# :func:`sort_state_by_cell`; production default = True via
# ``IcebergsConfig.sort_packed_permute``):
#   False - one variadic lax.sort carrying every leaf as a payload
#           (~0.5 ms/column at 1M; ~50 columns -> ~45 ms, and a
#           50+-operand sort program for the compiler to chew);
#   True  - sort (key, id, id2, iota) ONLY, then apply the permutation
#           by packed (N, <=128)-lane row gathers: on TPU any (N, C)
#           f32/u32 matrix with C <= 128 is padded to 128 lanes, so ONE
#           row gather moves up to 128 columns for the price of 14
#           (~16 ms measured for a packed (N, 14) row gather at 1M).
# Bitwise identical either way (same comparator, u32 bit transport).


def stack_cols(cols):
    """``jnp.stack(cols, axis=1)`` without (N, 1) padded temps.

    ``stack``/``concatenate`` along axis 1 materialize each (N,) column
    as a (N, 1) operand, which the TPU tiles as T(8, 128) — a 128x HBM
    expansion (488 MB per column at N=1M; dozens live at the concat
    OOM'd the p3pack step at 60 GB).  A 1-D concatenate has zero
    padding, the (C*N,) -> (C, N) reshape is free in row-major layout,
    and the final (C, N) -> (N, C) transpose is one well-tiled copy.
    """
    C = len(cols)
    if C == 1:
        return cols[0][:, None]
    N = cols[0].shape[0]
    return jnp.concatenate(cols, axis=0).reshape(C, N).T


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


def sort_state_by_cell(st, grid: Grid, *, id_tiebreak: bool = True,
                       via_payloads: bool = None, static_fields=(),
                       packed_permute: bool = False,
                       pack_kernel: bool = False,
                       starts_via_scatter: bool = False):
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

    ``via_payloads`` (default: follow ``id_tiebreak``) moves every state
    leaf as a payload of ONE variadic ``lax.sort`` instead of order +
    per-leaf permutation gathers: a payload column costs ~0.5 ms at 1M
    rows on v5e vs ~10 ms for a 1M random row gather, so the full-state
    sort drops from ~1.3 s to ~45 ms — what makes the persistent-sorted
    step layout affordable.  The comparator (same 3 keys) and therefore
    the permutation and every downstream sum are bitwise identical to
    the gather path.
    """
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    key = jnp.where(st.alive, st.jne * nx + st.ine, ncells)
    if via_payloads is None:
        via_payloads = id_tiebreak
    if via_payloads and id_tiebreak:
        if packed_permute:
            new, sorted_key, order = _packed_permute_state(
                st, key, static_fields=static_fields, dead_key=ncells,
                pack_kernel=pack_kernel)
        else:
            new, sorted_key, order = _payload_sort_state(
                st, key, static_fields=static_fields, dead_key=ncells)
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype))
    else:
        if id_tiebreak:
            order = lex_cell_id_order(key, st.id_cnt, st.id_ij)
        else:
            order = jnp.argsort(key)             # stable
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype))
        new = permute_tree_rows(st, order)
        sorted_key = key[order]
    # remap bond partner slots through the permutation (skippable when
    # the table is row-uniform, i.e. bonds off: all -1 -> all -1)
    if "bond_idx" not in static_fields:
        bidx = new.bond_idx
        remapped = jnp.where(bidx >= 0, inv[jnp.maximum(bidx, 0)], -1)
        new = new.replace(bond_idx=remapped.astype(jnp.int32))

    cell_starts = starts_from_sorted_key(sorted_key, ncells,
                                         via_scatter=starts_via_scatter)
    return new, cell_starts


def starts_from_sorted_key(sorted_key, ncells: int, *,
                           via_scatter: bool = False):
    """``searchsorted(sorted_key, arange(ncells+1))``, selectable
    implementation: False = 262k binary searches over the sorted keys;
    True = scatter-min of each present key's FIRST row into its slot +
    reverse cummin filling absent keys — the exact searchsorted-left
    value either way (measured a wash on v5e)."""
    if not via_scatter:
        return jnp.searchsorted(
            sorted_key, jnp.arange(ncells + 1, dtype=sorted_key.dtype)
        ).astype(jnp.int32)
    N = sorted_key.shape[0]
    first = jnp.concatenate([
        jnp.ones((1,), bool),
        sorted_key[1:] != sorted_key[:-1]])
    idx = jnp.arange(N, dtype=jnp.int32)
    tgt = jnp.where(first, sorted_key.astype(jnp.int32), ncells + 1)
    starts = jnp.full((ncells + 2,), N, jnp.int32).at[tgt].min(
        idx, mode='drop')
    starts = jax.lax.cummin(starts[:ncells + 1], reverse=True)
    return starts


def uniform_state_fields(cfg: IcebergsConfig):
    """Field names guaranteed row-UNIFORM (same value in every slot)
    under ``cfg``, so a row permutation is the identity on them and the
    payload sort can skip their columns.

    With bonds off, nothing ever writes the 10 (N, max_bonds) bond
    tables or n_bonds — 60+ of the ~120 payload columns; with MTS off
    the fast-accel / DEM-angular / conglomerate fields stay at their
    init constants likewise.
    """
    out = []
    if not cfg.iceberg_bonds_on:
        out += ["bond_idx", "bond_id_cnt", "bond_id_ij", "bond_broken",
                "bond_length", "bond_tangd1", "bond_tangd2",
                "bond_nstress", "bond_sstress", "bond_rel_rotation",
                "n_bonds"]
    if not cfg.mts:
        out += ["axn_fast", "ayn_fast", "bxn_fast", "byn_fast",
                "conglom_id"]
        if not cfg.dem:
            out += ["ang_vel", "ang_accel", "rot"]
    return tuple(out)


def _payload_sort_state(st, key, static_fields=(), dead_key=None):
    """One (cell, id_cnt, id_ij)-keyed variadic ``lax.sort`` carrying
    every (N,) leaf (and each (N, B) bond column) as a payload.

    Returns (sorted_state, sorted_key, order).  ``order`` rides along as
    one extra int32 payload (needed for the bond-slot remap and by
    callers tracking the permutation).

    ``static_fields``: names of row-uniform leaves (see
    :func:`uniform_state_fields`) whose payload columns are skipped —
    the permutation is the identity on a uniform column, so results are
    bitwise unchanged and the variadic sort sheds ~0.5 ms per column at
    1M rows.
    """
    import dataclasses
    N = key.shape[0]
    names = [f.name for f in dataclasses.fields(st)
             if hasattr(getattr(st, f.name), "ndim")]
    skip = set(static_fields)
    # id_cnt/id_ij ARE sort keys 2-3 (their sorted values come out of
    # the same lax.sort), and alive is exactly sorted_key < dead_key —
    # none of the three needs a payload column
    skip |= {"id_cnt", "id_ij"}
    if dead_key is not None:
        skip.add("alive")
    cols = []       # (field_name, bond_col_or_None)
    pays = []
    for nm in names:
        if nm in skip:
            continue
        leaf = getattr(st, nm)
        if leaf.ndim == 1:
            cols.append((nm, None))
            pays.append(leaf)
        else:
            assert leaf.ndim == 2 and leaf.shape[0] == N, leaf.shape
            for b in range(leaf.shape[1]):
                cols.append((nm, b))
                pays.append(leaf[:, b])
    idx = jnp.arange(N, dtype=jnp.int32)
    out = jax.lax.sort((key, st.id_cnt, st.id_ij, idx) + tuple(pays),
                       num_keys=3)
    sorted_key, order = out[0], out[3]
    new_fields = {"id_cnt": out[1], "id_ij": out[2]}
    if dead_key is not None:
        new_fields["alive"] = sorted_key < dead_key
    packs = {}
    for (nm, b), p in zip(cols, out[4:]):
        if b is None:
            new_fields[nm] = p
        else:
            packs.setdefault(nm, {})[b] = p
    for nm, colmap in packs.items():
        new_fields[nm] = stack_cols(
            [colmap[b] for b in range(len(colmap))])
    return st.replace(**new_fields), sorted_key, order


def _packed_permute_state(st, key, static_fields=(), dead_key=None,
                          pack_kernel: bool = False):
    """`_payload_sort_state` semantics via key-only sort + packed gather.

    Sorts ``(key, id_cnt, id_ij, iota)`` (4 operands), then reorders all
    remaining leaves by bitcasting each (N,) column (and each (N, B)
    bond column) to u32 lanes of (N, <=128) pack matrices and applying
    ``order`` with one row gather per pack.  The TPU pads any (N, C<=128)
    matrix to 128 lanes, so a pack's gather costs the same no matter how
    many of its lanes are used — ~2 gathers cover the full BergState.

    Bitwise identical to the payload path: identical comparator and
    permutation; u32 bitcast transport is exact for f32/i32, and bool
    columns round-trip via 0/1 u32.
    """
    N = key.shape[0]
    names = [f.name for f in dataclasses.fields(st)
             if hasattr(getattr(st, f.name), "ndim")]
    skip = set(static_fields) | {"id_cnt", "id_ij"}
    if dead_key is not None:
        skip.add("alive")
    idx = jnp.arange(N, dtype=jnp.int32)
    sorted_key, sid_cnt, sid_ij, order = jax.lax.sort(
        (key, st.id_cnt, st.id_ij, idx), num_keys=3)

    cols = []      # (field_name, bond_col_or_None, dtype)
    lanes = []
    u32 = jnp.uint32
    for nm in names:
        if nm in skip:
            continue
        leaf = getattr(st, nm)
        sub = ([(None, leaf)] if leaf.ndim == 1 else
               [(b, leaf[:, b]) for b in range(leaf.shape[1])])
        for b, col in sub:
            if col.dtype == jnp.bool_:
                lanes.append(col.astype(u32))
            else:
                lanes.append(jax.lax.bitcast_convert_type(col, u32))
            cols.append((nm, b, col.dtype))

    from . import pallas_pack as _pk
    new_fields = {"id_cnt": sid_cnt, "id_ij": sid_ij}
    if dead_key is not None:
        new_fields["alive"] = sorted_key < dead_key
    packs = {}
    for lo in range(0, len(lanes), 128):
        grp = lanes[lo:lo + 128]
        C = len(grp)
        if pack_kernel:
            # Pallas block-transpose pack/unpack: XLA's padded-minor
            # relayout around the gather runs at ~20 GB/s (~45 of the
            # 51.7 ms transport at 1M; the gather itself is 6.8 ms)
            R = jnp.concatenate(grp, axis=0).reshape(C, N)
            P = _pk.pack_rows_to_lanes(R)
            S = jnp.take(P, order, axis=0)               # one row gather
            Rs = _pk.unpack_lanes_to_rows(S, C)
            col_of = lambda k: Rs[k]
        else:
            P = stack_cols(grp)                          # (N, <=128) u32
            S = jnp.take(P, order, axis=0)               # one row gather
            col_of = lambda k: S[:, k]
        for k, (nm, b, dt) in enumerate(cols[lo:lo + 128]):
            col = col_of(k)
            col = (col > 0) if dt == jnp.bool_ \
                else jax.lax.bitcast_convert_type(col, dt)
            if b is None:
                new_fields[nm] = col
            else:
                packs.setdefault(nm, {})[b] = col
    for nm, colmap in packs.items():
        new_fields[nm] = stack_cols(
            [colmap[b] for b in range(len(colmap))])
    return st.replace(**new_fields), sorted_key, order


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
