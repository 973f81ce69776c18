"""Fused interactive-force path: Pallas contact search + compact XLA eval.

Replaces ``make_ia_fn`` for the legacy contact force (icebergs.F90:479-607
dispatch, 611-804 physics) on a cell-sorted slab:

1. :func:`pallas_prepass.contact_prepass_sorted` finds engaged candidates
   with streaming strip DMAs (no HBM gathers);
2. bergs with <= 2 engaged candidates (the overwhelming majority — contact
   is sparse) are compacted and evaluated through the existing
   ``precompute_pair_data``/``eval_pair_ia`` machinery on a (cap, 2)
   partner table;
3. bergs with >= 3 candidates or in blocks the kernel could not search
   exactly go through an exact XLA fallback over their 3x3-cell strips.

The result is exact (a reorder of the same pair sums), unlike the round-1
bucket tables whose MAX_PER_CELL silently dropped candidates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from types import SimpleNamespace

from ..config import IcebergsConfig
from .accel import IA, zero_ia
from . import forces as _forces
from .pallas_prepass import contact_prepass_sorted


class FusedContactStats(NamedTuple):
    overflow: jnp.ndarray       # engaged bergs dropped by cap overflow
    n_fallback: jnp.ndarray     # bergs routed through the XLA fallback


def _compact(flag, cap):
    """Rank-compact True slots of ``flag`` into [0, cap): returns
    (sel, valid_row, n_dropped); sel ascending (sorted scatters)."""
    N = flag.shape[0]
    rank = jnp.cumsum(flag.astype(jnp.int32)) - 1
    granted = flag & (rank < cap)
    sel = jnp.zeros((cap,), jnp.int32).at[
        jnp.where(granted, rank, cap)].set(
        jnp.arange(N, dtype=jnp.int32), mode='drop')
    nact = jnp.sum(granted.astype(jnp.int32))
    valid_row = jnp.arange(cap) < nact
    dropped = jnp.sum((flag & ~granted).astype(jnp.int32))
    return sel, valid_row, dropped


def _subset_strip_tables(sub, self_ids, full, cell_starts, grid,
                         strip_width: int):
    """3x3-cell candidate strips for a compacted subset.

    Like ``sorted.strip_neighbor_tables`` but for ``sub`` rows whose
    global sorted-slab ids are ``self_ids``; candidate indices address the
    full sorted slab."""
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    N = full.capacity

    cands, valids = [], []
    truncated = jnp.zeros((), jnp.int32)
    for dj in (-1, 0, 1):
        jrow = sub.jne + dj
        ilo = jnp.clip(sub.ine - 1, 0, nx - 1)
        ihi = jnp.clip(sub.ine + 1, 0, nx - 1)
        ok_row = (jrow >= 0) & (jrow < ny) & sub.alive
        jrow_c = jnp.clip(jrow, 0, ny - 1)
        s = cell_starts[jnp.where(ok_row, jrow_c * nx + ilo, ncells)]
        e = cell_starts[jnp.where(ok_row, jrow_c * nx + ihi + 1, ncells)]
        offs = jnp.arange(strip_width, dtype=jnp.int32)
        idx = s[:, None] + offs[None, :]
        valid = ok_row[:, None] & (idx < e[:, None])
        truncated = truncated + jnp.sum(
            jnp.where(ok_row, jnp.maximum(e - s - strip_width, 0), 0))
        cands.append(jnp.where(valid, idx, 0))
        valids.append(valid)
    cand_idx = jnp.concatenate(cands, axis=1)
    valid = jnp.concatenate(valids, axis=1)
    valid = valid & (cand_idx != self_ids[:, None])
    valid = valid & full.alive[jnp.minimum(cand_idx, N - 1)]
    return cand_idx, valid, truncated


def make_ia_fn_fused2(st, grid, cfg: IcebergsConfig, *,
                      block_n: int = 256, window: int = 512,
                      contact_cap: int = 65536, fallback_cap: int = 4096,
                      fallback_strip_width: int = 64,
                      deterministic: bool = True,
                      interpret: bool = False):
    """Sortless fused interactive-force closure.

    Like :func:`make_ia_fn_fused` but the state is NEVER physically
    reordered: only the ~14 feature columns the contact search and pair
    evaluation need are gathered into cell-sorted order (one packed row
    gather instead of ~70 per-leaf gathers — the full-state sort measured
    1.5 s/step at 1M bergs on v5e), and forces scatter straight back to
    the original slots through the permutation.  Bond spring forces (if
    any) run on the original-frame bond table, so no bond_idx remap is
    needed either.

    ``deterministic=True`` orders within-cell candidates by berg id, so
    pair sums are bitwise layout-invariant (parallel_reprod).
    """
    modern = (cfg.mts or cfg.contact_distance > 0.
              or cfg.contact_spring_coef_eff != cfg.spring_coef)
    assert not modern, "fused contact path covers the legacy dispatch only"

    N = st.capacity
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    dtype = st.lon.dtype

    key = jnp.where(st.alive, st.jne * nx + st.ine, ncells)
    if deterministic:
        from .sorted import lex_cell_id_order
        order = lex_cell_id_order(key, st.id_cnt, st.id_ij)
    else:
        order = jnp.argsort(key)
    key_s = key[order]
    cell_starts = jnp.searchsorted(
        key_s, jnp.arange(ncells + 1, dtype=key_s.dtype)).astype(jnp.int32)

    # ONE packed row gather: prepass features 0-7 (incl. the key column
    # the kernel reads) + eval features 8-13
    A = st.length * st.width
    R = _forces._interaction_radius(cfg, A)
    alive_f = st.alive.astype(dtype)
    M = jnp.stack([st.lon_old, st.lat_old, R, st.fl_k, alive_f,
                   key.astype(dtype), st.uvel_old, st.vvel_old,
                   st.thickness, st.length, st.width, st.mass,
                   jnp.zeros_like(alive_f), jnp.zeros_like(alive_f)],
                  axis=-1)
    Ms = M[order]                                    # (N, 14) sorted rows

    cnt, pmin, pmax, bad_block = contact_prepass_sorted(
        st, cell_starts, grid, cfg, block_n=block_n, window=window,
        interpret=interpret, P=Ms[:, :8], key=key_s)

    alive_s = key_s < ncells
    bad = (bad_block | (cnt > 2)) & alive_s
    normal = (cnt > 0) & ~bad_block & (cnt <= 2) & alive_s

    def view(rows):
        return SimpleNamespace(
            lon_old=rows[:, 0], lat_old=rows[:, 1], fl_k=rows[:, 3],
            uvel_old=rows[:, 6], vvel_old=rows[:, 7], thickness=rows[:, 8],
            length=rows[:, 9], width=rows[:, 10], mass=rows[:, 11])

    full_view = view(Ms)

    # --- normal bergs: partner set is {pmin, pmax} ---------------------
    sel, vrow, drop_n = _compact(normal, contact_cap)
    osel = order[sel]                                # original slots
    others = jnp.stack([jnp.maximum(pmin[sel], 0),
                        jnp.maximum(pmax[sel], 0)], axis=-1)
    m = vrow[:, None] & jnp.stack(
        [pmin[sel] >= 0, (pmax[sel] >= 0) & (cnt[sel] > 1)], axis=-1)
    pd = _forces.precompute_pair_data(
        view(Ms[sel]), cfg, others, m, bonded=False, use_c_crit_dist=False,
        partner_st=full_view)

    # --- fallback bergs: exact 3x3 strip candidates --------------------
    sel_f, vrow_f, drop_f = _compact(bad, fallback_cap)
    osel_f = order[sel_f]
    ine_s = (key_s % nx).astype(jnp.int32)
    jne_s = (key_s // nx).astype(jnp.int32)
    sub_f = SimpleNamespace(ine=ine_s[sel_f], jne=jne_s[sel_f],
                            alive=alive_s[sel_f])
    cand_f, valid_f, trunc_f = _subset_strip_tables(
        sub_f, sel_f, SimpleNamespace(alive=alive_s, capacity=N),
        cell_starts, grid, fallback_strip_width)
    pd_f = _forces.precompute_pair_data(
        view(Ms[sel_f]), cfg, cand_f, valid_f & vrow_f[:, None],
        bonded=False, use_c_crit_dist=False, partner_st=full_view)

    # --- bonded spring group: original-frame bond table ----------------
    pd_b = None
    if cfg.iceberg_bonds_on:
        bond_other, bond_valid = _forces.bond_partner_table(st)
        pd_b = _forces.precompute_pair_data(
            st, cfg, bond_other, bond_valid, bonded=True,
            use_c_crit_dist=False)

    stats = FusedContactStats(
        overflow=drop_n + drop_f + trunc_f,
        n_fallback=jnp.sum(bad.astype(jnp.int32)))

    u0_fix, v0_fix = st.uvel, st.vvel

    def ia_fn(u1, v1):
        b = _forces.eval_pair_ia(pd, cfg, u0_fix[osel], v0_fix[osel],
                                 u1[osel], v1[osel])
        total = _forces.scatter_ia(b, osel, vrow, N)
        bf = _forces.eval_pair_ia(pd_f, cfg, u0_fix[osel_f], v0_fix[osel_f],
                                  u1[osel_f], v1[osel_f])
        iaf = _forces.scatter_ia(bf, osel_f, vrow_f, N)
        total = IA(*(x + y for x, y in zip(total, iaf)))
        if pd_b is not None:
            bb = _forces.eval_pair_ia(pd_b, cfg, u0_fix, v0_fix, u1, v1)
            total = IA(*(x + y for x, y in zip(total, bb)))
        return total

    return ia_fn, stats


def make_ia_fn_fused(ss, cell_starts, grid, cfg: IcebergsConfig, *,
                     block_n: int = 256, window: int = 512,
                     contact_cap: int = 65536, fallback_cap: int = 4096,
                     fallback_strip_width: int = 64,
                     interpret: bool = False):
    """Interactive-force closure over a cell-sorted state.

    Returns ``(ia_fn, stats)``.  Legacy dispatch only (no mts /
    contact_distance / separate contact spring): the legacy all-pairs
    contact group runs through the fused search; the bonded spring group
    (if any) is added through the (N, B) bond table exactly as in
    ``make_ia_fn``.
    """
    modern = (cfg.mts or cfg.contact_distance > 0.
              or cfg.contact_spring_coef_eff != cfg.spring_coef)
    assert not modern, "fused contact path covers the legacy dispatch only"

    N = ss.capacity
    u0_fix, v0_fix = ss.uvel, ss.vvel

    cnt, pmin, pmax, bad_block = contact_prepass_sorted(
        ss, cell_starts, grid, cfg, block_n=block_n, window=window,
        interpret=interpret)

    # in a bad block the kernel's cnt itself is untrustworthy (truncated
    # window can hide partners), so every alive berg there goes through
    # the exact fallback
    bad = (bad_block | (cnt > 2)) & ss.alive
    normal = (cnt > 0) & ~bad_block & (cnt <= 2) & ss.alive

    # --- normal bergs: partner set is {pmin, pmax} ---------------------
    sel, vrow, drop_n = _compact(normal, contact_cap)
    others = jnp.stack([jnp.maximum(pmin[sel], 0),
                        jnp.maximum(pmax[sel], 0)], axis=-1)
    m = vrow[:, None] & jnp.stack(
        [pmin[sel] >= 0, (pmax[sel] >= 0) & (cnt[sel] > 1)], axis=-1)
    sub = jax.tree.map(lambda x: x[sel], ss)
    pd = _forces.precompute_pair_data(
        sub, cfg, others, m, bonded=False, use_c_crit_dist=False,
        partner_st=ss)

    # --- fallback bergs: exact 3x3 strip candidates --------------------
    sel_f, vrow_f, drop_f = _compact(bad, fallback_cap)
    sub_f = jax.tree.map(lambda x: x[sel_f], ss)
    cand_f, valid_f, trunc_f = _subset_strip_tables(
        sub_f, sel_f, ss, cell_starts, grid, fallback_strip_width)
    pd_f = _forces.precompute_pair_data(
        sub_f, cfg, cand_f, valid_f & vrow_f[:, None], bonded=False,
        use_c_crit_dist=False, partner_st=ss)

    # --- bonded spring group (legacy path, icebergs.F90:698-703) -------
    pd_b = None
    if cfg.iceberg_bonds_on:
        bond_other, bond_valid = _forces.bond_partner_table(ss)
        pd_b = _forces.precompute_pair_data(
            ss, cfg, bond_other, bond_valid, bonded=True,
            use_c_crit_dist=False)

    stats = FusedContactStats(
        overflow=drop_n + drop_f + trunc_f,
        n_fallback=jnp.sum(bad.astype(jnp.int32)))

    def ia_fn(u1, v1):
        b = _forces.eval_pair_ia(pd, cfg, u0_fix[sel], v0_fix[sel],
                                 u1[sel], v1[sel])
        total = _forces.scatter_ia(b, sel, vrow, N)
        bf = _forces.eval_pair_ia(pd_f, cfg, u0_fix[sel_f], v0_fix[sel_f],
                                  u1[sel_f], v1[sel_f])
        iaf = _forces.scatter_ia(bf, sel_f, vrow_f, N)
        total = IA(*(x + y for x, y in zip(total, iaf)))
        if pd_b is not None:
            bb = _forces.eval_pair_ia(pd_b, cfg, u0_fix, v0_fix, u1, v1)
            total = IA(*(x + y for x, y in zip(total, bb)))
        return total

    return ia_fn, stats
