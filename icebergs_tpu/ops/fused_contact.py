"""Fused interactive-force path: Pallas contact search + (N, 2) XLA eval.

Replaces ``make_ia_fn`` for the legacy contact force (icebergs.F90:479-607
dispatch, 611-804 physics) on a cell-sorted view:

1. :func:`pallas_prepass.contact_prepass_sorted` finds engaged candidates
   with streaming strip DMAs (no HBM gathers);
2. bergs with <= 2 engaged candidates (the overwhelming majority — contact
   is sparse) are evaluated IN PLACE on a full-length (N, 2) partner
   table: no compaction scatter, no cap, no overflow, and the per-berg
   results come out directly in the sorted frame (round-2's
   compact-and-scatter-back design measured ~13 ms PER FIELD for the
   (cap -> 1M) scatters — the dominant cost; TPU scatters do not
   vectorize the way gathers do);
3. bergs with >= 3 candidates or in blocks the kernel could not search
   exactly go through an exact XLA fallback over their 3x3-cell strips,
   compacted to ``fallback_cap`` rows and folded back with ONE row
   GATHER through a rank table.

The result is exact (a reorder of the same pair sums), and per berg
bitwise-identical to the XLA window path.
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


def _subset_strip_tables(sub, self_ids, full_alive, capacity, cell_starts,
                         grid, strip_width: int, radius: int = 1):
    """(2*radius+1)^2-cell candidate strips for a compacted subset.

    Candidate indices address the cell-sorted slab; ``self_ids`` are the
    subset rows' sorted-slab positions."""
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    N = capacity

    cands, valids = [], []
    truncated = jnp.zeros((), jnp.int32)
    for dj in range(-radius, radius + 1):
        jrow = sub.jne + dj
        ilo = jnp.clip(sub.ine - radius, 0, nx - 1)
        ihi = jnp.clip(sub.ine + radius, 0, nx - 1)
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
    valid = valid & full_alive[jnp.minimum(cand_idx, N - 1)]
    return cand_idx, valid, truncated


_VIEW_COLS = dict(lon_old=0, lat_old=1, fl_k=3, uvel_old=6, vvel_old=7,
                  thickness=8, length=9, width=10, mass=11)


def _view(rows):
    return SimpleNamespace(**{n: rows[:, c] for n, c in _VIEW_COLS.items()})


def _pack_features(st, cfg, key):
    """(N, 14) feature matrix: prepass columns 0-7 + eval columns 8-13."""
    dtype = st.lon.dtype
    A = st.length * st.width
    R = _forces._interaction_radius(cfg, A)
    alive_f = st.alive.astype(dtype)
    return jnp.stack([st.lon_old, st.lat_old, R, st.fl_k, alive_f,
                      key.astype(dtype), st.uvel_old, st.vvel_old,
                      st.thickness, st.length, st.width, st.mass,
                      jnp.zeros_like(alive_f), jnp.zeros_like(alive_f)],
                     axis=-1)


def _sorted_contact_groups(Ms, key_s, cell_starts, grid,
                           cfg: IcebergsConfig, *, block_n, window,
                           fallback_cap, fallback_strip_width, interpret):
    """Prepass + pair-data setup on the sorted frame.

    Returns ``(eval_s, sel_f, stats)`` where
    ``eval_s(u0_s, v0_s, u1_s, v1_s) -> IA`` yields sorted-frame (N,)
    fields and ``sel_f`` are the fallback rows' sorted positions.
    """
    N = Ms.shape[0]
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny

    cnt, pmin, pmax, bad_block = contact_prepass_sorted(
        None, cell_starts, grid, cfg, block_n=block_n, window=window,
        interpret=interpret, P=Ms[:, :8], key=key_s)

    alive_s = key_s < ncells
    # in a bad block the kernel's cnt itself is untrustworthy (truncated
    # window can hide partners), so every alive berg there goes through
    # the exact fallback
    bad = (bad_block | (cnt > 2)) & alive_s
    normal = (cnt > 0) & ~bad_block & (cnt <= 2) & alive_s

    full_view = _view(Ms)

    # --- normal bergs: full-length (N, 2) partner table {pmin, pmax} ---
    others_n = jnp.stack([jnp.maximum(pmin, 0),
                          jnp.maximum(pmax, 0)], axis=-1)
    m_n = normal[:, None] & jnp.stack(
        [pmin >= 0, (pmax >= 0) & (cnt > 1)], axis=-1)
    pd_n = _forces.precompute_pair_data(
        full_view, cfg, others_n, m_n, bonded=False,
        use_c_crit_dist=False, partner_st=full_view)

    # --- fallback bergs: exact 3x3 strip candidates, compacted ---------
    sel_f, vrow_f, drop_f = _compact(bad, fallback_cap)
    ine_s = (key_s % nx).astype(jnp.int32)
    jne_s = (key_s // nx).astype(jnp.int32)
    sub_f = SimpleNamespace(ine=ine_s[sel_f], jne=jne_s[sel_f],
                            alive=alive_s[sel_f])
    cand_f, valid_f, trunc_f = _subset_strip_tables(
        sub_f, sel_f, alive_s, N, cell_starts, grid, fallback_strip_width)
    pd_f = _forces.precompute_pair_data(
        _view(Ms[sel_f]), cfg, cand_f, valid_f & vrow_f[:, None],
        bonded=False, use_c_crit_dist=False, partner_st=full_view)

    # rank table folding the compact fallback rows back: ONE row gather
    rank_f = jnp.cumsum(bad.astype(jnp.int32)) - 1
    code_f = jnp.where(bad & (rank_f < fallback_cap), rank_f,
                       fallback_cap)

    stats = FusedContactStats(
        overflow=drop_f + trunc_f,
        n_fallback=jnp.sum(bad.astype(jnp.int32)))

    def eval_s(u0_s, v0_s, u1_s, v1_s):
        bn = _forces.eval_pair_ia(pd_n, cfg, u0_s, v0_s, u1_s, v1_s)
        bf = _forces.eval_pair_ia(pd_f, cfg, u0_s[sel_f], v0_s[sel_f],
                                  u1_s[sel_f], v1_s[sel_f])

        # per-FIELD gathers, NOT one (N, 7) row gather: a (N, 7) array
        # pads its minor dim to 128 lanes on TPU, so every later column
        # read re-streams the whole 512 MB padded buffer (measured
        # +290 ms/step inside evolve)
        def fold(x, f):
            tab = jnp.concatenate(
                [jnp.where(vrow_f, f, 0.), jnp.zeros((1,), f.dtype)])
            return x + tab[code_f]
        return IA(*(fold(x, f) for x, f in zip(bn, bf)))

    return eval_s, stats


def _origin_frame_search(st, grid, cfg: IcebergsConfig, *, block_n,
                         window, radius=1, exclude_same_group=False,
                         deterministic=True, interpret=False):
    """Prepass search with results mapped to the ORIGINAL slot frame.

    The sorted frame exists only inside the kernel; partner slots and
    counts come back through one build-time inverse-permutation mapping,
    so pair evaluation runs directly on the original state and the
    per-eval sorted<->orig permutation gathers (each a ~10 ms 1M-table
    gather on v5e, x9 per eval in the previous design) disappear.

    Returns (cnt_o, p1_o, p2_o, bad_o, order, key_s, cell_starts) —
    partner slots p1_o/p2_o address the ORIGINAL slab (-1 = none).
    """
    N = st.capacity
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    dtype = st.lon.dtype

    key = jnp.where(st.alive, st.jne * nx + st.ine, ncells)
    idx = jnp.arange(N, dtype=jnp.int32)
    if deterministic:
        _, _, _, order = jax.lax.sort(
            (key, st.id_cnt, st.id_ij, idx), num_keys=3)
    else:
        order = jnp.argsort(key)
    _, inv = jax.lax.sort((order, idx), num_keys=1)
    key_s = key[order]
    cell_starts = jnp.searchsorted(
        key_s, jnp.arange(ncells + 1, dtype=key_s.dtype)).astype(jnp.int32)

    # prepass features only (8 cols; eval reads the original state)
    A = st.length * st.width
    R = _forces._interaction_radius(cfg, A)
    alive_f = st.alive.astype(dtype)
    g6 = (st.conglom_id.astype(dtype) if exclude_same_group
          else jnp.zeros_like(alive_f))
    P = jnp.stack([st.lon_old, st.lat_old, R, st.fl_k, alive_f,
                   key.astype(dtype), g6, jnp.zeros_like(alive_f)],
                  axis=-1)[order]

    cnt, pmin, pmax, bad_block = contact_prepass_sorted(
        None, cell_starts, grid, cfg, block_n=block_n, window=window,
        interpret=interpret, P=P, key=key_s, radius=radius,
        exclude_same_group=exclude_same_group)

    alive_s = key_s < ncells
    bad = (bad_block | (cnt > 2)) & alive_s
    normal = (cnt > 0) & ~bad_block & (cnt <= 2) & alive_s

    # build-time frame mapping: partner sorted-slot -> original slot,
    # then everything -> original rows
    p1 = jnp.where(normal & (pmin >= 0), order[jnp.maximum(pmin, 0)], -1)
    p2 = jnp.where(normal & (pmax >= 0) & (cnt > 1),
                   order[jnp.maximum(pmax, 0)], -1)
    cnt_o = cnt[inv]
    p1_o = p1[inv]
    p2_o = p2[inv]
    bad_o = bad[inv]
    return cnt_o, p1_o, p2_o, bad_o, order, key_s, cell_starts


def _origin_frame_groups(st, grid, cfg: IcebergsConfig, *, block_n,
                         window, fallback_cap, fallback_strip_width,
                         radius=1, exclude_same_group=False,
                         use_c_crit_dist=False, deterministic=True,
                         interpret=False):
    """Normal (N, 2) + compact fallback pair data on the ORIGINAL frame.

    Returns (pd_n, pd_f, sel_f, vrow_f, code_f, stats)."""
    N = st.capacity
    cnt_o, p1_o, p2_o, bad_o, order, key_s, cell_starts = \
        _origin_frame_search(st, grid, cfg, block_n=block_n,
                             window=window, radius=radius,
                             exclude_same_group=exclude_same_group,
                             deterministic=deterministic,
                             interpret=interpret)

    # (2, N) transposed partner table: minor dim N keeps every pair slab
    # and gather index unpadded on TPU (a (N, 2) layout tile-pads 2 ->
    # 128 lanes: 512 MB per slab at 1M bergs)
    others_n = jnp.stack([jnp.maximum(p1_o, 0),
                          jnp.maximum(p2_o, 0)], axis=0)
    m_n = jnp.stack([p1_o >= 0, p2_o >= 0], axis=0)
    pd_n = _forces.precompute_pair_data_T(
        st, cfg, others_n, m_n, bonded=False,
        use_c_crit_dist=use_c_crit_dist)

    pd_f, sel_f, vrow_f, code_f, stats = _fallback_group(
        st, bad_o, order, key_s, cell_starts, grid, cfg,
        fallback_cap=fallback_cap,
        fallback_strip_width=fallback_strip_width, radius=radius,
        exclude_same_group=exclude_same_group,
        use_c_crit_dist=use_c_crit_dist)
    return pd_n, pd_f, sel_f, vrow_f, code_f, stats


def _fallback_group(st, bad_o, order, key_s, cell_starts, grid, cfg, *,
                    fallback_cap, fallback_strip_width, radius,
                    exclude_same_group, use_c_crit_dist):
    """Exact XLA fallback for >=3-partner / bad-block rows: compact in
    the original frame; candidate strips address the sorted slab and map
    through ``order``."""
    N = st.capacity
    sel_f, vrow_f, drop_f = _compact(bad_o, fallback_cap)
    sub_f = SimpleNamespace(ine=st.ine[sel_f], jne=st.jne[sel_f],
                            alive=st.alive[sel_f] & vrow_f)
    cand_s, valid_f, trunc_f = _subset_strip_tables(
        sub_f, jnp.full_like(sel_f, -1), key_s < (grid.nx * grid.ny), N,
        cell_starts, grid, fallback_strip_width, radius=radius)
    cand_f = (jnp.minimum(cand_s, N - 1) if order is None
              else order[jnp.minimum(cand_s, N - 1)])
    valid_f = valid_f & (cand_f != sel_f[:, None])
    if exclude_same_group:
        valid_f = valid_f & (st.conglom_id[cand_f]
                             != st.conglom_id[sel_f][:, None])
    pd_f = _forces.precompute_pair_data(
        _take_rows(st, sel_f), cfg, cand_f, valid_f & vrow_f[:, None],
        bonded=False, use_c_crit_dist=use_c_crit_dist, partner_st=st)

    rank_f = jnp.cumsum(bad_o.astype(jnp.int32)) - 1
    code_f = jnp.where(bad_o & (rank_f < fallback_cap), rank_f,
                       fallback_cap)

    stats = FusedContactStats(
        overflow=drop_f + trunc_f,
        n_fallback=jnp.sum(bad_o.astype(jnp.int32)))
    return pd_f, sel_f, vrow_f, code_f, stats


def _scatter_fold(sel_f, vrow_f, capacity):
    """Fold a compact fallback-group result back into full-length IA
    fields: scatter into a ZEROS delta + elementwise add — one tiny
    (cap-row) scatter per field instead of a full (N,) rank-table
    gather (the gathers measured ~5-6 ms each at 1M bergs on v5e;
    16 of them made the old fold ~89 ms/step).  The ``x + delta`` add
    keeps the gather fold's elementwise fusion shape (incl. its x+0.0
    normalization) on every device layout.

    Callers must pin the compact eval with ``optimization_barrier``
    first: fallback membership follows tile geometry (bad blocks), so
    an unpinned fusion wobble in the eval breaks cross-layout bitwise
    invariance."""
    tgt = jnp.where(vrow_f, sel_f, capacity)

    def fold(x, f):
        delta = jnp.zeros_like(x).at[tgt].add(
            jnp.where(vrow_f, f, 0.), mode='drop')
        return x + delta
    return fold


_TAKE_FIELDS = ("lon_old", "lat_old", "fl_k", "uvel_old", "vvel_old",
                "thickness", "length", "width", "mass")


def _take_rows(st, sel):
    """Compact primary-row view for precompute_pair_data (one packed
    row gather for the 9 fields it reads)."""
    packed = jnp.stack([getattr(st, f) for f in _TAKE_FIELDS], axis=-1)
    rows = packed[sel]
    return SimpleNamespace(**{f: rows[:, k]
                              for k, f in enumerate(_TAKE_FIELDS)})


def make_ia_fn_fused2(st, grid, cfg: IcebergsConfig, *,
                      block_n: int = 256, window: int = 512,
                      contact_cap: int = None, fallback_cap: int = 4096,
                      fallback_strip_width: int = 64,
                      deterministic: bool = True,
                      interpret: bool = None):
    """Sortless fused interactive-force closure (original slot order).

    The state is NEVER physically reordered: the Pallas search runs on a
    sorted VIEW; partner slots map back to the original frame once at
    build time, and pair evaluation runs cap-free on the original state
    — no per-eval permutation gathers at all.  Bond spring forces (if
    any) run on the original-frame bond table.

    ``deterministic=True`` orders within-cell candidates by berg id, so
    pair sums are bitwise layout-invariant (parallel_reprod).
    ``contact_cap`` is accepted for API compatibility and ignored — the
    (N, 2) normal group is cap-free.
    """
    modern = (cfg.mts or cfg.contact_distance > 0.
              or cfg.contact_spring_coef_eff != cfg.spring_coef)
    assert not modern, "fused contact path covers the legacy dispatch only"

    pd_n, pd_f, sel_f, vrow_f, code_f, stats = _origin_frame_groups(
        st, grid, cfg, block_n=block_n, window=window,
        fallback_cap=fallback_cap,
        fallback_strip_width=fallback_strip_width,
        deterministic=deterministic, interpret=interpret)

    # --- bonded spring group: original-frame bond table ----------------
    pd_b = None
    if cfg.iceberg_bonds_on:
        # transposed (B, N) bond table: pair slabs stay unpadded (an
        # (N, B<=128) f32 slab is 512 MB at 1M bergs)
        bond_other_T = st.bond_idx.T
        other_T = jnp.maximum(bond_other_T, 0)
        valid_T = (bond_other_T >= 0) & st.alive[None, :] \
            & st.alive[other_T]
        pd_b = _forces.precompute_pair_data_T(
            st, cfg, other_T, valid_T, bonded=True,
            use_c_crit_dist=False)

    u0_fix, v0_fix = st.uvel, st.vvel

    fold = _scatter_fold(sel_f, vrow_f, st.capacity)

    def ia_fn(u1, v1):
        bn = _forces.eval_pair_ia_T(pd_n, cfg, u0_fix, v0_fix, u1, v1)
        bf = _forces.eval_pair_ia(pd_f, cfg, u0_fix[sel_f],
                                  v0_fix[sel_f], u1[sel_f], v1[sel_f])
        bf = jax.lax.optimization_barrier(bf)
        total = IA(*(fold(x, f) for x, f in zip(bn, bf)))
        if pd_b is not None:
            bb = _forces.eval_pair_ia_T(pd_b, cfg, u0_fix, v0_fix, u1, v1)
            total = IA(*(x + y for x, y in zip(total, bb)))
        return total

    return ia_fn, stats


def _origin_frame_groups_extract(st, grid, cfg: IcebergsConfig, *,
                                 block_n, window, fallback_cap,
                                 fallback_strip_width, radius=1,
                                 pt_via_sort_payloads=False,
                                 presorted=False, cell_starts=None,
                                 exclude_same_group=False,
                                 use_c_crit_dist=False,
                                 with_partner_slots=False,
                                 epilogue=False,
                                 interpret=False):
    """Round-3 search: merged Pallas prepass + in-kernel partner-feature
    extraction (selection matmuls on the MXU).

    Replaces the per-pair XLA gathers of the <=2-partner normal group
    entirely: the kernel returns the 6 eval features (lon, lat, u, v,
    area, mass) of both partners per sorted slot, and only 13 result
    rows map back to the origin frame.  No (N, F) padded buffers
    anywhere: the feature matrix is a (16, N) transposed stack built
    from per-field sorted gathers (or sort payloads).
    """
    from .pallas_prepass import (contact_extract_sorted,
                                 contact_extract_sorted_p,
                                 contact_extract_sorted_g, EX_CNT,
                                 EX_VMIN, EX_VMAX, EX_F1,
                                 EX_F2, EX_IAX, EX_IAY, EX_EPI_NP,
                                 PT_NF, PT_NEVAL, PT_LON, PT_LAT,
                                 PT_U, PT_V, PT_AREA, PT_MASS, PT_RAD,
                                 PT_ALIVE, PT_KEY, PT_GRP, PT_FLK)
    import math as _math

    N = st.capacity
    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    dtype = st.lon.dtype

    key = jnp.where(st.alive, st.jne * nx + st.ine, ncells)
    idx = jnp.arange(N, dtype=jnp.int32)
    A = st.length * st.width
    R = _forces._interaction_radius(cfg, A)
    alive_f = st.alive.astype(dtype)
    # PT layout v2 (pallas_prepass.PT_*): eval rows 0-5 = lon, lat, u,
    # v, AREA, mass; engagement-only rows 8+ = rad, alive, key, fl_k
    feats = [st.lon_old, st.lat_old, st.uvel_old, st.vvel_old, A,
             st.mass, R, alive_f, key.astype(dtype), st.fl_k]
    slots = [PT_LON, PT_LAT, PT_U, PT_V, PT_AREA, PT_MASS,
             PT_RAD, PT_ALIVE, PT_KEY, PT_FLK]
    if exclude_same_group:
        feats.append(st.conglom_id.astype(dtype))
        slots.append(PT_GRP)
    if presorted:
        # persistent sorted layout: the slab is already physically
        # (cell, id)-ordered (ops/sorted.sort_state_by_cell), so the
        # search needs NO sort and NO origin-frame inverse mapping —
        # rows killed since the sort carry key=ncells in place and die
        # on the kernel's alive/key masks, and the carried cell_starts
        # stay valid (deaths only over-cover windows, never move rows)
        order = None
        inv = None
        feats_s = feats
        key_s = key
        if cell_starts is None:
            cell_starts = jnp.searchsorted(
                key_s, jnp.arange(ncells + 1, dtype=key_s.dtype)
            ).astype(jnp.int32)
    else:
        if pt_via_sort_payloads:
            # one variadic sort carries the features into sorted order
            # (merge-network data movement instead of 10 random gathers)
            sorted_all = jax.lax.sort(
                (key, st.id_cnt, st.id_ij, idx) + tuple(feats), num_keys=3)
            order = sorted_all[3]
            feats_s = list(sorted_all[4:])
        else:
            _, _, _, order = jax.lax.sort(
                (key, st.id_cnt, st.id_ij, idx), num_keys=3)
            feats_s = [f[order] for f in feats]
        _, inv = jax.lax.sort((order, idx), num_keys=1)
        key_s = key[order]
        cell_starts = jnp.searchsorted(
            key_s, jnp.arange(ncells + 1, dtype=key_s.dtype)
        ).astype(jnp.int32)

    rows = [jnp.zeros((N,), dtype)] * PT_NF
    for r, f in zip(slots, feats_s):
        rows[r] = f
    PT = jnp.stack(rows, axis=0)

    extract = (contact_extract_sorted_g if cfg.extract_impl == "gathered"
               else contact_extract_sorted_p
               if cfg.extract_impl == "pipelined"
               else contact_extract_sorted)
    ekw = {}
    if epilogue:
        assert cfg.extract_impl == "gathered", \
            "contact_epilogue needs the gathered extraction kernel"
        ekw = dict(epilogue=True)
    out, bad_block = extract(
        PT, key_s, cell_starts, grid, cfg, block_n=block_n,
        window=window, radius=radius,
        exclude_same_group=exclude_same_group, interpret=interpret,
        **ekw)

    cnt_s = out[EX_CNT].astype(jnp.int32)
    alive_s = key_s < ncells
    bad_s = (bad_block | (cnt_s > 2)) & alive_s

    p1_s = p2_s = None
    if with_partner_slots:
        # min/max engaged SORTED slots -> ORIGIN partner slots (the MTS
        # convergence loop refreshes partner velocities through them)
        i1 = jnp.clip(out[EX_VMIN], 0, N - 1).astype(jnp.int32)
        i2 = jnp.clip(out[EX_VMAX], 0, N - 1).astype(jnp.int32)
        p1_s = jnp.where(cnt_s >= 1,
                         i1 if order is None else order[i1], 0)
        p2_s = jnp.where(cnt_s >= 2,
                         i2 if order is None else order[i2], 0)

    # origin-frame mapping of the result rows: identity when presorted;
    # with cfg.pack_kernel ONE packed u32 row gather through the Pallas
    # block-transpose transport (the 13-16 separate (N,) inverse
    # gathers measured ~5-6 ms EACH at 1M on v5e); per-row gathers
    # otherwise
    if epilogue:
        frows = [out[EX_F1 + k] for k in range(EX_EPI_NP)] \
            + [out[EX_F2 + k] for k in range(EX_EPI_NP)] \
            + [out[EX_IAX], out[EX_IAY]]
    else:
        frows = [out[EX_F1 + k] for k in range(PT_NEVAL)] \
            + [out[EX_F2 + k] for k in range(PT_NEVAL)]
    if inv is None:
        cnt_o, bad_o = cnt_s, bad_s
        p1_o, p2_o = p1_s, p2_s
        frows_o = frows
    elif cfg.pack_kernel:
        from . import pallas_pack as _pk
        u32 = jnp.uint32
        lanes = [cnt_s.astype(u32), bad_s.astype(u32)]
        if with_partner_slots:
            lanes += [p1_s.astype(u32), p2_s.astype(u32)]
        lanes += [jax.lax.bitcast_convert_type(f, u32) for f in frows]
        Rm = jnp.concatenate(lanes, axis=0).reshape(len(lanes), N)
        Sm = jnp.take(_pk.pack_rows_to_lanes(Rm), inv, axis=0)
        Ro = _pk.unpack_lanes_to_rows(Sm, len(lanes))
        cnt_o = Ro[0].astype(jnp.int32)
        bad_o = Ro[1] > 0
        k0 = 2
        if with_partner_slots:
            p1_o = Ro[2].astype(jnp.int32)
            p2_o = Ro[3].astype(jnp.int32)
            k0 = 4
        else:
            p1_o = p2_o = None
        frows_o = [jax.lax.bitcast_convert_type(Ro[k0 + k], dtype)
                   for k in range(len(frows))]
    else:
        cnt_o = cnt_s[inv]
        bad_o = bad_s[inv]
        p1_o = None if p1_s is None else p1_s[inv]
        p2_o = None if p2_s is None else p2_s[inv]
        frows_o = [f[inv] for f in frows]

    # alive in the origin frame IS st.alive (key < ncells <=> alive)
    normal_o = (cnt_o > 0) & ~bad_o & st.alive
    m_n = jnp.stack([normal_o, normal_o & (cnt_o >= 2)], axis=0)
    other_T = (jnp.stack([p1_o, p2_o], axis=0)
               if with_partner_slots else None)

    if epilogue:
        # the kernel already ran the velocity-independent precompute
        # (geometry, exact engagement, spring sums, projections, mass
        # ratio): assemble PairData directly — no XLA pd chain at all
        assert not use_c_crit_dist
        def prow(k):
            return jnp.stack([frows_o[k], frows_o[EX_EPI_NP + k]],
                             axis=0)
        u2, v2 = prow(0), prow(1)
        P11, P12, P22 = prow(2), prow(3), prow(4)
        mm, ex = prow(5), prow(6)
        spring = cfg.contact_spring_coef_eff
        if cfg.critical_interaction_damping_on:
            rad_d = 2. * _math.sqrt(spring)
            tan_d = (2. * _math.sqrt(spring) / 4.
                     if cfg.tang_crit_int_damp_on
                     else cfg.tangental_damping_coef)
        else:
            rad_d = cfg.radial_damping_coef
            tan_d = cfg.tangental_damping_coef
        pd_n = _forces.PairData(
            active=m_n & (ex > 0.5),
            IA_x=jnp.where(normal_o, frows_o[2 * EX_EPI_NP], 0.),
            IA_y=jnp.where(normal_o, frows_o[2 * EX_EPI_NP + 1], 0.),
            P11=P11, P12=P12, P22=P22,
            crad=rad_d * mm, ctan=tan_d * mm,
            u2=u2, v2=v2, other=other_T)
    else:
        names = ("lon2", "lat2", "u2", "v2", "A2g", "M2g")
        assert len(names) == PT_NEVAL
        partner_fields = {
            nm: jnp.stack([frows_o[k], frows_o[PT_NEVAL + k]], axis=0)
            for k, nm in enumerate(names)}

        pd_n = _forces.precompute_pair_data_T(
            st, cfg, other_T, m_n, bonded=False,
            use_c_crit_dist=use_c_crit_dist,
            partner_fields=partner_fields)

    pd_f, sel_f, vrow_f, code_f, stats = _fallback_group(
        st, bad_o, order, key_s, cell_starts, grid, cfg,
        fallback_cap=fallback_cap,
        fallback_strip_width=fallback_strip_width, radius=radius,
        exclude_same_group=exclude_same_group,
        use_c_crit_dist=use_c_crit_dist)
    return pd_n, pd_f, sel_f, vrow_f, code_f, stats


def make_ia_fn_fused3(st, grid, cfg: IcebergsConfig, *,
                      block_n: int = 256, window: int = 512,
                      contact_cap: int = None, fallback_cap: int = 4096,
                      fallback_strip_width: int = 64,
                      deterministic: bool = True,
                      pt_via_sort_payloads: bool = True,
                      presorted: bool = False, cell_starts=None,
                      fallback_mode: str = "full",
                      interpret: bool = None):
    """Fused interactive-force closure via the extraction kernel.

    ``presorted=True``: the state is already physically (cell, id)
    sorted (ops/sorted.sort_state_by_cell) — the search skips its
    payload sort AND the 13 origin-frame inverse gathers entirely
    (``cell_starts`` from the sort may be passed to skip the
    searchsorted too).  Per-berg results are identical; only the frame
    the closure reads/writes is the sorted one.

    Same contract and bitwise-identical results as
    :func:`make_ia_fn_fused2` (partner-1/2 = min/max engaged sorted
    slot; features extracted in-kernel are the exact field values), but
    the normal group needs no partner gathers and no (N, F) padded
    buffers.  ``deterministic`` must stay True (the sorted order IS the
    id-tiebreak order).
    """
    modern = (cfg.mts or cfg.contact_distance > 0.
              or cfg.contact_spring_coef_eff != cfg.spring_coef)
    assert not modern, "fused contact path covers the legacy dispatch only"
    assert deterministic, "fused3 search is deterministic by construction"

    pd_n, pd_f, sel_f, vrow_f, code_f, stats = _origin_frame_groups_extract(
        st, grid, cfg, block_n=block_n, window=window,
        fallback_cap=fallback_cap,
        fallback_strip_width=fallback_strip_width,
        pt_via_sort_payloads=pt_via_sort_payloads,
        presorted=presorted, cell_starts=cell_starts,
        epilogue=(cfg.contact_epilogue
                  and cfg.extract_impl == "gathered"),
        interpret=interpret)

    pd_b = None
    if cfg.iceberg_bonds_on:
        # transposed (B, N) bond table: pair slabs stay unpadded (an
        # (N, B<=128) f32 slab is 512 MB at 1M bergs)
        bond_other_T = st.bond_idx.T
        other_T = jnp.maximum(bond_other_T, 0)
        valid_T = (bond_other_T >= 0) & st.alive[None, :] \
            & st.alive[other_T]
        pd_b = _forces.precompute_pair_data_T(
            st, cfg, other_T, valid_T, bonded=True,
            use_c_crit_dist=False)

    u0_fix, v0_fix = st.uvel, st.vvel

    def ia_fn(u1, v1):
        bn = _forces.eval_pair_ia_T(pd_n, cfg, u0_fix, v0_fix, u1, v1)
        if fallback_mode == "off":
            # MEASUREMENT ONLY: >=3-partner rows get ZERO interactive
            # force (drops physics); isolates the fallback group's cost
            total = IA(*bn)
        else:
            bf = _forces.eval_pair_ia(pd_f, cfg, u0_fix[sel_f],
                                      v0_fix[sel_f], u1[sel_f],
                                      v1[sel_f])
            # pin the fallback eval's rounding: its consumers (scatter
            # vs rank-table) otherwise move XLA's fusion boundary and
            # shift bf by ~1 ulp — and fallback MEMBERSHIP is
            # layout-dependent (bad blocks follow tile geometry), so an
            # unpinned wobble breaks cross-layout bitwise invariance
            bf = jax.lax.optimization_barrier(bf)
            if fallback_mode == "build_only":
                # MEASUREMENT ONLY: keep the fallback build + eval live
                # but skip the per-field rank-table FOLD gathers
                eps = 1e-38 * (bf[0][:1].sum() + bf[1][:1].sum())
                total = IA(bn[0] + eps, *bn[1:])
            elif fallback_mode == "gather_fold":
                # the round-3 rank-table fold: one (N,) gather per IA
                # field per eval — measured ~89 ms/step at 1M (16
                # gathers); kept for A/B only
                def fold(x, f):
                    tab = jnp.concatenate(
                        [jnp.where(vrow_f, f, 0.),
                         jnp.zeros((1,), f.dtype)])
                    return x + tab[code_f]
                total = IA(*(fold(x, f) for x, f in zip(bn, bf)))
            else:
                # production fold: see _scatter_fold (zeros-delta
                # scatter + elementwise add; ~89 ms/step of rank-table
                # gathers removed, session-14c)
                fold = _scatter_fold(sel_f, vrow_f, st.capacity)
                total = IA(*(fold(x, f) for x, f in zip(bn, bf)))
        if pd_b is not None:
            bb = _forces.eval_pair_ia_T(pd_b, cfg, u0_fix, v0_fix, u1, v1)
            total = IA(*(x + y for x, y in zip(total, bb)))
        return total

    return ia_fn, stats


def make_ia_fn_fused_mts1(st, grid, cfg: IcebergsConfig, *,
                          block_n: int = 256, window: int = 512,
                          fallback_cap: int = 4096,
                          fallback_strip_width: int = 64,
                          radius: int = None,
                          use_extract: bool = True,
                          interpret: bool = None):
    """Fused MTS Part-1 cross-conglomerate collision search (sortless).

    The Part-1 slow-force group (accel_mts mts_part=1 -> the
    cross-conglomerate branch of interactive_force, icebergs.F90:565-607)
    with crit = max(R1+R2, contact_distance) and the contact spring —
    searched by the Pallas prepass with the conglomerate filter IN the
    kernel (group id on packed feature column 6) over
    (2*radius+1)^2 cells, evaluated cap-free on an ORIGINAL-frame (N, 2)
    partner table with the exact strip fallback for >= 3-partner rows.

    Returns ``(refresh, stats)`` where ``refresh(s) -> ia_fn``
    regathers partner *_old velocities from ``s`` into the frozen pair
    geometry (the force-convergence loop's contract,
    icebergs.F90:6663-6743).
    """
    assert cfg.mts, "mts1 fused path is the MTS Part-1 collision group"
    if radius is None:
        radius = _forces.neighbor_radius(grid, cfg)

    if use_extract:
        # round-5 port of the headline's extraction search to the MTS
        # Part-1 group (VERDICT r4 #2): partner features come out of
        # the kernel (no 9 per-field (2, N) partner gathers), results
        # ride ONE packed inverse transport under cfg.pack_kernel, and
        # partner SLOTS are extracted so the convergence loop's
        # velocity refresh keeps its frozen-geometry contract
        pd_n, pd_f, sel_f, vrow_f, code_f, stats = \
            _origin_frame_groups_extract(
                st, grid, cfg, block_n=block_n, window=window,
                fallback_cap=fallback_cap,
                fallback_strip_width=fallback_strip_width,
                radius=radius, exclude_same_group=True,
                use_c_crit_dist=False, with_partner_slots=True,
                pt_via_sort_payloads=True, interpret=interpret)
    else:
        pd_n, pd_f, sel_f, vrow_f, code_f, stats = _origin_frame_groups(
            st, grid, cfg, block_n=block_n, window=window,
            fallback_cap=fallback_cap,
            fallback_strip_width=fallback_strip_width, radius=radius,
            exclude_same_group=True, use_c_crit_dist=False,
            interpret=interpret)

    u0_fix, v0_fix = st.uvel, st.vvel
    fold = _scatter_fold(sel_f, vrow_f, st.capacity)

    # packed refresh only on a real TPU backend: in interpret mode the
    # pack kernels inside the convergence while_loop lower to nested
    # scans whose CPU compile/runtime explodes (observed: minutes per
    # MTS test)
    from .pallas_pack import _auto_interpret as _ai
    pack_refresh = cfg.pack_kernel and not _ai(interpret)

    def refresh(s):
        pdn = _forces.refresh_pair_velocities(
            pd_n, s, pack_kernel=pack_refresh)
        # the fallback strips are (cap, (2r+1)*W) — >1M lookups per
        # field at the production sizes, refreshed EVERY convergence
        # iteration: same packed transport
        pdf = _forces.refresh_pair_velocities(
            pd_f, s, pack_kernel=pack_refresh)

        def ia_fn(u1, v1):
            bn = _forces.eval_pair_ia_T(pdn, cfg, u0_fix, v0_fix, u1, v1)
            bf = _forces.eval_pair_ia(pdf, cfg, u0_fix[sel_f],
                                      v0_fix[sel_f], u1[sel_f],
                                      v1[sel_f])
            bf = jax.lax.optimization_barrier(bf)
            return IA(*(fold(x, f) for x, f in zip(bn, bf)))

        return ia_fn

    return refresh, stats


def make_ia_fn_fused(ss, cell_starts, grid, cfg: IcebergsConfig, *,
                     block_n: int = 256, window: int = 512,
                     contact_cap: int = None, fallback_cap: int = 4096,
                     fallback_strip_width: int = 64,
                     interpret: bool = None):
    """Interactive-force closure over a cell-sorted state.

    Returns ``(ia_fn, stats)``.  Legacy dispatch only (no mts /
    contact_distance / separate contact spring): the legacy all-pairs
    contact group runs through the fused search; the bonded spring group
    (if any) is added through the (N, B) bond table exactly as in
    ``make_ia_fn``.  ``contact_cap`` is ignored (cap-free normal group).
    """
    modern = (cfg.mts or cfg.contact_distance > 0.
              or cfg.contact_spring_coef_eff != cfg.spring_coef)
    assert not modern, "fused contact path covers the legacy dispatch only"

    nx, ny = grid.nx, grid.ny
    ncells = nx * ny
    key_s = jnp.where(ss.alive, ss.jne * nx + ss.ine, ncells)
    Ms = _pack_features(ss, cfg, key_s)

    eval_s, stats = _sorted_contact_groups(
        Ms, key_s, cell_starts, grid, cfg, block_n=block_n, window=window,
        fallback_cap=fallback_cap,
        fallback_strip_width=fallback_strip_width, interpret=interpret)

    pd_b = None
    if cfg.iceberg_bonds_on:
        bond_other, bond_valid = _forces.bond_partner_table(ss)
        pd_b = _forces.precompute_pair_data(
            ss, cfg, bond_other, bond_valid, bonded=True,
            use_c_crit_dist=False)

    u0_fix, v0_fix = ss.uvel, ss.vvel

    def ia_fn(u1, v1):
        total = eval_s(u0_fix, v0_fix, u1, v1)
        if pd_b is not None:
            bb = _forces.eval_pair_ia(pd_b, cfg, u0_fix, v0_fix, u1, v1)
            total = IA(*(x + y for x, y in zip(total, bb)))
        return total

    return ia_fn, stats
