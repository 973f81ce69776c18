"""VMEM-resident Part-3 substep kernel (ops/dem_vmem.py) vs the lax.scan
reference path — same physics (calculate_force_dem icebergs.F90:957-1242,
broken-bond contact 806-956/1789-1792, fast-loop sequence 6790-6974)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.ops import forces
from icebergs_tpu.ops.dem_vmem import (analyze_bond_deltas,
                                       pack_conglomerates_blocked)
from icebergs_tpu.mts import evolve_icebergs_mts


def _cfg(**kw):
    base = dict(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=-55.0,
        dt=120.0, Runge_not_Verlet=False,   # dtf=10s: inside the
        # explicit stability rule 0.3/sqrt(spring_coef)~11.7s — an unstable
        # dtf amplifies Mosaic-vs-XLA fp reordering exponentially
        mts=True, mts_sub_steps=12, explicit_inner_mts=True,
        dem=True, dem_spring_coef=5.e6, dem_damping_coef=1.0, poisson=0.3,
        interactive_icebergs_on=True, iceberg_bonds_on=True,
        spring_coef=0.00065359477124183, contact_spring_coef=1.e-7,
        contact_distance=4.e3, force_convergence=True,
        convergence_tolerance=1e-4,
        use_broken_bonds_for_substep_contact=True,
        break_bonds_on_sub_steps=True,
        fracture_criterion="stress", frac_thres_scaling=1.,
        frac_thres_n=18.e3, frac_thres_t=100.e3,
        constant_interaction_LW=True, constant_length=3000.,
        constant_width=3000.,
        manually_initialize_bonds=True,
        manually_initialize_bonds_from_radii=True,
        allow_bergs_to_roll=False, max_bonds=6,
        hexagonal_icebergs=False)
    base.update(kw)
    return ibt.IcebergsConfig(**base).normalized(warn=False)


def _world(cfg, jitter=40.0, seed=3, break_first=True):
    r = 1500.0
    side = 5
    per = side * side
    NX = NY = 64
    DXY = 7000.0
    px, py = np.meshgrid(np.arange(side) * 2 * r, np.arange(side) * 2 * r,
                         indexing="ij")
    px, py = px.ravel(), py.ravel()
    rng = np.random.RandomState(seed)
    lon, lat, cong = [], [], []
    for u in range(3):
        ox = 2 * DXY + u * 16 * r
        oy = 2 * DXY + (u % 2) * 14 * r
        lon.append(px + ox + rng.uniform(-jitter, jitter, per))
        lat.append(py + oy + rng.uniform(-jitter, jitter, per))
        cong.append(np.full(per, u + 1))
    lon = np.concatenate(lon)
    lat = np.concatenate(lat)
    cong = np.concatenate(cong)
    n = lon.size
    cap = 128
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.25, vo=0.05, ua=5.0, sst=-2.0,
                              sss=34.0)
    st = ibt.create_bergs(cap, lon=lon, lat=lat,
                          uvel=rng.uniform(-0.3, 0.3, n),
                          vvel=rng.uniform(-0.3, 0.3, n),
                          mass=850. * 200. * (2 * r) ** 2, thickness=200.,
                          width=2 * r, length=2 * r, mass_scaling=1.0,
                          id_cnt=np.arange(n) + 1, max_bonds=6)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj,
                    conglom_id=jnp.asarray(np.concatenate(
                        [cong, np.zeros(cap - n)]).astype(np.int32)))
    st = forces.initialize_bonds_host(st, cfg)
    if break_first:
        bb = np.asarray(st.bond_broken).copy()
        bi = np.asarray(st.bond_idx)
        p = bi[0, 0]
        bb[0, 0] = 1
        for s_ in range(6):
            if bi[p, s_] == 0:
                bb[p, s_] = 1
        st = st.replace(bond_broken=jnp.asarray(bb))
    st = forces.count_bonds(st)
    return grid, frc, st


_CHECK = ("lon", "lat", "uvel", "vvel", "ang_vel", "ang_accel", "rot",
          "axn_fast", "ayn_fast", "uvel_old", "vvel_old",
          "bond_length", "bond_tangd1", "bond_tangd2",
          "bond_rel_rotation", "bond_nstress", "bond_sstress",
          "bond_broken", "n_bonds")


def _compare(s1, s2, tol=5e-6):
    for f in _CHECK:
        a = np.asarray(getattr(s1, f), np.float64)
        b = np.asarray(getattr(s2, f), np.float64)
        scale = np.max(np.abs(a)) or 1.0
        err = np.max(np.abs(a - b)) / scale
        assert err < tol, (f, err)


@pytest.mark.parametrize("jitter,flags", [
    # heavy jitter: most bonds fracture -> broken-bond contact is live
    (40.0, {}),
    # gentle: elastic bond regime, short-step grounding + torque on
    (2.0, {"short_step_mts_grounding": True, "use_grounding_torque": True,
           "frac_thres_n": 1.8e5}),
])
def test_vmem_matches_scan(jitter, flags):
    cfg = _cfg(**flags)
    grid, frc, st = _world(cfg, jitter=jitter)
    block_n = 128
    st = pack_conglomerates_blocked(st, block_n)
    deltas = analyze_bond_deltas(st.bond_idx, block_n)
    assert deltas is not None and len(deltas) > 0

    ev_scan = jax.jit(functools.partial(
        evolve_icebergs_mts, grid=grid, frc=frc, cfg=cfg,
        neighbor_mode="tables"))
    ev_vmem = jax.jit(functools.partial(
        evolve_icebergs_mts, grid=grid, frc=frc, cfg=cfg,
        neighbor_mode="tables", substep_kernel="vmem",
        vmem_deltas=deltas, vmem_block_n=block_n, vmem_interpret=True))

    s1, d1 = ev_scan(st)
    s2, d2 = ev_vmem(st)
    assert int(d1.broken_bonds) == int(d2.broken_bonds)
    _compare(s1, s2)


def test_pack_blocked_invariants():
    cfg = _cfg()
    grid, frc, st = _world(cfg)
    st2 = pack_conglomerates_blocked(st, 128)
    # population preserved
    assert int(np.sum(np.asarray(st2.alive))) == \
        int(np.sum(np.asarray(st.alive)))
    # bonds still pair the same ids (directed (id, partner-id) multiset)
    def pairs(s):
        bi, ic = np.asarray(s.bond_idx), np.asarray(s.id_cnt)
        me = np.broadcast_to(ic[:, None], bi.shape)
        v = bi >= 0
        return sorted(zip(me[v].tolist(), ic[bi[v]].tolist()))
    assert pairs(st) == pairs(st2)
    # block closure
    assert analyze_bond_deltas(st2.bond_idx, 128) is not None


def test_analyze_rejects_block_crossing():
    bi = np.full((256, 2), -1, np.int32)
    bi[127, 0] = 128          # bond crossing the 128-block boundary
    bi[128, 0] = 127
    assert analyze_bond_deltas(jnp.asarray(bi), 128) is None
    # same bond inside one block is fine
    bi2 = np.full((256, 2), -1, np.int32)
    bi2[10, 0] = 11
    bi2[11, 0] = 10
    assert analyze_bond_deltas(jnp.asarray(bi2), 128) == (-1, 1)
