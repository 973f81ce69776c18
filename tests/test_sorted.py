"""Cell-sorted neighbor layout must reproduce bucket-mode physics."""

import jax
import jax.numpy as jnp
import numpy as np

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.ops.sorted import sort_state_by_cell


def make_world():
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0, use_f_plane=True,
                             lat_ref=10., dt=60.0, Runge_not_Verlet=False,
                             interactive_icebergs_on=True,
                             use_new_predictive_corrective=True)
    grid = ibt.make_uniform_grid(16, 16, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(16, 16, uo=0.1, sst=-2.)
    rng = np.random.RandomState(4)
    n = 24
    st = ibt.create_bergs(48, lon=rng.uniform(3000., 13000., n),
                          lat=rng.uniform(3000., 13000., n),
                          mass=850. * 100 * 400 * 400, thickness=100.,
                          width=400., length=400., mass_scaling=1.,
                          id_cnt=np.arange(n) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    return cfg, grid, frc, st.replace(ine=i, jne=j, xi=xi, yj=yj)


def by_id(st, field):
    """Values keyed by id for order-independent comparison."""
    alive = np.asarray(st.alive)
    ids = np.asarray(st.id_cnt)[alive]
    vals = np.asarray(getattr(st, field))[alive]
    return dict(zip(ids.tolist(), vals.tolist()))


def test_sort_state_by_cell_preserves_content_and_bonds():
    cfg, grid, frc, st = make_world()
    from icebergs_tpu.ops import forces
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=1500.,
                        iceberg_bonds_on=True))
    st2, cell_starts = sort_state_by_cell(st, grid)
    assert int(st2.count()) == int(st.count())
    # sorted keys nondecreasing over live slots
    key = np.asarray(st2.jne * 16 + st2.ine)[np.asarray(st2.alive)]
    assert np.all(np.diff(key) >= 0)
    # same multiset of (id, lon)
    assert by_id(st, "lon") == by_id(st2, "lon")
    # bonds still point to the right partners (match by id)
    bidx = np.asarray(st2.bond_idx)
    ids = np.asarray(st2.id_cnt)
    b0 = np.asarray(st.bond_idx)
    ids0 = np.asarray(st.id_cnt)
    pairs0 = sorted((int(ids0[a]), int(ids0[b0[a, k]]))
                    for a in np.nonzero(np.asarray(st.alive))[0]
                    for k in range(4) if b0[a, k] >= 0)
    pairs2 = sorted((int(ids[a]), int(ids[bidx[a, k]]))
                    for a in np.nonzero(np.asarray(st2.alive))[0]
                    for k in range(4) if bidx[a, k] >= 0)
    assert pairs0 == pairs2
    # cell_starts consistent with counts
    assert int(cell_starts[-1]) == int(st.count())


def test_sorted_mode_matches_bucket_mode():
    cfg, grid, frc, st = make_world()
    step_b = ibt.make_step(grid, cfg, with_thermo=False,
                           neighbor_mode="buckets")
    step_s = ibt.make_step(grid, cfg, with_thermo=False,
                           neighbor_mode="sorted")
    sb, ss = st, st
    for _ in range(30):
        sb, _ = step_b(sb, frc)
        ss, _ = step_s(ss, frc)
    lb = by_id(sb, "lon")
    ls = by_id(ss, "lon")
    for k in lb:
        assert abs(lb[k] - ls[k]) < 1e-2, (k, lb[k], ls[k])
    vb = by_id(sb, "uvel")
    vs = by_id(ss, "uvel")
    for k in vb:
        assert abs(vb[k] - vs[k]) < 1e-6, (k, vb[k], vs[k])


def test_payload_sort_static_fields_bitwise():
    """Skipping row-uniform payload columns (bonds/MTS off) leaves the
    sorted state bitwise identical to the full variadic sort."""
    import numpy as np
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.ops.sorted import (sort_state_by_cell,
                                         uniform_state_fields)
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0)
    grid = ibt.make_uniform_grid(12, 12, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    rng = np.random.RandomState(7)
    n = 200
    st = ibt.create_bergs(256, lon=rng.uniform(1e3, 11e3, n),
                          lat=rng.uniform(1e3, 11e3, n),
                          mass=1e9, thickness=40., width=150.,
                          length=150., mass_scaling=1.,
                          id_cnt=rng.permutation(n) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    a, sa = sort_state_by_cell(st, grid)
    uf = uniform_state_fields(cfg)
    assert "bond_idx" in uf and "conglom_id" in uf
    b, sb = sort_state_by_cell(st, grid, static_fields=uf)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    import dataclasses
    for f in dataclasses.fields(st):
        va = getattr(a, f.name)
        if not hasattr(va, "shape"):
            continue
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(getattr(b, f.name)),
            err_msg=f.name)


def test_packed_permute_sort_bitwise():
    """packed_permute (key-only sort + packed u32 row gathers) is
    bitwise identical to the variadic payload sort, with bonds ON (so
    the (N, B) bond columns and the bond-slot remap are exercised and
    the lane count crosses one 128-lane pack)."""
    import dataclasses
    from icebergs_tpu.ops import sorted as srt
    from icebergs_tpu.ops import forces
    cfg, grid, frc, st = make_world()
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=1500.,
                        iceberg_bonds_on=True))
    a, sa = sort_state_by_cell(st, grid)
    b, sb = sort_state_by_cell(st, grid, packed_permute=True)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    for f in dataclasses.fields(st):
        va = getattr(a, f.name)
        if not hasattr(va, "shape"):
            continue
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(getattr(b, f.name)),
            err_msg=f.name)


def test_pack_kernel_permute_bitwise():
    import dataclasses
    """pack_kernel (block-transpose pack/unpack around the
    permute gather) is pure u32 transport: the sorted state must be
    BITWISE identical to the stack_cols path, bond tables included."""
    from icebergs_tpu.ops import sorted as srt
    from icebergs_tpu.ops import pallas_pack as pk
    from icebergs_tpu.ops import forces
    cfg, grid, frc, st = make_world()
    st = forces.initialize_bonds_host(
        st, cfg.replace(length_for_manually_initialize_bonds=1500.,
                        iceberg_bonds_on=True))
    a, sa = sort_state_by_cell(st, grid, packed_permute=True)
    b, sb = sort_state_by_cell(st, grid, packed_permute=True,
                               pack_kernel=True)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    for f in dataclasses.fields(st):
        va = getattr(a, f.name)
        if not hasattr(va, "shape"):
            continue
        np.testing.assert_array_equal(
            np.asarray(va), np.asarray(getattr(b, f.name)),
            err_msg=f.name)


def test_pack_kernel_roundtrip_fuzz():
    """pack_rows_to_lanes / unpack_lanes_to_rows u32 round trip across
    shapes (incl. non-multiple-of-8 row counts and odd N)."""
    from icebergs_tpu.ops import pallas_pack as pk
    rng = np.random.RandomState(0)
    for C, N in ((49, 3000), (7, 130), (128, 1024), (1, 515), (64, 8)):
        R = jnp.asarray(rng.randint(0, 2 ** 32, (C, N), dtype=np.uint32))
        P = pk.pack_rows_to_lanes(R)
        assert P.shape == (N, 128)
        assert np.array_equal(np.asarray(P)[:, :C], np.asarray(R).T)
        assert (np.asarray(P)[:, C:] == 0).all()
        R2 = pk.unpack_lanes_to_rows(P, C)
        np.testing.assert_array_equal(np.asarray(R2), np.asarray(R))
