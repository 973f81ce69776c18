"""maskmap + io_layout (VERDICT round-2 missing #4).

The reference passes both through icebergs_init into FMS
(mpp_define_domains maskmap=..., mpp_define_io_domain io_layout;
icebergs_framework.F90:915-921, icebergs.F90:101,116): maskmap drops
all-land layout columns from the rank set; io_layout aggregates tiles
per restart file.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.parallel import domain as dd

NX, NY, DXY = 32, 8, 5000.0


def _world(maskmap=None, ndev=4, msk=None):
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0,
                             use_f_plane=True, lat_ref=30.0, dt=600.0,
                             Runge_not_Verlet=True, halo=2)
    mesh = Mesh(np.array(jax.devices()[:ndev]), (dd.AXIS,))
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0.,
                                  lat0=0., dlon=DXY, dlat=DXY, msk=msk,
                                  maskmap=maskmap)
    return cfg, world


def _bergs(cfg, n=5):
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    rng = np.random.RandomState(1)
    # keep bergs out of the masked (land) west column [0, 8) cells
    lon = rng.uniform(9 * DXY, (NX - 3) * DXY, n)
    lat = rng.uniform(2 * DXY, (NY - 2) * DXY, n)
    st = ibt.create_bergs(64, lon=lon, lat=lat, mass=1e8, thickness=20.,
                          width=50., length=60., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    return st.replace(ine=i, jne=j, xi=xi, yj=yj), grid


def test_maskmap_drops_land_column():
    """A 4-column layout with an all-land west column runs on 3 devices;
    tiles keep their global offsets and bergs evolve mass-conserving."""
    if len(jax.devices()) < 3:
        pytest.skip("needs 3 devices")
    msk = np.ones((NX, NY))
    msk[:8, :] = 0.                      # west column = land
    cfg, world = _world(maskmap=[False, True, True, True], ndev=3,
                        msk=msk)
    assert world.grids_host.lon0.shape == (3,)
    # tile 0 of the mesh is global layout column 1 (i_off = 8 - halo)
    assert int(np.asarray(world.grids_host.i_off)[0]) == 8 - world.halo

    st, grid = _bergs(cfg)
    m0 = float(jnp.sum(jnp.where(st.alive, st.mass * st.mass_scaling,
                                 0.)))
    frc = ibt.uniform_forcing(NX, NY, uo=1.0, sst=2.0)
    frc_s = dd.shard_forcing(world, frc)
    st_s = dd.shard_state(world, st, local_capacity=32)
    step = dd.make_sharded_step(world, with_thermo=False)
    for _ in range(20):
        st_s, nbergs, total_mass, overflow = step(st_s, frc_s)
    assert int(np.asarray(nbergs)) == 5
    assert int(np.max(np.asarray(overflow))) == 0
    np.testing.assert_allclose(float(np.asarray(total_mass)), m0,
                               rtol=1e-6)


def test_maskmap_rejects_ocean_column():
    with pytest.raises(AssertionError):
        _world(maskmap=[False, True, True, True], ndev=3, msk=None)


def test_io_layout_groups_tiles(tmp_path):
    """io_layout=2 writes half as many files; the round-trip reassembles
    the identical global state."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from icebergs_tpu.io import restart as rio
    cfg, world = _world(ndev=4)
    st, grid = _bergs(cfg)
    st_s = dd.shard_state(world, st, local_capacity=32)
    base = str(tmp_path / "icebergs.res.nc")
    p1 = rio.write_restart_bergs_tiled(base, st_s, cfg)
    assert len(p1) == 4
    r1 = rio.read_restart_bergs_tiled(base, 64, grid, cfg)

    base2 = str(tmp_path / "io2" / "icebergs.res.nc")
    (tmp_path / "io2").mkdir()
    p2 = rio.write_restart_bergs_tiled(base2, st_s, cfg, io_layout=2)
    assert len(p2) == 2
    r2 = rio.read_restart_bergs_tiled(base2, 64, grid, cfg)

    for f in ("lon", "lat", "uvel", "mass"):
        a = np.sort(np.asarray(getattr(r1, f))[np.asarray(r1.alive)])
        b = np.sort(np.asarray(getattr(r2, f))[np.asarray(r2.alive)])
        np.testing.assert_array_equal(a, b, err_msg=f)
    assert int(r1.count()) == int(r2.count()) == 5
