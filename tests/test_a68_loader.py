"""A68 data loader test with synthetic fixtures matching the reference's
file schemas (driver_data_fms2.F90), plus a short hindcast-style run with
transient hourly forcing and a DEM conglomerate (the a68_test shape)."""

import numpy as np
from scipy.io import netcdf_file

import jax
import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.io import a68
from icebergs_tpu.ops import forces
from icebergs_tpu.model import make_multi_step

NI, NJ, NT = 24, 16, 6


def write_fixtures(d):
    lon = -38.0 + a68.GRES * np.arange(NI)      # node lon (1-D ok)
    lat = -56.0 + a68.GRES * np.arange(NJ)

    with netcdf_file(str(d / a68.GRID_FILE), "w") as f:
        f.createDimension("lon", NI)
        f.createDimension("lat", NJ)
        L, T = np.meshgrid(lon, lat, indexing="ij")
        v = f.createVariable("longitude", "d", ("lon", "lat"))
        v[:] = L
        v = f.createVariable("latitude", "d", ("lon", "lat"))
        v[:] = T

    def write3(fname, names, amp):
        with netcdf_file(str(d / fname), "w") as f:
            f.createDimension("time", NT)
            f.createDimension("lon", NI)
            f.createDimension("lat", NJ)
            for k, n in enumerate(names):
                v = f.createVariable(n, "d", ("time", "lon", "lat"))
                t = np.arange(NT)[:, None, None]
                v[:] = amp * (1. + 0.1 * k) * np.cos(0.3 * t) \
                    * np.ones((NT, NI, NJ))

    write3(a68.WIND_FILE, ("ua", "va"), 5.0)
    write3(a68.OCEAN_FILE, ("uo", "vo"), 0.3)
    write3(a68.SSH_FILE, ("SSH",), 0.05)


def test_a68_loader_and_short_hindcast(tmp_path):
    write_fixtures(tmp_path)
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=True, grid_is_regular=True, Lx=360., dt=60.0,
        Runge_not_Verlet=False, mts=True, mts_sub_steps=18,
        explicit_inner_mts=True, dem=True, dem_spring_coef=5.e6,
        dem_damping_coef=1.0, interactive_icebergs_on=True,
        iceberg_bonds_on=True, spring_coef=1.e-5, contact_spring_coef=1.e-8,
        contact_distance=2000., only_interactive_forces=False,
        manually_initialize_bonds=True,
        manually_initialize_bonds_from_radii=True,
        allow_bergs_to_roll=False, set_melt_rates_to_zero=True,
        max_bonds=4, hexagonal_icebergs=False)

    data = a68.load_a68(str(tmp_path), cfg)
    assert data.n_hours == NT
    grid = data.grid
    assert grid.nx == NI and grid.ny == NJ
    # haversine metric sanity: dx ~ Rearth*cos(lat)*0.125deg
    dx_expected = cfg.Rearth * np.cos(np.radians(-56.)) * np.radians(0.125)
    assert abs(float(grid.dx[5, 5]) - dx_expected) / dx_expected < 0.02

    frc = a68.forcing_at_hour(data, 0)
    assert frc.uo.shape == (NI + 1, NJ + 1)
    assert float(frc.ua[3, 3]) == 5.0

    # small 2x2 bonded conglomerate, A68-style elements (1 km radius)
    r = 1000.0
    lon0, lat0 = -37.0 + 360., -55.2
    dll = 2 * r / (cfg.Rearth * np.cos(np.radians(lat0))) * 180 / np.pi
    dla = 2 * r / cfg.Rearth * 180 / np.pi
    lons = [lon0, lon0 + dll, lon0, lon0 + dll]
    lats = [lat0, lat0, lat0 + dla, lat0 + dla]
    st = ibt.create_bergs(16, lon=lons, lat=lats, thickness=200.,
                          width=2 * r, length=2 * r,
                          mass=850. * 200 * (2 * r) ** 2, mass_scaling=1.)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, 360.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st = forces.initialize_bonds_host(st, cfg)
    assert int(st.n_bonds[0]) == 2

    # hourly forcing swap like the driver's transient indexing
    step = ibt.make_step(grid, cfg, with_thermo=False)
    for n in range(6):
        frc = a68.forcing_at_hour(data, n // 2)   # dt=30min -> hour idx
        st, _ = step(st, frc)
    lon1 = np.asarray(st.lon)[:4]
    assert np.all(np.isfinite(lon1))
    # conglomerate drifted with the (eastward) forcing
    assert np.all(lon1 > np.asarray(lons) - 0.5)
    d01 = np.hypot((lon1[0] - lon1[1]), 0.)
    assert d01 < 3 * dll   # stayed bonded/cohesive
