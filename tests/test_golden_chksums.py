"""Golden-checksum regression tests.

The reference anchors its integration tests with recorded restart
checksums (tests/collision_tests/README:15-24, input_MTS_KID.nml:1) that
must reproduce across PE layouts.  We do the same: three fixed scenarios
run to completion and their order-invariant state hashes must match the
values recorded in golden_chksums.json (generated on first run; regenerate
by deleting the file or setting REGEN_GOLDEN=1).

Hashes are float32/CPU-specific by nature: they guard against accidental
physics changes on the test platform, like the reference's chksums guard
a given compiler/host.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import icebergs_tpu as ibt
from icebergs_tpu import diag
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.ops import forces
from icebergs_tpu.model import make_multi_step

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_chksums.json")


def scenario_drift():
    """RK4 drift under constant forcing, 24 steps."""
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1., use_f_plane=True,
                             lat_ref=45., dt=600., Runge_not_Verlet=True)
    grid = ibt.make_uniform_grid(16, 16, 0., 0., 2000., 2000.,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(16, 16, uo=0.3, vo=0.1, ua=5., sst=4.,
                              sss=33.)
    rng = np.random.RandomState(11)
    st = ibt.create_bergs(16, lon=rng.uniform(8000., 24000., 5),
                          lat=rng.uniform(8000., 24000., 5),
                          mass=1e9, thickness=50., width=120., length=180.,
                          mass_scaling=1., id_cnt=np.arange(5) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    multi = make_multi_step(grid, cfg, 24, with_thermo=True)
    return multi(st, frc)


def scenario_collision():
    """Verlet interactive collision (KID style), 240 steps at dt=60."""
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1., use_f_plane=True,
                             lat_ref=0., dt=60., Runge_not_Verlet=False,
                             interactive_icebergs_on=True,
                             use_new_predictive_corrective=True,
                             spring_coef=1.e-5,
                             allow_bergs_to_roll=False)
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(20, 20, sst=-2.)
    st = ibt.create_bergs(8, lon=[9700., 10300.], lat=[10500., 10500.],
                          uvel=[0.2, -0.2],
                          mass=850. * 100 * 400 * 400, thickness=100.,
                          width=400., length=400., mass_scaling=1.,
                          id_cnt=[1, 2])
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    multi = make_multi_step(grid, cfg, 240, with_thermo=False)
    return multi(st, frc)


def scenario_mts_bonded():
    """MTS/DEM bonded square, 10 steps x 20 substeps."""
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1., use_f_plane=True,
                             lat_ref=0., dt=60., Runge_not_Verlet=False,
                             mts=True, mts_sub_steps=20,
                             explicit_inner_mts=True, dem=True,
                             dem_spring_coef=5.e6, dem_damping_coef=1.0,
                             iceberg_bonds_on=True,
                             interactive_icebergs_on=True,
                             spring_coef=1.e-5, contact_spring_coef=1.e-7,
                             contact_distance=1000., max_bonds=4,
                             allow_bergs_to_roll=False,
                             manually_initialize_bonds=True,
                             manually_initialize_bonds_from_radii=True)
    grid = ibt.make_uniform_grid(16, 16, 0., 0., 2000., 2000.,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(16, 16, uo=0.1, sst=-2.)
    side = 800.
    lon, lat = [], []
    for dx in (-side / 2, side / 2):
        for dy in (-side / 2, side / 2):
            lon.append(16000. + dx)
            lat.append(16000. + dy)
    st = ibt.create_bergs(16, lon=lon, lat=lat, thickness=100., width=side,
                          length=side, mass=850. * 100 * side * side,
                          mass_scaling=1., id_cnt=np.arange(4) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st = forces.initialize_bonds_host(st, cfg)
    multi = make_multi_step(grid, cfg, 10, with_thermo=False)
    return multi(st, frc)


SCENARIOS = {
    "drift_rk4": scenario_drift,
    "collision_kid": scenario_collision,
    "mts_dem_bonded": scenario_mts_bonded,
}


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_golden_chksum(name):
    st = SCENARIOS[name]()
    cs, n = jax.jit(diag.berg_chksum)(st)
    got = {"chksum": int(cs), "n": int(n)}

    golden = {}
    if os.path.exists(GOLDEN):
        with open(GOLDEN) as f:
            golden = json.load(f)
    if name not in golden or os.environ.get("REGEN_GOLDEN"):
        golden[name] = got
        with open(GOLDEN, "w") as f:
            json.dump(golden, f, indent=1, sort_keys=True)
        pytest.skip(f"recorded golden chksum for {name}: {got}")
    assert golden[name] == got, (name, golden[name], got)
