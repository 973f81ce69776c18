"""Run the reference repository's own collision-test namelist through the
stand-alone driver end to end (grid + converging jet from
icebergs_driver_nml, physics config from icebergs_nml, makeberg-style
initial conditions, restart + trajectory output)."""

import numpy as np
import pytest

import icebergs_tpu as ibt
from icebergs_tpu import driver as drv
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.io import restart as rio
from icebergs_tpu.io.namelist import config_from_namelist

REF_NML = "/root/reference/tests/collision_tests/input_KID.nml"


def make_conglomerates(cfg, grid):
    """Two 8-element hexagon-ish packed conglomerates like the collision
    makeberg (tests/collision_tests/makeberg)."""
    side = 400.0
    lon, lat = [], []
    for (cx, cy) in ((5000., 7600.), (5000., 12400.)):
        for dx in (-1.5 * side, -0.5 * side, 0.5 * side, 1.5 * side):
            for dy in (-0.5 * side, 0.5 * side):
                lon.append(cx + dx)
                lat.append(cy + dy)
    st = ibt.create_bergs(64, lon=lon, lat=lat,
                          mass=850. * 100 * side * side, thickness=100.,
                          width=side, length=side, mass_scaling=1.,
                          id_cnt=np.arange(len(lon)) + 1)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    return st.replace(ine=i, jne=j, xi=xi, yj=yj)


def test_reference_collision_nml_runs(tmp_path):
    cfg, drvp = config_from_namelist(REF_NML)
    # values straight from the file
    assert drvp["collision_test"] is True
    assert cfg.Runge_not_Verlet is False
    assert cfg.interactive_icebergs_on is True
    assert cfg.iceberg_bonds_on is True

    grid, frc = drv.build_grid_and_forcing(cfg, drvp)
    assert grid.nx == 20 and grid.ny == 20
    # jet converges toward y=10km on the west half
    v_lo = float(frc.vo[3, 3])
    v_hi = float(frc.vo[3, 17])
    assert v_lo > 0. and v_hi < 0.

    st = make_conglomerates(cfg, grid)
    rio.write_restart_bergs(str(tmp_path / "icebergs.res.nc"), st, cfg)

    # shorten the run for CI (the full 48 h at dt=60 runs ~3000 steps)
    import icebergs_tpu.io.namelist as nml
    text = open(REF_NML).read().replace("ibhrs=48", "ibhrs=2")
    p = tmp_path / "input.nml"
    p.write_text(text)

    st2 = drv.run(str(p), input_dir=str(tmp_path),
                  output_dir=str(tmp_path / "out"), capacity=64,
                  verbose=False)
    alive = np.asarray(st2.alive)
    assert alive.sum() == 16
    lon = np.asarray(st2.lon)[alive]
    lat = np.asarray(st2.lat)[alive]
    assert np.all(np.isfinite(lon)) and np.all(np.isfinite(lat))
    # the jet pushed the two groups toward the midline
    assert lat[:8].mean() > 7590.
    assert lat[8:].mean() < 12410.
    assert (tmp_path / "out" / "icebergs.res.nc").exists()


import glob
import os


@pytest.mark.parametrize("nml", sorted(glob.glob(
    "/root/reference/tests/*/input*.nml")))
def test_every_reference_namelist_parses_to_config(nml):
    """Config parity: every namelist shipped with the reference's test
    suite maps onto IcebergsConfig without unknown-parameter fallout and
    with faithful values for a few spot-checked knobs."""
    if not os.path.exists(nml):
        pytest.skip("reference not present")
    from icebergs_tpu.io.namelist import (parse_namelist_file,
                                          config_from_namelist)
    raw = parse_namelist_file(nml)
    assert "icebergs_nml" in raw, nml
    cfg, drvp = config_from_namelist(nml)
    # every icebergs_nml parameter must be a known config field
    assert not [k for k in drvp.get("_unknown", ())], \
        (nml, drvp.get("_unknown"))
    # spot checks against the raw values
    nmlv = raw["icebergs_nml"]
    for key in ("rho_bergs", "spring_coef", "mts_sub_steps",
                "contact_distance"):
        if key in nmlv:
            got = getattr(cfg, key.lower())
            assert float(got) == pytest.approx(float(nmlv[key])), (nml, key)
    if "iceberg_bonds_on" in nmlv:
        assert bool(cfg.iceberg_bonds_on) == bool(nmlv["iceberg_bonds_on"])
