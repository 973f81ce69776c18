"""makeberg generator: beam/hexpack/footloose initial conditions load
back through the restart reader with the expected bond topology."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import makeberg  # noqa: E402

import icebergs_tpu as ibt  # noqa: E402
from icebergs_tpu.io import restart as rio  # noqa: E402


def test_beam_bonds_adjacent_only(tmp_path):
    arrays = makeberg.gen_beam(10, 500., 5e3, 8e3, 100.)
    st = makeberg.write(arrays, str(tmp_path), bond_length_factor=1.1)
    nb = np.asarray(st.n_bonds)[np.asarray(st.alive)]
    assert nb.sum() == 18          # 9 adjacent pairs, both directions
    assert nb.max() == 2 and nb.min() == 1
    assert float(np.asarray(st.static_berg)[0]) == 1.0   # clamped end


def test_hexpack_circle_roundtrip(tmp_path):
    arrays = makeberg.gen_hexpack(400., shape="circle", R=4e3, x0=10e3,
                                  y0=10e3, thickness=80.)
    st = makeberg.write(arrays, str(tmp_path), bond_length_factor=1.1)
    n = int(np.asarray(st.alive).sum())
    assert n > 50
    nb = np.asarray(st.n_bonds)[np.asarray(st.alive)]
    assert nb.max() == 6           # hexagonal interior coordination
    # volume conservation: element area = hex cell area
    area = np.asarray(st.width)[0] * np.asarray(st.length)[0]
    np.testing.assert_allclose(area, 2 * np.sqrt(3) * 400. ** 2, rtol=1e-5)

    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.,
                             iceberg_bonds_on=True, max_bonds=6)
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 2000., 2000.,
                                 grid_is_latlon=False)
    st2 = rio.read_restart_bergs(str(tmp_path / "icebergs.res.nc"), 128,
                                 grid, cfg)
    st2 = rio.read_restart_bonds(str(tmp_path / "bonds_iceberg.res.nc"),
                                 st2, cfg)
    assert int(np.asarray(st2.alive).sum()) == n
    assert (np.asarray(st2.n_bonds)[np.asarray(st2.alive)].sum()
            == nb.sum())


def test_hexpack_raster(tmp_path):
    ras = np.zeros((20, 20))
    ras[5:15, 5:15] = 120.0
    np.save(tmp_path / "thick.npy", ras)
    arrays = makeberg.gen_hexpack(300., raster=str(tmp_path / "thick.npy"),
                                  cell=500.)
    assert len(arrays["lon"]) > 20
    assert (arrays["thickness"] == 120.).all()
    # all sites inside the ice footprint
    assert arrays["lon"].min() >= 5 * 500. - 300.
    assert arrays["lon"].max() <= 15 * 500. + 300.
