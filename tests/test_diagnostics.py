"""DiagManager accumulation + history-file flush (diag_manager analog)."""

import numpy as np
from scipy.io import netcdf_file

import jax.numpy as jnp

import icebergs_tpu as ibt
from icebergs_tpu.diagnostics import DiagManager, collect_step_fields


def test_diag_manager_accumulate_and_flush(tmp_path):
    grid = ibt.make_uniform_grid(6, 5, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    dm = DiagManager(grid, selected=("floating_melt", "spread_mass"))
    ds = dm.init_state()

    f1 = jnp.zeros((8, 7)).at[3, 3].set(2.0)
    f2 = jnp.zeros((8, 7)).at[2, 2].set(10.0)
    ds = dm.send_data(ds, {"floating_melt": f1, "spread_mass": f2})
    ds = dm.send_data(ds, {"floating_melt": f1 * 2, "spread_mass": f2})
    assert int(ds.count) == 2

    path = str(tmp_path / "icebergs_history.nc")
    ds = dm.flush(ds, path, time_value=1.5)
    assert int(ds.count) == 0

    with netcdf_file(path, "r", mmap=False) as f:
        fm = np.asarray(f.variables["floating_melt"][:])   # (1, ny, nx)
        sm = np.asarray(f.variables["spread_mass"][:])
        tv = np.asarray(f.variables["Time"][:])
    assert tv[0] == 1.5
    # time-averaged: (2+4)/2 = 3 at interior cell (2,2) 0-based
    np.testing.assert_allclose(fm[0, 2, 2], 3.0)
    np.testing.assert_allclose(sm[0, 1, 1], 10.0)


def test_collect_step_fields_from_run_outputs():
    import jax
    from icebergs_tpu.api import IcebergsModel
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1., use_f_plane=True,
                             dt=600.)
    grid = ibt.make_uniform_grid(6, 5, 0., 0., 1000., 1000.,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(6, 5, sst=2.0)
    model = IcebergsModel(grid, cfg)
    st = ibt.create_bergs(8, lon=[2500.], lat=[2500.], mass=1e8,
                          thickness=20., width=40., length=50.,
                          mass_scaling=1.)
    from icebergs_tpu.grid import pos_to_cell
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    state = model.init_state(st)
    state, out = model.run(state, frc)
    fields = collect_step_fields(out)
    assert "floating_melt" in fields and "spread_mass" in fields
    dm = DiagManager(grid, selected=tuple(fields))
    ds = dm.send_data(dm.init_state(), fields)
    assert int(ds.count) == 1


def test_phase_clocks_table(capsys):
    """PhaseClocks: the mpp_clock analog accumulates per-phase totals
    and prints the end-of-run table (icebergs_framework.F90:896-908)."""
    import jax.numpy as jnp
    from icebergs_tpu.diag import PhaseClocks

    ck = PhaseClocks()
    for _ in range(3):
        with ck("Icebergs-step", sync_fn=lambda: jnp.arange(4)):
            pass
    ck.begin("Icebergs-I/O write")
    ck.end("Icebergs-I/O write")
    ck.report()
    out = capsys.readouterr().out
    assert "Icebergs-step" in out and "Icebergs-I/O write" in out
    lines = [ln for ln in out.splitlines() if "Icebergs-step" in ln]
    assert "|       3 |" in lines[0]


def test_dump_halo_state(capsys):
    """halo_debugging analog prints one A-line per alive berg
    (icebergs_framework.F90:1828-1838), incl. on stacked sharded slabs."""
    import sys
    import numpy as np
    import icebergs_tpu as ibt
    from icebergs_tpu.diag import dump_halo_state

    st = ibt.create_bergs(8, lon=[1., 2.], lat=[1., 2.], mass=1e6,
                          thickness=10., width=20., length=20.,
                          mass_scaling=1., id_cnt=[5, 9])
    dump_halo_state(st, label="t", file=sys.stdout)
    out = capsys.readouterr().out
    assert "halo_debugging [t]" in out
    assert out.count("A ") == 2 and "A 5:" in out and "A 9:" in out

    import jax.numpy as jnp
    import jax
    stacked = jax.tree.map(lambda x: jnp.stack([x, x]), st)
    dump_halo_state(stacked, file=sys.stdout)
    out = capsys.readouterr().out
    assert out.count("A ") == 4 and "pe=1" in out
