"""Pallas segment-sum spreading path (ops/pallas_spread.py, interpret
mode on CPU) vs the slot-sum backends.

The kernel computes the same per-cell sums with a different (sequential,
reference-id-order) association, so comparisons are tolerance-based; the
window-overflow fallback shares the kernel's product definitions and is
exercised by shrinking the window.

The backend switch is ``cfg.slot_sum_method`` (an IcebergsConfig
fast-lane field since round 5); only the kernel-geometry knob
``sp.PALLAS_SPREAD_WINDOW`` remains module-level (tests shrink it to
force the overflow fallback).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.ops import spread as sp

NX = NY = 16
DXY = 2000.0


def _world(n=3000, seed=1):
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.,
                             use_f_plane=True, lat_ref=45., dt=600.,
                             slot_sum_method="scatter")
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=.3, vo=.1, ua=5., sst=4.,
                              sss=33.)
    rng = np.random.RandomState(seed)
    st = ibt.create_bergs(n, lon=rng.uniform(DXY, (NX - 1) * DXY, n),
                          lat=rng.uniform(DXY, (NY - 1) * DXY, n),
                          mass=rng.uniform(1e8, 1e9, n), thickness=40.,
                          width=rng.uniform(50, 150, n), length=120.,
                          mass_scaling=1.)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj,
                    uvel=jnp.asarray(rng.randn(n), jnp.float32),
                    vvel=jnp.asarray(rng.randn(n), jnp.float32))
    alive = np.ones(n, bool)
    alive[::17] = False
    return cfg, grid, frc, st.replace(alive=jnp.asarray(alive)), rng


@pytest.fixture(autouse=True)
def _restore_window():
    w = sp.PALLAS_SPREAD_WINDOW
    yield
    sp.PALLAS_SPREAD_WINDOW = w


@pytest.mark.parametrize("old_spreading", [False, True])
def test_pallas_spread_matches_scatter(old_spreading):
    cfg, grid, frc, st, rng = _world()
    cfg = cfg.replace(use_old_spreading=old_spreading)
    extras = [st.mass * 0.5, st.width * 2.,
              jnp.asarray(rng.rand(st.capacity), jnp.float32)]
    dref, eref = sp.create_gridded_icebergs_fields(
        st, grid, frc, cfg, extra_cell_cols=extras)
    dk, ek = sp.create_gridded_icebergs_fields(
        st, grid, frc, cfg.replace(slot_sum_method="pallas"),
        extra_cell_cols=extras)
    for f in dref._fields:
        a, b = np.asarray(getattr(dref, f)), np.asarray(getattr(dk, f))
        rel = np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-30)
        assert rel < 1e-5, (f, rel)
    for k, (a, b) in enumerate(zip(eref, ek)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-30)
        assert rel < 1e-5, ("extra", k, rel)


def test_pallas_spread_gathered_matches_default():
    """segment_spread_sums_g (tile-gathered windows, standard block
    pipeline) must be BITWISE equal to the manual-DMA kernel: same body,
    exact tile-granular gather feeding it."""
    cfg, grid, frc, st, rng = _world()
    cfg = cfg.replace(slot_sum_method="pallas")
    extras = [st.mass * 0.5, st.width * 2.]
    dref, eref = sp.create_gridded_icebergs_fields(
        st, grid, frc, cfg, extra_cell_cols=extras)
    dg, eg = sp.create_gridded_icebergs_fields(
        st, grid, frc, cfg.replace(spread_impl="gathered"),
        extra_cell_cols=extras)
    for f in dref._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(dref, f)), np.asarray(getattr(dg, f)),
            err_msg=f)
    for k, (a, b) in enumerate(zip(eref, eg)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"extra{k}")


def test_pallas_spread_window_overflow_fallback():
    """A window too small for the densest block must flip the whole run
    to the (exact, deterministic) scatter_t fallback — nothing silently
    dropped."""
    cfg, grid, frc, st, rng = _world()
    cfgp = cfg.replace(slot_sum_method="pallas")
    extras = [st.mass * 0.5]
    sp.PALLAS_SPREAD_WINDOW = 128      # every block overflows
    df, ef = sp.create_gridded_icebergs_fields(
        st, grid, frc, cfgp, extra_cell_cols=extras)
    sp.PALLAS_SPREAD_WINDOW = 4096
    dk, ek = sp.create_gridded_icebergs_fields(
        st, grid, frc, cfgp, extra_cell_cols=extras)
    # same totals either way (fallback is exact)
    for f in ("mass_on_ocean", "spread_mass", "mass"):
        a, b = np.asarray(getattr(df, f)), np.asarray(getattr(dk, f))
        rel = np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-30)
        assert rel < 1e-5, (f, rel)
    # extras ride the fallback's tree bitwise
    dt_, et_ = sp.create_gridded_icebergs_fields(
        st, grid, frc, cfg.replace(slot_sum_method="scatter_t"),
        extra_cell_cols=extras)
    sp.PALLAS_SPREAD_WINDOW = 128
    df2, ef2 = sp.create_gridded_icebergs_fields(
        st, grid, frc, cfgp, extra_cell_cols=extras)
    assert np.array_equal(np.asarray(et_[0]), np.asarray(ef2[0]))


def test_pallas_spread_mass_conservation():
    """Total spread mass equals the per-berg mass total (interior bergs,
    full mask): the kernel drops nothing."""
    cfg, grid, frc, st, _ = _world()
    d = sp.create_gridded_icebergs_fields(
        st, grid, frc, cfg.replace(slot_sum_method="pallas"))
    total = float(jnp.sum(d.mass_on_ocean))
    from icebergs_tpu.ops.spread import berg_spread_mass
    expect = float(jnp.sum(jnp.where(st.alive,
                                     berg_spread_mass(st, grid, frc, cfg),
                                     0.)))
    assert abs(total - expect) / expect < 1e-6


def test_pallas_spread_key_alive_deaths_keep_cell():
    """Rows marked dead AFTER the sort key was taken (thermo deaths)
    keep their cell for the pass-through columns (the melt of a berg
    that fully melted this step still lands in its cell)."""
    cfg, grid, frc, st, rng = _world(n=500)
    key_alive = np.asarray(st.alive).copy()
    post = key_alive.copy()
    post[7] = False                     # "died in thermo"
    st2 = st.replace(alive=jnp.asarray(post))
    melt_col = jnp.asarray(rng.rand(st.capacity), jnp.float32)
    d, ef = sp.create_gridded_icebergs_fields(
        st2, grid, frc, cfg.replace(slot_sum_method="pallas"),
        extra_cell_cols=[melt_col], key_alive=jnp.asarray(key_alive))
    i7 = int(np.asarray(st.ine)[7]) + 1
    j7 = int(np.asarray(st.jne)[7]) + 1
    # the dead row's melt column value is included in its cell
    cell_sum = float(np.asarray(ef[0])[i7, j7])
    others = [k for k in range(st.capacity)
              if key_alive[k] and np.asarray(st.ine)[k] + 1 == i7
              and np.asarray(st.jne)[k] + 1 == j7 and k != 7]
    expect = float(melt_col[7]) + sum(float(melt_col[k]) for k in others)
    assert abs(cell_sum - expect) <= 1e-5 * max(abs(expect), 1.)
    # but its MASS does not spread (value rows masked by current alive)
    dref = sp.create_gridded_icebergs_fields(st2, grid, frc, cfg)
    rel = np.max(np.abs(np.asarray(d.mass_on_ocean)
                        - np.asarray(dref.mass_on_ocean))) \
        / np.max(np.abs(np.asarray(dref.mass_on_ocean)))
    assert rel < 1e-5


def test_pallas_spread_full_step():
    """The production step with slot_sum_method='pallas' (skips
    make_sort_ctx, pins pre-thermo key_alive, routes thermo's 14
    deferred melt columns through the kernel) matches the scatter step's
    coupler fields and state."""
    from icebergs_tpu.model import make_step
    cfg, grid, frc, st, _ = _world()
    cfg = cfg.replace(interactive_icebergs_on=False)

    def run(method):
        step = make_step(grid, cfg.replace(slot_sum_method=method),
                         with_thermo=True)
        return step(st, frc)

    st_ref, d_ref = run("scatter")
    st_k, d_k = run("pallas")
    assert np.array_equal(np.asarray(st_ref.mass), np.asarray(st_k.mass))
    assert np.array_equal(np.asarray(st_ref.lon), np.asarray(st_k.lon))
    for f in ("spread_mass", "spread_area", "mass_on_ocean",
              "floating_melt", "calving_hflx", "berg_melt",
              "ustar_iceberg", "u_iceberg"):
        a = np.asarray(getattr(d_ref, f))
        b = np.asarray(getattr(d_k, f))
        rel = np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-30)
        assert rel < 1e-5, (f, rel)
