"""Sorted-frame interp kernel (ops/pallas_interp.py) vs the XLA
``interp_flds`` path: bitwise parity on alive rows (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.model import interp_to_bergs
from icebergs_tpu.ops import pallas_interp as pi
from icebergs_tpu.ops.sorted import sort_state_by_cell


def _setup(n=3000, nx=48, ny=40, latlon=False, seed=0, ssh_amp=0.5):
    dxy = 700.0
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=latlon, Lx=(360.0 if latlon else -1.0),
        use_f_plane=not latlon, lat_ref=45.0, dt=600.0,
        Runge_not_Verlet=False, interactive_icebergs_on=True)
    if latlon:
        grid = ibt.make_uniform_grid(nx, ny, 0., -30., 0.25, 0.25,
                                     grid_is_latlon=True)
    else:
        grid = ibt.make_uniform_grid(nx, ny, 0., 0., dxy, dxy,
                                     grid_is_latlon=False)
    rng = np.random.RandomState(seed)
    frc = ibt.uniform_forcing(nx, ny, uo=0.3, vo=0.1, ua=5.0, va=-2.0,
                              ui=0.05, vi=0.02, sst=4.0, sss=33.0)
    # non-trivial ssh so the gradient stencil is exercised
    ssh = ssh_amp * np.sin(np.linspace(0, 6, nx + 2))[:, None] \
        * np.cos(np.linspace(0, 5, ny + 2))[None, :]
    frc = frc.replace(ssh=jnp.asarray(ssh, jnp.float32))
    if latlon:
        lon = rng.uniform(grid.lon0 + 2 * 0.25, grid.lon0 + (nx - 2) * 0.25, n)
        lat = rng.uniform(grid.lat0 + 2 * 0.25, grid.lat0 + (ny - 2) * 0.25, n)
    else:
        lon = rng.uniform(2 * dxy, (nx - 2) * dxy, n)
        lat = rng.uniform(2 * dxy, (ny - 2) * dxy, n)
    st = ibt.create_bergs(n, lon=lon, lat=lat, mass=850. * 40. * 150. * 150.,
                          thickness=40., width=150., length=150.,
                          mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat,
                               360.0 if latlon else -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st, starts = sort_state_by_cell(st, grid)
    return st, grid, frc, cfg


ENV_FIELDS = ("uo", "vo", "ui", "vi", "ua", "va", "ssh_x", "ssh_y",
              "sst", "sss", "cn", "hi", "od")


def _assert_env_matches(ref, out, alive):
    """On TPU the slot values are exact (HIGHEST one-hot matmul) and the
    env math is exact-HLO, so kernel == XLA bitwise.  On CPU the
    interpret-mode kernel body is one jitted program in which LLVM
    contracts mul+add chains into FMAs, while the eager XLA reference
    runs per-primitive — a <= 2-ulp wobble on the bilinear combinations
    that does not exist on hardware.  Assert bitwise on TPU, 2-ulp
    relative agreement elsewhere."""
    import jax
    bitwise = jax.default_backend() == "tpu"
    for f in ENV_FIELDS:
        a = np.asarray(getattr(ref, f))[alive]
        b = np.asarray(getattr(out, f))[alive]
        assert np.isfinite(b).all(), f
        if bitwise:
            assert np.array_equal(a, b), f
        else:
            np.testing.assert_allclose(a, b, rtol=5e-7, atol=1e-11,
                                       err_msg=f)


@pytest.mark.parametrize("latlon", [False, True])
@pytest.mark.parametrize("ob", [False, True])
def test_interp_kernel_vs_xla(latlon, ob):
    st, grid, frc, cfg = _setup(latlon=latlon)
    cfg = cfg.replace(old_bug_bilin=ob)
    ref = interp_to_bergs(st, grid, frc, cfg)
    out, m25 = pi.interp_to_bergs_sorted(st, grid, frc, cfg, interpret=True)
    _assert_env_matches(ref, out, np.asarray(st.alive))
    # the walk anchor equals the real packed-mask gather on alive rows
    from icebergs_tpu.dynamics import _msk25_table
    ref25 = np.asarray(_msk25_table(grid.msk))[np.asarray(st.ine) + 3,
                                               np.asarray(st.jne) + 3]
    alive = np.asarray(st.alive)
    assert np.array_equal(np.asarray(m25)[alive], ref25[alive])


@pytest.mark.parametrize("latlon", [False, True])
@pytest.mark.parametrize("ob", [False, True])
def test_interp_table_vs_xla(latlon, ob):
    """The single-gather TABLE path (plain XLA, no kernel) must match
    interp_flds: same per-cell table, same per-berg expressions."""
    st, grid, frc, cfg = _setup(latlon=latlon)
    cfg = cfg.replace(old_bug_bilin=ob)
    ref = interp_to_bergs(st, grid, frc, cfg)
    out, (m25, m81) = pi.interp_to_bergs_table(st, grid, frc, cfg)
    _assert_env_matches(ref, out, np.asarray(st.alive))
    from icebergs_tpu.dynamics import _msk25_table, _msk81_rows
    ref25 = np.asarray(_msk25_table(grid.msk))[np.asarray(st.ine) + 3,
                                               np.asarray(st.jne) + 3]
    alive = np.asarray(st.alive)
    assert np.array_equal(np.asarray(m25)[alive], ref25[alive])
    ref81 = np.asarray(_msk81_rows(grid.msk))[
        :, np.asarray(st.ine) + 5, np.asarray(st.jne) + 5]
    assert np.array_equal(np.asarray(m81)[:, alive], ref81[:, alive])


def test_interp_table_unsorted_frame():
    """Unlike the kernel, the table path needs no sorted slab: a
    shuffled state gets the identical env per row."""
    st, grid, frc, cfg = _setup()
    rng = np.random.RandomState(3)
    perm = jnp.asarray(rng.permutation(st.capacity))
    st2 = jax.tree.map(lambda x: x[perm] if getattr(x, "ndim", 0) >= 1
                       and x.shape[:1] == (st.capacity,) else x, st)
    out, _ = pi.interp_to_bergs_table(st, grid, frc, cfg)
    out2, _ = pi.interp_to_bergs_table(st2, grid, frc, cfg)
    for f in ENV_FIELDS:
        a = np.asarray(getattr(out, f))[np.asarray(perm)]
        b = np.asarray(getattr(out2, f))
        alive2 = np.asarray(st2.alive)
        assert np.array_equal(a[alive2], b[alive2]), f


def test_interp_kernel_gathered_matches_element():
    """cfg.interp_gathered (tile-gathered windows through the standard block
    pipeline) must be bitwise-identical to the Element-indexed window
    path — same kernel body, exact tile-granular gather feeding it."""
    for latlon in (False, True):
        st, grid, frc, cfg = _setup(latlon=latlon)
        ref, m25_ref = pi.interp_to_bergs_sorted(st, grid, frc, cfg,
                                                 interpret=True)
        out, m25 = pi.interp_to_bergs_sorted(
            st, grid, frc, cfg.replace(interp_gathered=True),
            interpret=True)
        alive = np.asarray(st.alive)
        for f in ENV_FIELDS:
            np.testing.assert_array_equal(
                np.asarray(getattr(ref, f))[alive],
                np.asarray(getattr(out, f))[alive], err_msg=f)
        assert np.array_equal(np.asarray(m25_ref)[alive],
                              np.asarray(m25)[alive])


def test_interp_kernel_boundary_nan_scrub():
    """Bergs in edge cells, where the ssh-stencil ddx/ddy divide by
    zero halo widths: the table's nonfinite scrub + indicator bits must
    reproduce the XLA path's post-rotation NaN scrub (ssh slopes 0)."""
    st, grid, frc, cfg = _setup(n=800)
    dxy = 700.0
    rng = np.random.RandomState(3)
    lon = rng.uniform(0.05 * dxy, 48 * dxy * 0.999, 800)
    lat = rng.uniform(0.05 * dxy, 40 * dxy * 0.999, 800)
    st = st.replace(lon=jnp.asarray(lon, jnp.float32),
                    lat=jnp.asarray(lat, jnp.float32))
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    st, _ = sort_state_by_cell(st, grid)
    ref = interp_to_bergs(st, grid, frc, cfg)
    out, m25 = pi.interp_to_bergs_sorted(st, grid, frc, cfg, interpret=True)
    _assert_env_matches(ref, out, np.asarray(st.alive))


def test_interp_kernel_window_overflow_falls_back():
    # tiny window forces bad blocks -> every row goes through the
    # lax.cond XLA fallback, which must reproduce the reference path
    st, grid, frc, cfg = _setup(n=1500)
    ref = interp_to_bergs(st, grid, frc, cfg)
    out, m25 = pi.interp_to_bergs_sorted(st, grid, frc, cfg, cell_window=1,
                                         interpret=True)
    _assert_env_matches(ref, out, np.asarray(st.alive))


def test_interp_table_pack_kernel_bitwise():
    """interp_to_bergs_table under cfg.pack_kernel (packed
    gather + block-transpose unpack) is bitwise equal to the plain
    table path on alive rows."""
    st, grid, frc, cfg = _setup()
    a, (m25a, m81a) = pi.interp_to_bergs_table(
        st, grid, frc, cfg.replace(pack_kernel=False))
    b, (m25b, m81b) = pi.interp_to_bergs_table(
        st, grid, frc, cfg.replace(pack_kernel=True))
    alive = np.asarray(st.alive)
    for f in ENV_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f))[alive],
            np.asarray(getattr(b, f))[alive], err_msg=f)
    assert np.array_equal(np.asarray(m25a)[alive],
                          np.asarray(m25b)[alive])
    assert np.array_equal(np.asarray(m81a)[:, alive],
                          np.asarray(m81b)[:, alive])


def test_interp_table_mts_quad_od():
    """MTS configs read ocean depth through the table's 25 quad-od rows:
    env fields bitwise vs interp_flds; od within the documented
    lon-derivation ulp (the table derives the local coordinate from
    i + xi instead of the stored lon)."""
    import icebergs_tpu as ibt
    from icebergs_tpu.model import interp_to_bergs
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=-55.0,
        dt=600.0, mts=True, mts_sub_steps=10, explicit_inner_mts=True,
        dem=True, interactive_icebergs_on=True,
        iceberg_bonds_on=True).normalized(warn=False)
    nx, ny, dxy = 48, 40, 7000.0
    grid = ibt.make_uniform_grid(nx, ny, 0., 0., dxy, dxy,
                                 grid_is_latlon=False)
    rng = np.random.RandomState(0)
    depth = 200. + 150. * np.sin(np.linspace(0, 5, nx + 2))[:, None] \
        * np.cos(np.linspace(0, 4, ny + 2))[None, :]
    grid = grid.replace(ocean_depth=jnp.asarray(depth, jnp.float32))
    frc = ibt.uniform_forcing(nx, ny, uo=0.3, vo=0.1, ua=5.0, sst=-2.0,
                              sss=34.0)
    ssh = 0.5 * np.sin(np.linspace(0, 6, nx + 2))[:, None] \
        * np.cos(np.linspace(0, 5, ny + 2))[None, :]
    frc = frc.replace(ssh=jnp.asarray(ssh, jnp.float32))
    st = ibt.create_bergs(4000, lon=rng.uniform(2 * dxy, (nx - 2) * dxy,
                                                4000),
                          lat=rng.uniform(2 * dxy, (ny - 2) * dxy, 4000),
                          mass=850. * 200 * 3000 * 3000, thickness=200.,
                          width=3000., length=3000., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    ref = interp_to_bergs(st, grid, frc, cfg)
    out, _ = pi.interp_to_bergs_table(st, grid, frc, cfg)
    alive = np.asarray(st.alive)
    for f in ("uo", "vo", "ui", "vi", "ua", "va", "ssh_x", "ssh_y",
              "sst", "sss", "cn", "hi"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, f))[alive],
            np.asarray(getattr(out, f))[alive], err_msg=f)
    a = np.asarray(ref.od)[alive]
    b = np.asarray(out.od)[alive]
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-3)
