"""Layout-invariant (parallel_reprod) gridded-field tests.

The reference accumulates each berg's 9-point footprint into per-cell
9-slot buffers and sums them in fixed order (calculate_mass_on_ocean
icebergs.F90:4970-5013 + sum_up_spread_fields 6077-6152) over id-ordered
per-cell lists, making spread fields bitwise independent of the domain
decomposition (parallel_reprod, icebergs_framework.F90:33).  These tests
pin the same contract for ops/spread.scatter9_slots /
scatter_cell_deterministic: slab-order permutation invariance, agreement
with the plain scatter, and tile-interior bitwise equality vs the global
computation.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import icebergs_tpu as ibt
from icebergs_tpu.grid import pos_to_cell
from icebergs_tpu.ops import spread as sp
from icebergs_tpu.parallel import domain as dd

NX, NY, DXY = 32, 8, 5000.0


def world(**kw):
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0, use_f_plane=True,
                             lat_ref=30.0, dt=600.0, halo=2, **kw)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.5, sst=2.0)
    return cfg, grid, frc


def crowded_bergs(grid, n=40, capacity=128, seed=0):
    """Random bergs with deliberate cell collisions (several per cell)."""
    rng = np.random.RandomState(seed)
    # cluster in few cells so per-cell counts exceed 1 (slot-order check)
    ci = rng.randint(2, NX - 2, n)
    cj = rng.randint(1, NY - 1, n // 2).repeat(2)[:n]
    lon = (ci + rng.uniform(0.05, 0.95, n)) * DXY
    lat = (cj + rng.uniform(0.05, 0.95, n)) * DXY
    st = ibt.create_bergs(capacity, lon=lon, lat=lat,
                          mass=rng.uniform(1e8, 5e8, n), thickness=20.,
                          width=60., length=80.,
                          mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    return st.replace(ine=i, jne=j, xi=xi, yj=yj,
                      uvel=jnp.asarray(rng.uniform(-1, 1, capacity),
                                       st.lon.dtype),
                      vvel=jnp.asarray(rng.uniform(-1, 1, capacity),
                                       st.lon.dtype))


def permute_state(st, perm):
    out = {}
    for f in dataclasses.fields(st):
        a = getattr(st, f.name)
        out[f.name] = a[perm] if a.ndim >= 1 and a.shape[:1] == (
            st.capacity,) else a
    return type(st)(**out)


def test_spread_slab_order_invariance():
    """Bitwise identical spread fields under any slab permutation."""
    cfg, grid, frc = world()
    st = crowded_bergs(grid)
    f = jax.jit(lambda s: sp.create_gridded_icebergs_fields(
        s, grid, frc, cfg))
    a = f(st)
    rng = np.random.RandomState(7)
    perm = rng.permutation(st.capacity)
    b = f(permute_state(st, jnp.asarray(perm)))
    for name in ("spread_mass", "spread_area", "spread_uvel", "spread_vvel",
                 "mass_on_ocean", "mass", "u_iceberg", "virtual_area"):
        av, bv = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        assert np.array_equal(av, bv), name


def test_melt_fields_slab_order_invariance():
    from icebergs_tpu.ops import thermo as th
    cfg, grid, frc = world()
    st = crowded_bergs(grid)
    f = jax.jit(lambda s: th.thermodynamics(s, grid, frc, cfg)[1])
    a = f(st)
    rng = np.random.RandomState(3)
    perm = rng.permutation(st.capacity)
    b = f(permute_state(st, jnp.asarray(perm)))
    for name in ("floating_melt", "berg_melt", "melt_buoy", "melt_eros",
                 "melt_conv", "calving_hflx"):
        av, bv = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        assert np.array_equal(av, bv), name


def test_deterministic_matches_plain_scatter():
    """parallel_reprod sums equal the plain scatter to fp tolerance."""
    cfg, grid, frc = world()
    cfg_off = dataclasses.replace(cfg, parallel_reprod=False)
    st = crowded_bergs(grid)
    a = jax.jit(lambda s: sp.create_gridded_icebergs_fields(
        s, grid, frc, cfg))(st)
    b = jax.jit(lambda s: sp.create_gridded_icebergs_fields(
        s, grid, frc, cfg_off))(st)
    for name in ("spread_mass", "spread_area", "mass_on_ocean", "mass"):
        av, bv = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        np.testing.assert_allclose(av, bv, rtol=2e-6, atol=1e-30,
                                   err_msg=name)


def test_spread_tile_interior_bitwise_vs_global():
    """Each tile's interior spread field (with halo-replica bergs
    contributing) equals the global field bitwise — replicated
    computation replaces the reference's 9-slot halo fold."""
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    cfg, grid, frc = world()
    st = crowded_bergs(grid)
    # NB: the same jit form (grid/frc as traced args) must be used for the
    # global and tile computations — constant-folded grids optimize
    # differently at the ulp level
    ref = np.asarray(jax.jit(
        lambda s_, g_, f_: sp.create_gridded_icebergs_fields(
            s_, g_, f_, cfg).spread_mass)(st, grid, frc))

    mesh = Mesh(np.array(jax.devices()[:4]), (dd.AXIS,))
    w = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0., lat0=0.,
                              dlon=DXY, dlat=DXY)
    st_s = dd.shard_state(w, st, local_capacity=64)
    st_s = jax.jit(jax.shard_map(
        lambda g, s: jax.tree.map(
            lambda x: x[None],
            dd.relocalize(jax.tree.map(lambda x: x[0], s),
                          jax.tree.map(lambda x: x[0], g), cfg)),
        mesh=mesh, in_specs=(P(dd.AXIS), P(dd.AXIS)),
        out_specs=P(dd.AXIS)))(w.grids, st_s)
    st_s, _ = dd.make_halo_fill(w)(st_s)

    nxl, H = w.nxl, w.halo
    frc_s = dd.shard_forcing(w, frc)
    for d in range(4):
        g = jax.tree.map(lambda x: np.asarray(x)[d], w.grids)
        s = jax.tree.map(lambda x: np.asarray(x)[d], st_s)
        fr = jax.tree.map(lambda x: np.asarray(x)[d], frc_s)
        g = jax.tree.map(jnp.asarray, g)
        s = jax.tree.map(jnp.asarray, s)
        fr = jax.tree.map(jnp.asarray, fr)
        local = np.asarray(jax.jit(
            lambda s_, g_, f_: sp.create_gridded_icebergs_fields(
                s_, g_, f_, cfg).spread_mass)(s, g, fr))
        # tile interior = padded-local columns [1+H : 1+H+nxl)
        got = local[1 + H:1 + H + nxl, 1:-1]
        want = ref[1 + d * nxl:1 + (d + 1) * nxl, 1:-1]
        assert np.array_equal(got, want), f"tile {d}"


def test_overflow_density_is_exact():
    """Cells denser than reprod_max_per_cell still conserve mass: the
    overflow rows clamp onto the last slot where the scatter accumulates
    them exactly (layout invariance is only guaranteed <= K, exactness
    always)."""
    cfg, grid, frc = world()
    cfg = dataclasses.replace(cfg, reprod_max_per_cell=4)
    cfg_off = dataclasses.replace(cfg, parallel_reprod=False)
    # 12 bergs piled into one cell (density 3x the slot count)
    n = 12
    lon = 10.5 * DXY + np.linspace(-200., 200., n)
    lat = np.full(n, 4.5 * DXY)
    st = ibt.create_bergs(32, lon=lon, lat=lat, mass=2e8, thickness=20.,
                          width=60., length=80., mass_scaling=1.0,
                          id_cnt=np.arange(n) + 1)
    from icebergs_tpu.grid import pos_to_cell
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    a = jax.jit(lambda s: sp.create_gridded_icebergs_fields(
        s, grid, frc, cfg))(st)
    b = jax.jit(lambda s: sp.create_gridded_icebergs_fields(
        s, grid, frc, cfg_off))(st)
    for name in ("spread_mass", "mass_on_ocean", "mass"):
        np.testing.assert_allclose(np.asarray(getattr(a, name)),
                                   np.asarray(getattr(b, name)),
                                   rtol=2e-6, err_msg=name)


def test_slot_sum_gather_matches_scatter_bitwise():
    """The transposed-gather slot-sum backend must equal the scatter
    backend BITWISE when no cell exceeds K bergs (the documented
    layout-invariance bound): same slots, same fixed tree."""
    cfg, grid, frc = world()
    st = crowded_bergs(grid, n=60, capacity=128, seed=4)
    from icebergs_tpu.grid import pos_to_cell as p2c
    i, j, xi, yj = p2c(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    w = sp.spread_weights(st, grid, cfg)[0]
    vals = [st.mass * st.mass_scaling, st.length * st.width,
            st.uvel, st.vvel]
    I_frac = jnp.ones_like(st.mass)

    def run(method):
        o9 = sp.scatter9_slots(grid, st, w, I_frac, vals, st.alive,
                               K=16, method=method)
        oc = sp.scatter_cell_deterministic(grid, st, vals[:2], st.alive,
                                           K=16, method=method)
        return [np.asarray(x) for x in sp.sum_slots(o9) + oc]

    a = run("scatter")
    b = run("gather")
    for k, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(x, y, err_msg=str(k))


def test_slot_backends_full_step_with_melt_death():
    """Full coupling step (thermo death + deferred melt cols + spread)
    must be bitwise identical across slot-sum backends, including the
    final melt flux of a berg that dies mid-step (the original-frame
    scatter_t uses sort-time keys so dying rows keep their slot)."""
    import icebergs_tpu.model as model
    import dataclasses as _dc
    cfg, grid, frc = world()
    cfg = _dc.replace(cfg, dt=36000.0)
    frc = ibt.uniform_forcing(NX, NY, uo=0.5, ua=15.0, sst=20.0, sss=33.0)
    st = crowded_bergs(grid, n=50, capacity=128, seed=9)
    # one tiny berg that fully melts within a step
    import jax.numpy as jnp
    st = st.replace(mass=jnp.where(jnp.arange(128) == 3, 5.e2, st.mass),
                    thickness=jnp.where(jnp.arange(128) == 3, 0.05,
                                        st.thickness),
                    width=jnp.where(jnp.arange(128) == 3, 2.0, st.width),
                    length=jnp.where(jnp.arange(128) == 3, 2.5, st.length))
    from icebergs_tpu.grid import pos_to_cell as p2c
    i, j, xi, yj = p2c(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    outs = {}
    for m in ("scatter", "gather", "scatter_t"):
        step = model.make_step(grid, cfg.replace(slot_sum_method=m),
                               with_thermo=True, jit=False)
        s2, d = step(st, frc)
        outs[m] = (s2, d)
    s0, d0 = outs["scatter"]
    assert int(jnp.sum(s0.alive)) < 50, "a berg must die in this step"
    for m in ("gather", "scatter_t"):
        s1, d1 = outs[m]
        for f in ("mass", "alive", "lon", "lat"):
            np.testing.assert_array_equal(np.asarray(getattr(s0, f)),
                                          np.asarray(getattr(s1, f)),
                                          err_msg=f"{m}:{f}")
        for f in ("floating_melt", "berg_melt", "spread_mass", "mass",
                  "virtual_area"):
            np.testing.assert_array_equal(np.asarray(getattr(d0, f)),
                                          np.asarray(getattr(d1, f)),
                                          err_msg=f"{m}:{f}")
