"""Breakdown of the dynamics-only block at 1M bergs: interp vs evolve
(accel + verlet + index walk) vs the index walk alone."""

import time

import numpy as np


def timeit(fn, arg, reps=3):
    """Chain the output back in so no rep can be served from a cache."""
    import jax
    out = jax.block_until_ready(fn(arg))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(out))
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu import model, dynamics

    NBERGS = 1_000_000
    NX = NY = 512
    DXY = 2000.0
    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=45.0,
        dt=600.0, Runge_not_Verlet=False, interactive_icebergs_on=False,
        use_new_predictive_corrective=True, allow_bergs_to_roll=True)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.3, vo=0.1, ua=5.0, sst=4.0,
                              sss=33.0)
    rng = np.random.RandomState(0)
    st = ibt.create_bergs(NBERGS,
                          lon=rng.uniform(2 * DXY, (NX - 2) * DXY, NBERGS),
                          lat=rng.uniform(2 * DXY, (NY - 2) * DXY, NBERGS),
                          mass=850. * 40. * 150. * 150., thickness=40.,
                          width=150., length=150., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    print("device:", jax.devices()[0], flush=True)

    @jax.jit
    def k_interp(s):
        s2 = model.interp_to_bergs(s, grid, frc, cfg)
        return s.replace(lon=s.lon + 1e-9 * s2.uo)

    @jax.jit
    def k_evolve(s):
        out = dynamics.evolve_icebergs(s, grid, frc, cfg)
        return out.state

    @jax.jit
    def k_walk(s):
        lon2, lat2, i2, j2, xi2, yj2, b = dynamics.adjust_index_and_ground(
            grid, cfg, s.lon, s.lat, s.ine, s.jne)
        return s.replace(lon=s.lon + 1e-9 * xi2)

    @jax.jit
    def k_dyn(s):
        s2 = model.interp_to_bergs(s, grid, frc, cfg)
        return dynamics.evolve_icebergs(s2, grid, frc, cfg).state

    st_i = jax.block_until_ready(jax.jit(
        lambda s: model.interp_to_bergs(s, grid, frc, cfg))(st))

    for name, fn, arg in (("interp", k_interp, st),
                          ("evolve(total)", k_evolve, st_i),
                          ("index_walk", k_walk, st_i),
                          ("interp+evolve", k_dyn, st)):
        print(f"{name}: {timeit(fn, arg):.4f} s", flush=True)


if __name__ == "__main__":
    main()
