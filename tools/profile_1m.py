"""Component breakdown of the 1M-berg step on the current device.

Times (a) full step, (b) no interactions, (c) no thermo, and isolated
kernels: binning+tables, pair precompute, pair eval. Chains a
data-dependent perturbation between reps so the runtime can't cache."""

import time

import numpy as np


def timeit(fn, st, frc, reps=3):
    import jax
    out = jax.block_until_ready(fn(st, frc))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(st, frc))
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu import model
    from icebergs_tpu.ops import forces

    NBERGS = 1_000_000
    NX = NY = 512
    DXY = 2000.0
    MAX_PER_CELL = 6

    cfg = ibt.IcebergsConfig(
        grid_is_latlon=False, Lx=-1.0, use_f_plane=True, lat_ref=45.0,
        dt=600.0, Runge_not_Verlet=False, interactive_icebergs_on=True,
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

    print("device:", jax.devices()[0])

    variants = {
        "full": model.make_step(grid, cfg, with_thermo=True,
                                max_per_cell=MAX_PER_CELL),
        "no_interactions": model.make_step(grid, cfg, with_thermo=True,
                                           with_interactions=False),
        "no_thermo": model.make_step(grid, cfg, with_thermo=False,
                                     max_per_cell=MAX_PER_CELL),
        "dynamics_only": model.make_step(grid, cfg, with_thermo=False,
                                         with_interactions=False),
    }
    for name, step in variants.items():
        fn = lambda s, f, _step=step: _step(s, f)[0]
        print(f"{name}: {timeit(fn, st, frc):.4f} s", flush=True)

    # isolated kernels
    @jax.jit
    def k_tables(s, f):
        nbr = forces.build_neighbor_tables(s, grid, cfg, MAX_PER_CELL)
        return s.replace(lon=s.lon + 1e-6 * nbr.cand_valid.sum(1))

    @jax.jit
    def k_precompute(s, f):
        nbr = forces.build_neighbor_tables(s, grid, cfg, MAX_PER_CELL)
        pd = forces.precompute_pair_data(s, cfg, nbr.cand_idx,
                                         nbr.cand_valid, bonded=False,
                                         use_c_crit_dist=False)
        return s.replace(lon=s.lon + 1e-6 * pd.P11.sum(1))

    @jax.jit
    def k_precompute_eval(s, f):
        nbr = forces.build_neighbor_tables(s, grid, cfg, MAX_PER_CELL)
        pd = forces.precompute_pair_data(s, cfg, nbr.cand_idx,
                                         nbr.cand_valid, bonded=False,
                                         use_c_crit_dist=False)
        ia = forces.eval_pair_ia(pd, cfg, s.uvel, s.vvel, s.uvel, s.vvel)
        return s.replace(lon=s.lon + 1e-6 * ia.IA_x)

    @jax.jit
    def k_bin_only(s, f):
        buckets, order = forces.bin_bergs(s, grid, cfg, MAX_PER_CELL)
        return s.replace(lon=s.lon + 1e-6 * buckets[:5, 0].sum())

    for name, fn in (("bin_only", k_bin_only), ("tables", k_tables),
                     ("tables+precompute", k_precompute),
                     ("tables+precompute+eval", k_precompute_eval)):
        print(f"{name}: {timeit(fn, st, frc):.4f} s", flush=True)


if __name__ == "__main__":
    main()
