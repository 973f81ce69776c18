"""Beam validation experiments at the reference's substep counts.

cbeam: tests/dem_cbeam_test (90 elements, 3x30, cantilever end load,
       mts_sub_steps=2000, nmax=300 at ibdt=100 s)
ssbeam: tests/dem_ssbeam_test (29 elements, 1 row of 0.5 m elements,
       center load, mts_sub_steps=1e5, nmax=10 at ibdt=1 s)

Prints tip/midspan deflection vs the animator's analytic line every
few outer steps so convergence is visible.

ssbeam REQUIRES f64 (enabled automatically): 0.5 m elements at
x ~ 101 km sit below f32 position resolution (ulp ~ 0.008 m there).

Usage: python tools/beam_experiment.py {cbeam|ssbeam} [substeps] [nsteps]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# force CPU: the container env pins JAX_PLATFORMS=axon (the tunneled
# dev TPU) and these experiments must not contend with TPU benches
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if (sys.argv[1:] or ["cbeam"])[0] == "ssbeam" or "--f64" in sys.argv:
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import icebergs_tpu as ibt                      # noqa: E402
from icebergs_tpu.grid import pos_to_cell       # noqa: E402
from icebergs_tpu.ops import forces             # noqa: E402
from icebergs_tpu.model import make_multi_step  # noqa: E402


def dem_cfg(**kw):
    base = dict(
        grid_is_latlon=False, Lx=300.e3, use_f_plane=True, lat_ref=0.,
        Runge_not_Verlet=False, dem=True, mts=True,
        poisson=0.3, dem_damping_coef=0.7, dem_spring_coef=1.e9,
        force_convergence=True, convergence_tolerance=1e-8,
        contact_distance=2000.0, contact_spring_coef=1.e-8,
        cdrag_grounding=3.16e6, h_to_init_grounding=200.0,
        fracture_criterion='none', spring_coef=1.e-5,
        radial_damping_coef=0., tangental_damping_coef=0.,
        scale_damping_by_pmag=False, critical_interaction_damping_on=False,
        tang_crit_int_damp_on=False,
        iceberg_bonds_on=True, interactive_icebergs_on=True,
        only_interactive_forces=True, max_bonds=4,
        manually_initialize_bonds=True,
        manually_initialize_bonds_from_radii=True,
        allow_bergs_to_roll=False, set_melt_rates_to_zero=True,
        explicit_inner_mts=True, hexagonal_icebergs=False)
    base.update(kw)
    return ibt.IcebergsConfig(**base)


def build_cbeam(cfg):
    r, xs, ys, h, rho = 2500.0, 101.e3, 151.e3, 1.0, 900.0
    area = (2 * r) ** 2
    lon, lat, static = [], [], []
    for row in range(3):
        for col in range(30):
            lon.append(xs + col * 2 * r)
            lat.append(ys + row * 2 * r)
            static.append(1.0 if col == 0 else 0.0)
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 15000., 15000.,
                                 grid_is_latlon=False)
    st = ibt.create_bergs(128, lon=lon, lat=lat, thickness=h,
                          width=np.sqrt(area), length=np.sqrt(area),
                          mass=h * rho * area, mass_scaling=1.0,
                          static_berg=static, max_bonds=4)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = forces.initialize_bonds_host(st.replace(ine=i, jne=j, xi=xi,
                                                 yj=yj), cfg)
    return grid, st


def build_ssbeam(cfg, dtype=None):
    # dem_ssbeam_test/makeberg: 29 elements, r=0.25, all at y=151e3+0.5;
    # element 1 at xs, elements 2..29 advance by 2r=0.5 m each
    r, xs, ys, h, rho = 0.25, 101.e3, 151.e3, 1.0, 800.0
    area = (2 * r) ** 2
    lat = [ys + 2 * r] * 29
    lon = [xs]
    x = xs
    for k in range(2, 30):
        x += 2 * r
        lon.append(x)
    import jax.numpy as jnp
    dtype = dtype or jnp.float64
    grid = ibt.make_uniform_grid(20, 20, 0., 0., 15000., 15000.,
                                 grid_is_latlon=False, dtype=dtype)
    st = ibt.create_bergs(32, lon=lon, lat=lat, thickness=h,
                          width=np.sqrt(area), length=np.sqrt(area),
                          mass=h * rho * area, mass_scaling=1.0,
                          max_bonds=4, dtype=dtype)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = forces.initialize_bonds_host(st.replace(ine=i, jne=j, xi=xi,
                                                 yj=yj), cfg)
    return grid, st


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cbeam"
    if which == "cbeam":
        substeps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
        nsteps = int(sys.argv[3]) if len(sys.argv) > 3 else 300
        cfg = dem_cfg(dt=100.0, mts_sub_steps=substeps, dem_beam_test=2,
                      rho_bergs=900., orig_dem_moment_of_inertia=True)
        grid, st = build_cbeam(cfg)
        nb = int(np.sum(np.asarray(st.bond_idx) >= 0))
        print(f"cbeam: {int(st.count())} elements, {nb} bonds, "
              f"substeps={substeps}", flush=True)
        E, P, l, hgt = 1.e9, 1.5e10, 29 * 5000., 3 * 5000.
        I = hgt ** 3 / 12.
        w_tip = -P * l ** 3 / (3 * E * I)
        tip = 1 * 30 + 29
        y0 = 156.e3
        chunk = 25
    else:
        substeps = int(sys.argv[2]) if len(sys.argv) > 2 else 100000
        nsteps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
        cfg = dem_cfg(dt=1.0, mts_sub_steps=substeps, dem_beam_test=1,
                      rho_bergs=800.)
        grid, st = build_ssbeam(cfg)
        nb = int(np.sum(np.asarray(st.bond_idx) >= 0))
        print(f"ssbeam: {int(st.count())} elements, {nb} bonds, "
              f"substeps={substeps}", flush=True)
        E, P, l, hgt = 1.e9, 1.5e5, 14.0, 0.5
        I = hgt ** 3 / 12.
        w_tip = -P * l ** 3 / (48 * E * I)
        tip = 14                       # midspan element (x = 101e3 + 7)
        y0 = 151.e3 + 0.5
        chunk = 1

    frc = ibt.uniform_forcing(20, 20, sst=-2., dtype=st.dtype)
    multi = make_multi_step(grid, cfg, chunk, with_thermo=False)
    import time
    t0 = time.time()
    for k in range(nsteps // chunk):
        st = jax.block_until_ready(multi(st, frc))
        defl = float(np.asarray(st.lat)[tip]) - y0
        err = abs(defl - w_tip) / abs(w_tip)
        print(f"step {(k+1)*chunk:4d}: defl={defl:.4f} analytic={w_tip:.4f}"
              f" err={100*err:.1f}%  wall={time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
