"""A68a hindcast runner: the TPU analog of the reference's a68_test
(driver transient-data branch, driver/icebergs_driver.F90:330-443 +
a68_test/makeberg/makeberg.py).

Loads the four GFDL forcing files (grid / NCEP wind / OSCAR ocean /
DUACS SSH, hourly, 0.125-degree) from --data-dir when present; with
--synthetic it writes schema-identical synthetic fixtures instead, so the
full pipeline (loader -> hourly forcing swap -> MTS/DEM conglomerate ->
trajectories) runs without the (non-redistributable) observational data.

  python tools/run_a68.py --synthetic --hours 12 --out a68_out
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def write_synthetic(d, ni=48, nj=32, nt=48, lon0=-38.0, lat0=-56.0):
    """Schema-identical synthetic forcing (rotating wind over a shear
    ocean jet) for pipeline runs without the observational files."""
    from scipy.io import netcdf_file
    from icebergs_tpu.io import a68

    lon = lon0 + a68.GRES * np.arange(ni)
    lat = lat0 + a68.GRES * np.arange(nj)
    with netcdf_file(os.path.join(d, a68.GRID_FILE), "w") as f:
        f.createDimension("lon", ni)
        f.createDimension("lat", nj)
        L, T = np.meshgrid(lon, lat, indexing="ij")
        f.createVariable("longitude", "d", ("lon", "lat"))[:] = L
        f.createVariable("latitude", "d", ("lon", "lat"))[:] = T

    t = np.arange(nt)[:, None, None]
    Y = np.linspace(0, 1, nj)[None, None, :]

    def write3(fname, fields):
        with netcdf_file(os.path.join(d, fname), "w") as f:
            f.createDimension("time", nt)
            f.createDimension("lon", ni)
            f.createDimension("lat", nj)
            for name, arr in fields.items():
                v = f.createVariable(name, "d", ("time", "lon", "lat"))
                v[:] = arr * np.ones((nt, ni, nj))

    write3(a68.WIND_FILE, {
        "ua": 6. * np.cos(2 * np.pi * t / 24.),
        "va": 6. * np.sin(2 * np.pi * t / 24.)})
    write3(a68.OCEAN_FILE, {
        "uo": 0.3 * np.sin(np.pi * Y) * np.ones_like(t),
        "vo": 0.05 * np.ones((nt, ni, nj))})
    write3(a68.SSH_FILE, {"SSH": 0.05 * np.sin(np.pi * Y)
                          * np.cos(2 * np.pi * t / 48.)})


def a68_config(dt=60.0, regular=True):
    import icebergs_tpu as ibt
    # the a68_test namelist configuration (mts + dem + contact distance).
    # regular=False exercises the general quad-cell localization
    # (pos_within_cell/calc_xiyj) on the a68 metric.
    return ibt.IcebergsConfig(
        grid_is_latlon=True, grid_is_regular=regular, Lx=360., dt=dt,
        Runge_not_Verlet=False, mts=True, mts_sub_steps=18,
        explicit_inner_mts=True, dem=True, dem_spring_coef=5.e6,
        dem_damping_coef=1.0, interactive_icebergs_on=True,
        iceberg_bonds_on=True, spring_coef=1.e-5,
        contact_spring_coef=1.e-8, contact_distance=2000.,
        manually_initialize_bonds=True,
        manually_initialize_bonds_from_radii=True,
        allow_bergs_to_roll=False, set_melt_rates_to_zero=True,
        max_bonds=6, hexagonal_icebergs=False)


def a68_long_run_config(substeps=90):
    """The paper's long-run configuration (tests/a68_test/long_run.nml +
    long_run_for_paper.sh: ss=90, gc=1e4, ns=18e3, dt=1800, 432 h,
    472 elements): MTS+DEM with per-substep stress fracture,
    broken-bond substep contact, short-step grounding, constant-L/W
    interactions, mixed melting."""
    import icebergs_tpu as ibt
    return ibt.IcebergsConfig(
        grid_is_latlon=True, grid_is_regular=True, Lx=360., dt=1800.,
        Rearth=6363827., Runge_not_Verlet=False,
        mts=True, mts_sub_steps=substeps, explicit_inner_mts=True,
        dem=True, dem_spring_coef=5.e6, dem_damping_coef=1.0,
        poisson=0.3, interactive_icebergs_on=True, iceberg_bonds_on=True,
        spring_coef=0.00065359477124183, contact_spring_coef=1.e-7,
        contact_distance=4.e3, force_convergence=True,
        convergence_tolerance=1e-4,
        use_broken_bonds_for_substep_contact=True,
        break_bonds_on_sub_steps=True, short_step_mts_grounding=True,
        constant_interaction_LW=True,
        fracture_criterion="stress", frac_thres_scaling=1.,
        frac_thres_n=18.e3, frac_thres_t=100.e3,
        cdrag_grounding=1.e4, h_to_init_grounding=0.,
        use_mixed_melting=True,
        manually_initialize_bonds=True,
        manually_initialize_bonds_from_radii=True,
        allow_bergs_to_roll=False, max_bonds=6,
        hexagonal_icebergs=False)


def build_a68_berg(grid, cfg, *, lon_c, lat_c, R_m=12e3, r_m=1500.,
                   thickness=200., capacity=512, square=False,
                   aspect=2.5):
    """Conglomerate standing in for the A68a outline (makeberg.py
    rasterizes the real outline; same element conventions).

    ``square=True`` uses the A68 makeberg's element_type='square'
    convention (width = 2r = packing distance -> DEM rest lengths are
    unstressed) over an elliptical outline of the real berg's ~2.5:1
    aspect; hex packing otherwise."""
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.ops import forces
    import makeberg

    if square:
        arrays = makeberg.gen_squarepack(r_m, R=R_m, b=R_m / aspect,
                                         thickness=thickness)
        # the A68 makeberg prescribes a uniform initial drift
        # (-uvel=0.22, a68_test/makeberg/RUN): dropping 473 elements at
        # rest into a sheared jet rings the bonds at ~the fracture
        # threshold before drag equilibrates
        arrays["uvel"] = np.full(len(arrays["lon"]), 0.22)
        arrays["vvel"] = np.zeros(len(arrays["lon"]))
    else:
        arrays = makeberg.gen_hexpack(r_m, shape="circle", R=R_m,
                                      thickness=thickness)
    # meters -> degrees around the anchor; longitude scaled by EACH
    # element's own latitude (the makeberg's adjust_lat_ref=True,
    # a68_test/makeberg RUN): one global cos(lat_c) stretches off-center
    # rows by tens of meters — far beyond the DEM fracture strain
    mlat = 1. / ((np.pi / 180.) * cfg.Rearth)
    lat_el = lat_c + arrays["lat"] * mlat
    arrays["lon"] = lon_c + arrays["lon"] * mlat / np.cos(
        np.radians(lat_el))
    arrays["lat"] = lat_el
    st = ibt.create_bergs(capacity, max_bonds=cfg.max_bonds, **arrays)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, 360.)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)
    # radii rule (1.25*(R1+R2), icebergs.F90:423-427) bonds adjacent
    # elements only at 2r spacing: R=0.93r -> crit 2.33r < 3.46r
    st = forces.initialize_bonds_host(st, cfg)
    st = forces.compute_conglom_ids_host(st)
    return st


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default=".")
    p.add_argument("--out", default="a68_out")
    p.add_argument("--hours", type=int, default=12)
    p.add_argument("--dt", type=float, default=60.)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--curvilinear", action="store_true",
                   help="general quad-cell localization "
                        "(grid_is_regular=False)")
    p.add_argument("--R", type=float, default=12e3,
                   help="conglomerate radius (m)")
    p.add_argument("--radius", type=float, default=1500.,
                   help="element radius (m)")
    p.add_argument("--long-run", action="store_true",
                   help="the paper's 472-element 432 h configuration "
                        "(long_run.nml + long_run_for_paper.sh)")
    p.add_argument("--substeps", type=int, default=90)
    a = p.parse_args()
    if a.long_run:
        # square-packed ellipse (2.5:1, the real berg's aspect): 473
        # elements — the reference's outline raster gives 472; a square
        # lattice in a smooth outline cannot land on 472 exactly
        a.R = 60600.
        a.dt = 1800.
        a.hours = a.hours if a.hours != 12 else 432

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the container's sitecustomize force-registers the axon TPU
        # plugin and overrides the env var; the config knob wins
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import icebergs_tpu as ibt
    from icebergs_tpu.io import a68, trajectory as tio, restart as rio
    from icebergs_tpu import diag

    cfg = (a68_long_run_config(a.substeps) if a.long_run
           else a68_config(a.dt, regular=not a.curvilinear))
    if a.synthetic:
        os.makedirs(a.data_dir, exist_ok=True)
        if not os.path.exists(os.path.join(a.data_dir, a68.GRID_FILE)):
            # domain sized to the run: 432 h x 0.3 m/s ~ 470 km of drift
            # must stay inside, or the berg piles up on the east wall
            ni = 160 if a.long_run else 48
            nj = 64 if a.long_run else 32
            write_synthetic(a.data_dir, ni=ni, nj=nj,
                            nt=max(48, a.hours + 2))
    missing = [f for f in (a68.GRID_FILE, a68.WIND_FILE, a68.OCEAN_FILE,
                           a68.SSH_FILE)
               if not os.path.exists(os.path.join(a.data_dir, f))]
    if missing:
        raise SystemExit("run_a68: missing forcing files in "
                         f"{a.data_dir}: {missing} (use --synthetic)")

    data = a68.load_a68(a.data_dir, cfg)
    grid = data.grid
    lon_c = float(np.asarray(grid.lon0)) + 0.35 * grid.nx \
        * float(np.asarray(grid.dlon))
    lat_c = float(np.asarray(grid.lat0)) + 0.5 * grid.ny \
        * float(np.asarray(grid.dlat))
    st = build_a68_berg(grid, cfg, lon_c=lon_c, lat_c=lat_c, R_m=a.R,
                        r_m=a.radius, square=a.long_run)
    from icebergs_tpu.ops import forces as _fo
    cfg = _fo.set_constant_interaction_length_and_width(cfg, st)
    n0 = int(np.asarray(st.alive).sum())
    print(f"run_a68: {n0} elements, "
          f"{int(np.asarray(st.n_bonds).sum())} directed bonds, "
          f"grid {grid.nx}x{grid.ny}, {data.n_hours} forcing hours",
          flush=True)

    step = ibt.make_step(grid, cfg, with_thermo=True)
    steps_per_hr = max(1, int(round(3600. / cfg.dt)))
    nsteps = a.hours * steps_per_hr
    buf = tio.init_traj_buffer(st.capacity, nsamples=a.hours + 2, cfg=cfg)
    b0 = diag.compute_budgets(st, None)
    t0 = time.time()
    for n in range(nsteps):
        frc = a68.forcing_at_hour(data, n // steps_per_hr)
        st, d = step(st, frc)
        if (n + 1) % steps_per_hr == 0:
            hr = (n + 1) // steps_per_hr
            buf = tio.record_posn(buf, st, cfg, day=hr / 24., year=2020)
            print(f"hour {hr}/{a.hours}: bergs={int(d.nbergs)} "
                  f"wall={time.time() - t0:.1f}s", flush=True)
    b1 = diag.compute_budgets(st, None)
    diag.report_budget("a68", b0, b1, nsteps * cfg.dt)
    has = np.asarray(st.bond_idx) >= 0
    intact = int(np.sum(has & (np.asarray(st.bond_broken) < 0.5)))
    print(f"run_a68: bonds intact {intact}/{int(has.sum())} "
          f"(fractured {int(has.sum()) - intact})")
    draught = (cfg.rho_bergs / 1025.) * np.asarray(st.thickness)
    grounded = int(np.sum(np.asarray(st.alive)
                          & (draught > np.asarray(st.od))))
    print(f"run_a68: grounded elements {grounded}")
    cs, nb = diag.berg_chksum(st)
    print(f"run_a68: chksum={int(cs)} #={int(nb)}")
    # wall clock per simulated day — the reference driver prints this
    # line every write_time_inc (icebergs_driver.F90:355-366)
    wall = time.time() - t0
    days = a.hours / 24.
    print(f"run_a68: {wall:.1f}s for {days:.2f} simulated days = "
          f"{wall / max(days, 1e-9):.1f} s per simulated day", flush=True)

    os.makedirs(a.out, exist_ok=True)
    import json
    with open(os.path.join(a.out, "a68_hindcast.json"), "w") as f:
        json.dump({"elements": n0, "nbergs_end": int(nb),
                   "chksum": int(cs),
                   "bonds_intact": intact,
                   "bonds_fractured": int(has.sum()) - intact,
                   "grounded": grounded,
                   "hours": a.hours, "dt": cfg.dt,
                   "substeps": int(cfg.mts_sub_steps),
                   "wall_s": round(wall, 1),
                   "s_per_sim_day": round(wall / max(days, 1e-9), 2)},
                  f, indent=1)
    tio.write_trajectories(os.path.join(a.out, "iceberg_trajectories.nc"),
                           buf, cfg)
    rio.write_restart_bergs(os.path.join(a.out, "icebergs.res.nc"), st,
                            cfg)
    rio.write_restart_bonds(os.path.join(a.out, "bonds_iceberg.res.nc"),
                            st, cfg)
    secs = time.time() - t0
    print(f"run_a68: {nsteps} steps ({a.hours} h) in {secs:.1f}s "
          f"({nsteps / max(secs, 1e-9):.2f} steps/s)")


if __name__ == "__main__":
    main()
