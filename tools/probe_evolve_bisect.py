"""Bisect the embedded fused-ia cost inside evolve (1M bergs, real device).

Stand-alone fused-ia probes (setup + 2 full evals) measure ~230 ms while
the same chain inside ``evolve_icebergs`` costs ~700 ms; these probes
re-build evolve layer by layer around ``accel`` to find the phantom:

  accel_ia        accel() alone (2 ia evals), all outputs consumed
  accel_ia_lite   hand-rolled minimal consumption with accel's exact
                  two-eval dependency chain (u*, drag, implicit solve)
  verlet_nowalk   verlet_step minus adjust_index_and_ground
  evolve_full     the real thing (reference number)
"""

import sys

import numpy as np

from profile_phases import scan_timeit  # noqa: shared injected-dep timer


def main():
    import jax
    import jax.numpy as jnp
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu import model, dynamics
    from icebergs_tpu.ops.fused_contact import make_ia_fn_fused2
    from icebergs_tpu.ops import accel as accel_mod

    NBERGS = 1_000_000
    NX = NY = 512
    DXY = 2000.0
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
    st_i = jax.block_until_ready(jax.jit(
        lambda s: model.interp_to_bergs(s, grid, frc, cfg))(st))
    print("device:", jax.devices()[0], flush=True)

    def mk_ia(s):
        ia_fn, _ = make_ia_fn_fused2(s, grid, cfg, block_n=256, window=512,
                                     contact_cap=131072, fallback_cap=16384)
        return ia_fn

    def use_state(s, pieces):
        acc = 0.
        for p in pieces:
            acc = acc + p
        return s.replace(uvel=s.uvel + 1e-12 * acc)

    def f_accel_ia(s):
        from icebergs_tpu.dynamics import _berg_kwargs, _cached_env, _loc_dx
        from icebergs_tpu.ops.accel import accel
        ia_fn = mk_ia(s)
        out = accel(cfg, grid, **_berg_kwargs(s), env=_cached_env(s),
                    uvel=s.uvel, vvel=s.vvel, uvel0=s.uvel, vvel0=s.vvel,
                    dt=cfg.dt, axn_in=s.axn, ayn_in=s.ayn,
                    loc_dx=_loc_dx(grid, s.ine, s.jne), ia_fn=ia_fn)
        return use_state(s, [out.ax, out.ay, out.axn, out.ayn,
                             out.bxn, out.byn])

    def f_accel_ia_lite(s):
        # accel's dependency SHAPE (eval1 -> solve -> uveln -> eval2 ->
        # solve) with only ~10 elementwise ops between evals
        ia_fn = mk_ia(s)
        dt = cfg.dt
        u_star = s.uvel + s.axn * (dt / 2.)
        v_star = s.vvel + s.ayn * (dt / 2.)
        ia = ia_fn(s.uvel, s.vvel)
        A11 = 1. + dt * ia.P11
        A12 = dt * ia.P12
        A22 = 1. + dt * ia.P22
        det = 1. / (A11 * A22 - A12 * A12)
        rx = ia.IA_x - (ia.P11 * u_star + ia.P12 * v_star) + ia.Pu_x
        ry = ia.IA_y - (ia.P12 * u_star + ia.P22 * v_star) + ia.Pu_y
        un = u_star + dt * det * (A22 * rx - A12 * ry)
        vn = v_star + dt * det * (A11 * ry - A12 * rx)
        ia2 = ia_fn(un, vn)
        rx = ia2.IA_x - (ia2.P11 * u_star + ia2.P12 * v_star) + ia2.Pu_x
        ry = ia2.IA_y - (ia2.P12 * u_star + ia2.P22 * v_star) + ia2.Pu_y
        un2 = u_star + dt * rx
        vn2 = v_star + dt * ry
        return use_state(s, [un2, vn2])

    def f_verlet_nowalk(s):
        from icebergs_tpu.dynamics import (_berg_kwargs, _cached_env,
                                           _loc_dx, _advance_position)
        from icebergs_tpu.ops.accel import accel
        ia_fn = mk_ia(s)
        dt = cfg.dt
        dt_2 = 0.5 * dt
        out = accel(cfg, grid, **_berg_kwargs(s), env=_cached_env(s),
                    uvel=s.uvel, vvel=s.vvel, uvel0=s.uvel, vvel0=s.vvel,
                    dt=dt, axn_in=s.axn, ayn_in=s.ayn,
                    loc_dx=_loc_dx(grid, s.ine, s.jne), ia_fn=ia_fn)
        uveln = (s.uvel + dt_2 * s.axn) + dt * out.ax
        vveln = (s.vvel + dt_2 * s.ayn) + dt * out.ay
        moving = s.alive & (s.static_berg < 0.5)
        sel = lambda new, old: jnp.where(moving, new, old)
        s = s.replace(axn=sel(out.axn, s.axn), ayn=sel(out.ayn, s.ayn),
                      bxn=sel(out.bxn, s.bxn), byn=sel(out.byn, s.byn),
                      uvel=sel(uveln, s.uvel), vvel=sel(vveln, s.vvel))
        uvel2 = s.uvel + dt_2 * (s.axn + s.bxn)
        vvel2 = s.vvel + dt_2 * (s.ayn + s.byn)
        lonn, latn = _advance_position(grid, cfg, s.lon, s.lat,
                                       uvel2, vvel2, dt)
        return s.replace(lon=sel(lonn, s.lon), lat=sel(latn, s.lat))

    def f_evolve_full(s):
        ia_fn = mk_ia(s)
        out = dynamics.evolve_icebergs(s, grid, frc, cfg, ia_fn=ia_fn)
        return out.state

    def f_verlet_step(s):
        ia_fn = mk_ia(s)
        out = dynamics.verlet_step(s, grid, frc, cfg, ia_fn=ia_fn)
        return out.state

    def f_verlet_step_scalars(s):
        # + the tickets/nbounce scalar reductions
        ia_fn = mk_ia(s)
        out = dynamics.verlet_step(s, grid, frc, cfg, ia_fn=ia_fn)
        return out.state.replace(
            uvel=out.state.uvel
            + 1e-12 * (out.tickets + out.bounced).astype(s.dtype))

    def f_verlet_barrier(s):
        # verlet_step with an optimization_barrier between the accel/ia
        # chain and the position/walk chain: discriminates cross-fusion
        # scheduling pathology from real op cost
        import jax as _jax
        from icebergs_tpu.dynamics import (_berg_kwargs, _cached_env,
                                           _loc_dx, _advance_position,
                                           adjust_index_and_ground)
        ia_fn = mk_ia(s)
        dt = cfg.dt
        dt_2 = 0.5 * dt
        out = accel_mod.accel(
            cfg, grid, **_berg_kwargs(s), env=_cached_env(s),
            uvel=s.uvel, vvel=s.vvel, uvel0=s.uvel, vvel0=s.vvel,
            dt=dt, axn_in=s.axn, ayn_in=s.ayn,
            loc_dx=_loc_dx(grid, s.ine, s.jne), ia_fn=ia_fn)
        uveln = (s.uvel + dt_2 * s.axn) + dt * out.ax
        vveln = (s.vvel + dt_2 * s.ayn) + dt * out.ay
        uvel_prev = s.uvel - dt_2 * s.bxn
        vvel_prev = s.vvel - dt_2 * s.byn
        moving = s.alive & (s.static_berg < 0.5)
        sel = lambda new, old: jnp.where(moving, new, old)
        s = s.replace(axn=sel(out.axn, s.axn), ayn=sel(out.ayn, s.ayn),
                      bxn=sel(out.bxn, s.bxn), byn=sel(out.byn, s.byn),
                      uvel=sel(uveln, s.uvel), vvel=sel(vveln, s.vvel),
                      uvel_prev=sel(uvel_prev, s.uvel_prev),
                      vvel_prev=sel(vvel_prev, s.vvel_prev))
        s = _jax.lax.optimization_barrier(s)
        uvel2 = s.uvel + dt_2 * (s.axn + s.bxn)
        vvel2 = s.vvel + dt_2 * (s.ayn + s.byn)
        lonn, latn = _advance_position(grid, cfg, s.lon, s.lat,
                                       uvel2, vvel2, dt)
        lonn, latn, i, j, xi, yj, bounced = adjust_index_and_ground(
            grid, cfg, lonn, latn, s.ine, s.jne)
        s = s.replace(lon=sel(lonn, s.lon), lat=sel(latn, s.lat),
                      ine=jnp.where(moving, i, s.ine),
                      jne=jnp.where(moving, j, s.jne),
                      xi=sel(xi, s.xi), yj=sel(yj, s.yj))
        s = s.replace(uvel_old=sel(s.uvel, s.uvel_old),
                      vvel_old=sel(s.vvel, s.vvel_old),
                      lon_old=sel(s.lon, s.lon_old),
                      lat_old=sel(s.lat, s.lat_old))
        return s

    only = sys.argv[1:] if len(sys.argv) > 1 else None
    for name, fn in (("accel_ia_lite", f_accel_ia_lite),
                     ("accel_ia", f_accel_ia),
                     ("verlet_nowalk", f_verlet_nowalk),
                     ("verlet_step", f_verlet_step),
                     ("verlet_step_scalars", f_verlet_step_scalars),
                     ("verlet_barrier", f_verlet_barrier),
                     ("evolve_full", f_evolve_full)):
        if only and name not in only:
            continue
        try:
            t = scan_timeit(fn, st_i)
            print(f"{name}: {t*1e3:.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    import jax.numpy as jnp  # noqa: used in closures
    main()
