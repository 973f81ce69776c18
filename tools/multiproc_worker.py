"""Multi-process jax.distributed worker (VERDICT round-2 item #4).

One rank of an N-process CPU run: initializes jax.distributed against a
localhost coordinator, builds the GLOBAL 4-tile mesh over all processes'
(forced) host devices, runs the sharded coupling step over it, and
reports the order-invariant global berg chksum + per-process tiled
restart files.

The reference's analog: `srun -nN bergs.x` over `mpp_define_domains`
(icebergs_framework.F90:913-934; tests/dem_cbeam_test/RUN:5).

Usage (spawned by tests/test_multiprocess.py):
  python tools/multiproc_worker.py PID NPROC PORT OUTDIR [NSTEPS]
"""

import os
import sys

# 2 forced host devices per process BEFORE jax import
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    nsteps = int(sys.argv[5]) if len(sys.argv) > 5 else 20

    from icebergs_tpu.parallel import multihost as mh
    got = mh.initialize_multihost(f"localhost:{port}", num_processes=nproc,
                                  process_id=pid)
    assert got == nproc, (got, nproc)
    assert jax.process_index() == pid
    ndev = len(jax.devices())
    print(f"[rank {pid}] global devices: {ndev}", flush=True)

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.parallel import domain as dd
    from icebergs_tpu import diag
    from icebergs_tpu.io import restart as rio

    # the same deterministic world on every rank (test_parallel.py world)
    NX, NY, DXY = 32, 8, 5000.0
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0,
                             use_f_plane=True, lat_ref=30.0, dt=60.0,
                             Runge_not_Verlet=False, halo=2,
                             interactive_icebergs_on=True)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.4, sst=2.0)
    rng = np.random.RandomState(0)
    # colliding pairs straddling tile boundaries + a >=3-contact
    # cluster: interactions through the PRODUCTION fused3 contact path
    # across the process boundary
    lon, lat = [], []
    for k, x in enumerate((8 * DXY, 16 * DXY, 24 * DXY)):
        lon += [x - 10.0, x + 30.0]
        lat += [4 * DXY + 120.0 * k, 4 * DXY + 120.0 * k]
    lon += [5 * DXY, 5 * DXY + 35.0, 5 * DXY + 17.0]
    lat += [3 * DXY, 3 * DXY, 3 * DXY + 30.0]
    st = ibt.create_bergs(64, lon=lon, lat=lat, mass=1e8, thickness=20.,
                          width=50., length=60., mass_scaling=1.0)
    i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
    st = st.replace(ine=i, jne=j, xi=xi, yj=yj)

    mesh = mh.make_global_mesh()
    assert mesh.devices.size == ndev
    world = dd.make_sharded_world(cfg, mesh, nx=NX, ny=NY, lon0=0.,
                                  lat0=0., dlon=DXY, dlat=DXY)
    frc_s = dd.shard_forcing(world, frc)
    st_s = dd.shard_state(world, st, local_capacity=32)
    st_s = jax.jit(jax.shard_map(
        lambda g, s: jax.tree.map(
            lambda x: x[None],
            dd.relocalize(jax.tree.map(lambda x: x[0], s),
                          jax.tree.map(lambda x: x[0], g), cfg)),
        mesh=mesh, in_specs=(P(dd.AXIS), P(dd.AXIS)),
        out_specs=P(dd.AXIS)))(world.grids, st_s)

    st_s, _ = dd.make_halo_fill(world)(st_s)
    step = dd.make_sharded_step(world, with_thermo=True,
                                neighbor_mode="fused3",
                                fused_interpret=True, fused_window=512,
                                fused_fallback_strip_width=140)
    for _ in range(nsteps):
        st_s, nbergs, total_mass, overflow = step(st_s, frc_s)

    # global order-invariant chksum: per-tile sums + psum
    @jax.jit
    @jax.shard_map(mesh=mesh, in_specs=P(dd.AXIS),
                   out_specs=P())
    def global_chksum(s):
        sl = jax.tree.map(lambda x: x[0], s)
        cs, n = diag.berg_chksum(sl)
        return (jax.lax.psum(cs, dd.AXIS)[None],
                jax.lax.psum(n, dd.AXIS)[None])

    cs, n = global_chksum(st_s)
    cs, n = int(np.asarray(cs)[0]), int(np.asarray(n)[0])
    print(f"[rank {pid}] chksum={cs} n={n} "
          f"nbergs={int(np.asarray(nbergs))}", flush=True)

    # per-process restart boundary: each rank writes only its own tiles
    paths = rio.write_restart_bergs_tiled(
        os.path.join(outdir, "icebergs.res.nc"), st_s, cfg)
    with open(os.path.join(outdir, f"rank{pid}.txt"), "w") as f:
        f.write(f"{cs} {n} {int(np.asarray(nbergs))}\n")
        for p in paths:
            f.write(os.path.basename(p) + "\n")
    print(f"[rank {pid}] wrote {len(paths)} tile files", flush=True)


if __name__ == "__main__":
    main()
