"""True multi-process jax.distributed execution (VERDICT round-2 #4).

Spawns 2 local processes x 2 forced CPU devices each, builds the global
4-tile mesh across them (tools/multiproc_worker.py), runs the sharded
coupling step, and asserts:

* both ranks agree on the global order-invariant berg chksum;
* the multi-process chksum is BITWISE equal to the same scenario run
  single-process on 4 local devices (the reference's parallel_reprod
  contract across `srun -nN`, icebergs_framework.F90:33);
* each rank writes only its own tiles' restart files, and their union
  reassembles the global state.

The reference's multi-rank analog: tests/*/RUN with srun -n4 over
mpp_define_domains (icebergs_framework.F90:913-934).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multiproc_worker.py")
NSTEPS = 12

pytestmark = pytest.mark.slow    # ~100 s standalone: 2 spawned ranks


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference(nsteps=NSTEPS):
    """The same scenario on 4 local devices of THIS process."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    import icebergs_tpu as ibt
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.parallel import domain as dd
    from icebergs_tpu import diag

    NX, NY, DXY = 32, 8, 5000.0
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0,
                             use_f_plane=True, lat_ref=30.0, dt=60.0,
                             Runge_not_Verlet=False, halo=2,
                             interactive_icebergs_on=True)
    grid = ibt.make_uniform_grid(NX, NY, 0., 0., DXY, DXY,
                                 grid_is_latlon=False)
    frc = ibt.uniform_forcing(NX, NY, uo=0.4, sst=2.0)
    rng = np.random.RandomState(0)
    # same interactive scenario as tools/multiproc_worker.py
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

    mesh = Mesh(np.array(jax.devices()[:4]), (dd.AXIS,))
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

    import dataclasses
    from icebergs_tpu.state import BergState
    flat = {}
    for f in dataclasses.fields(st):
        a = np.asarray(jax.device_get(getattr(st_s, f.name)))
        flat[f.name] = jnp.asarray(a.reshape((-1,) + a.shape[2:]))
    merged = BergState(**flat)
    cs, n = jax.jit(diag.berg_chksum)(merged)
    return int(cs), int(n), cfg, grid


def test_two_process_distributed_matches_single_process(tmp_path):
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)           # worker sets its own 2-device flag
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), str(tmp_path),
         str(NSTEPS)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    ranks = []
    for pid in range(2):
        with open(tmp_path / f"rank{pid}.txt") as f:
            lines = f.read().split()
        ranks.append((int(lines[0]), int(lines[1]), int(lines[2]),
                      lines[3:]))
    # both ranks agree on the global chksum
    assert ranks[0][:3] == ranks[1][:3], ranks
    # ... and each wrote a DISJOINT pair of tile files
    t0, t1 = set(ranks[0][3]), set(ranks[1][3])
    assert len(t0) == 2 and len(t1) == 2 and not (t0 & t1), (t0, t1)

    # bitwise equality with the single-process 4-device run
    cs1, n1, cfg, grid = _single_process_reference()
    assert ranks[0][1] == n1
    assert ranks[0][0] == cs1, (ranks[0][0], cs1)

    # the union of per-rank tile files reassembles the global state
    from icebergs_tpu.io import restart as rio
    st = rio.read_restart_bergs_tiled(str(tmp_path / "icebergs.res.nc"),
                                      64, grid, cfg)
    assert int(st.count()) == n1
