"""Quantify f32-vs-f64 drift (VERDICT weak #5).

Runs the same scenario twice through the driver — float32 and float64
(the reference's implicit -r8) — and reports max position / velocity /
mass divergence of matching berg ids at the end.

Scenarios:
  collision  the reference collision_tests/input_MTS_KID.nml config
             (16 bonded elements, converging jet), full 48 h
  drift      8 free-drifting bergs, melt on, 10 days at dt=3600

Usage: python tools/f32_vs_f64.py {collision|drift} [hours]
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# force CPU: the container env pins JAX_PLATFORMS=axon (the tunneled
# dev TPU) and these experiments must not contend with TPU benches
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _by_id(st):
    import icebergs_tpu.ids as ids
    alive = np.asarray(st.alive)
    iid = np.asarray(ids.ids_of_state(st))[alive]
    order = np.argsort(iid)
    out = {"id": iid[order]}
    for f in ("lon", "lat", "uvel", "vvel", "mass", "thickness"):
        out[f] = np.asarray(getattr(st, f), np.float64)[alive][order]
    return out


def run_scenario(which, hours, dtype):
    import icebergs_tpu as ibt
    from icebergs_tpu import driver as drv
    from icebergs_tpu.grid import pos_to_cell
    from icebergs_tpu.io import restart as rio

    tmp = tempfile.mkdtemp(prefix=f"f32f64_{which}_{dtype}_")
    if which == "collision":
        src = "/root/reference/tests/collision_tests/input_MTS_KID.nml"
        text = open(src).read().replace("ibhrs=48", f"ibhrs={hours}")
        nml = os.path.join(tmp, "input.nml")
        open(nml, "w").write(text)
        cfg, _ = __import__("icebergs_tpu.io.namelist",
                            fromlist=["x"]).config_from_namelist(nml)
        grid = ibt.make_uniform_grid(20, 20, 0., 0., 1000., 1000.,
                                     grid_is_latlon=False)
        side = 400.0
        lon, lat = [], []
        for (cx, cy) in ((5000., 7600.), (5000., 12400.)):
            for dx in (-1.5 * side, -0.5 * side, 0.5 * side, 1.5 * side):
                for dy in (-0.5 * side, 0.5 * side):
                    lon.append(cx + dx)
                    lat.append(cy + dy)
        st = ibt.create_bergs(64, lon=lon, lat=lat,
                              mass=850. * 100 * side * side, thickness=100.,
                              width=side, length=side, mass_scaling=1.,
                              id_cnt=np.arange(len(lon)) + 1)
        i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
        rio.write_restart_bergs(os.path.join(tmp, "icebergs.res.nc"),
                                st.replace(ine=i, jne=j, xi=xi, yj=yj), cfg)
        cap = 64
    else:
        nml = os.path.join(tmp, "input.nml")
        open(nml, "w").write(f"""
&icebergs_driver_nml
  ni = 40
  nj = 40
  ibdt = 3600.0
  ibhrs = {hours}
  gridres = 2000.0
  ibuo = 0.25
  ibvo = 0.1
  ibua = 6.0
  sst = 4.0
/
&icebergs_nml
  verbose_hrs = 100000
/
""")
        cfg, _ = __import__("icebergs_tpu.io.namelist",
                            fromlist=["x"]).config_from_namelist(nml)
        grid = ibt.make_uniform_grid(40, 40, 0., 0., 2000., 2000.,
                                     grid_is_latlon=False)
        rng = np.random.RandomState(3)
        st = ibt.create_bergs(16, lon=rng.uniform(1e4, 7e4, 8),
                              lat=rng.uniform(1e4, 7e4, 8),
                              mass=850. * 60. * 300. * 300., thickness=60.,
                              width=300., length=300., mass_scaling=1.,
                              id_cnt=np.arange(8) + 1)
        i, j, xi, yj = pos_to_cell(grid, st.lon, st.lat, -1.0)
        rio.write_restart_bergs(os.path.join(tmp, "icebergs.res.nc"),
                                st.replace(ine=i, jne=j, xi=xi, yj=yj), cfg)
        cap = 16

    st = drv.run(nml, input_dir=tmp, output_dir=os.path.join(tmp, "out"),
                 capacity=cap, verbose=False, dtype=dtype)
    return _by_id(st)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "drift"
    hours = int(sys.argv[2]) if len(sys.argv) > 2 else (
        48 if which == "collision" else 240)
    a = run_scenario(which, hours, "float32")
    b = run_scenario(which, hours, "float64")
    assert len(a["id"]) == len(b["id"]) and np.all(a["id"] == b["id"]), \
        (len(a["id"]), len(b["id"]))
    print(f"\n=== {which} over {hours} h: f32 vs f64 "
          f"({len(a['id'])} bergs) ===")
    for f in ("lon", "lat", "uvel", "vvel", "mass", "thickness"):
        d = np.abs(a[f] - b[f])
        scale = np.maximum(np.abs(b[f]).max(), 1e-30)
        print(f"{f:10s} max|d|={d.max():.6e}  rel={d.max()/scale:.3e}")


if __name__ == "__main__":
    main()
