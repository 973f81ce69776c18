#!/usr/bin/env python
"""Animate/plot iceberg trajectories from iceberg_trajectories.nc.

The analog of the reference's tests/*/animate_trajectories.py: reads the
trajectory NetCDF written by icebergs_tpu, plots particle positions per
sample (sized by element radius), and optionally overlays the analytic
Euler-Bernoulli deflection line for the DEM beam tests.

Usage: tools/animate_trajectories.py -fname iceberg_trajectories.nc
       [-o out.png] [--beam cantilever|ss] [--gif out.gif]
"""

import argparse

import numpy as np
from scipy.io import netcdf_file


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-fname", default="iceberg_trajectories.nc")
    p.add_argument("-o", default="trajectories.png")
    p.add_argument("--beam", default=None, choices=[None, "cantilever", "ss"])
    p.add_argument("--bonds", default=None,
                   help="bond_trajectories.nc: overlay bond segments at "
                        "the latest sample")
    p.add_argument("--gif", default=None)
    a = p.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with netcdf_file(a.fname, "r", mmap=False) as f:
        x = np.asarray(f.variables["lon"][:])
        y = np.asarray(f.variables["lat"][:])
        day = np.asarray(f.variables["day"][:])
        ids = (np.asarray(f.variables["id_cnt"][:]).astype(np.int64) << 32
               | np.asarray(f.variables["id_ij"][:]))

    fig, ax = plt.subplots(figsize=(8, 6))
    days = np.unique(day)
    cmap = plt.get_cmap("viridis")
    for k, d in enumerate(days):
        m = day == d
        ax.scatter(x[m] / 1e3, y[m] / 1e3, s=6,
                   color=cmap(k / max(len(days) - 1, 1)),
                   label=f"day {d:.2f}" if len(days) <= 8 else None)
    for i in np.unique(ids):
        m = ids == i
        order = np.argsort(day[m])
        ax.plot(x[m][order] / 1e3, y[m][order] / 1e3, lw=0.4, color="gray",
                alpha=0.5)

    if a.bonds:
        # bond overlay (tests/*/animate_trajectories.py bond segments):
        # each record holds the FIRST berg's position; join it to its
        # partner's record at the same sample by id
        with netcdf_file(a.bonds, "r", mmap=False) as f:
            bx = np.asarray(f.variables["lon"][:])
            by = np.asarray(f.variables["lat"][:])
            bday = np.asarray(f.variables["day"][:])
            fid = (np.asarray(f.variables["first_id_cnt"][:]).astype(
                np.int64) << 32 | np.asarray(f.variables["first_id_ij"][:]))
            oid = (np.asarray(f.variables["other_id_cnt"][:]).astype(
                np.int64) << 32 | np.asarray(f.variables["other_id_ij"][:]))
        last = bday == bday.max()
        pos = {int(i): (xx, yy) for i, xx, yy in
               zip(fid[last], bx[last], by[last])}
        for i, j, xx, yy in zip(fid[last], oid[last], bx[last], by[last]):
            if int(j) in pos:
                x2, y2 = pos[int(j)]
                ax.plot([xx / 1e3, x2 / 1e3], [yy / 1e3, y2 / 1e3],
                        "b-", lw=0.8, alpha=0.6)

    if a.beam:
        # analytic deflection line (tests/dem_cbeam_test/animate_...:149-161)
        thick = 1.0
        xa = np.linspace(0, 150000, 100)
        P = -1.5e10
        l = 29 * 5000.
        h = 3 * 5000.
        I = thick * h ** 3 / 12.
        E = 1.e9
        if a.beam == "cantilever":
            w = P * xa ** 2 * (3 * l - xa) / (6 * E * I)
        else:
            w = P / 3. * xa * (3 * l ** 2 - 4 * xa ** 2) / (48 * E * I)
        ax.plot((101.e3 + xa) / 1e3, (156.e3 + w) / 1e3, "r-",
                label="Euler-Bernoulli")

    ax.set_xlabel("x (km)")
    ax.set_ylabel("y (km)")
    ax.set_title("iceberg trajectories")
    if len(days) <= 8:
        ax.legend(fontsize=7)
    fig.savefig(a.o, dpi=130, bbox_inches="tight")
    print(f"wrote {a.o} ({len(days)} samples, {len(np.unique(ids))} bergs)")

    if a.gif:
        from matplotlib.animation import FuncAnimation, PillowWriter
        fig2, ax2 = plt.subplots(figsize=(7, 6))
        sc = ax2.scatter([], [], s=8)
        ax2.set_xlim(x.min() / 1e3 - 1, x.max() / 1e3 + 1)
        ax2.set_ylim(y.min() / 1e3 - 1, y.max() / 1e3 + 1)

        def frame(k):
            m = day == days[k]
            sc.set_offsets(np.c_[x[m] / 1e3, y[m] / 1e3])
            ax2.set_title(f"day {days[k]:.2f}")
            return sc,

        ani = FuncAnimation(fig2, frame, frames=len(days))
        ani.save(a.gif, writer=PillowWriter(fps=6))
        print(f"wrote {a.gif}")


if __name__ == "__main__":
    main()
