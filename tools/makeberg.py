"""makeberg: generate iceberg initial conditions (restart files).

TPU-native analog of the reference's makeberg tooling
(``tests/dem_cbeam_test/makeberg``, ``tests/*/makeberg/
initialize_bergs_in_pattern.py``, ``a68_test/makeberg/makeberg.py``):
writes ``icebergs.res.nc`` (+ ``bonds_iceberg.res.nc``) that
``icebergs_tpu.driver`` / ``IcebergsModel`` load directly.

Modes:
  beam      N bonded elements in a row (dem_cbeam/ssbeam configurations)
  hexpack   hexagonal close packing of circular elements over a footprint
            (circle, rectangle, or a thickness raster in .npy format),
            bonded to nearest neighbors — how the reference builds tabular
            bergs ("conglomerates") out of DEM elements
  footloose a parent berg + optional child (fl_* test configurations)

Examples:
  python tools/makeberg.py beam --n 10 --radius 500 --x0 5e3 --y0 8e3 \
      --thickness 100 --out icdir
  python tools/makeberg.py hexpack --shape circle --R 4e3 --radius 400 \
      --x0 10e3 --y0 10e3 --thickness 80 --out icdir
  python tools/makeberg.py hexpack --raster thick.npy --cell 500 --radius \
      300 --out icdir
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# runnable from anywhere without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

RHO_BERGS = 850.0


def _element_arrays(x, y, radius, thickness, static=None):
    """Common element geometry: width=length chosen so the element
    footprint area equals the hexagonal packing-cell area 2*sqrt(3)*r^2,
    conserving total raster volume (the convention of the reference's
    initialize_bergs_in_pattern.py)."""
    n = len(x)
    side = np.sqrt(2.0 * np.sqrt(3.0)) * radius
    width = np.full(n, side)
    length = np.full(n, side)
    mass = RHO_BERGS * thickness * width * length
    return dict(lon=np.asarray(x, float), lat=np.asarray(y, float),
                mass=mass, thickness=np.asarray(thickness, float) *
                np.ones(n), width=width, length=length,
                mass_scaling=np.ones(n),
                static_berg=(np.zeros(n) if static is None
                             else np.asarray(static, float)),
                id_cnt=np.arange(n) + 1, id_ij=np.zeros(n, int))


def gen_beam(n, radius, x0, y0, thickness, spacing=None, axis="x"):
    """Row of touching elements (dem_cbeam_test/makeberg: N elements at
    2*radius spacing; the first is held static as the clamp)."""
    s = 2.0 * radius if spacing is None else spacing
    d = np.arange(n) * s
    x = x0 + (d if axis == "x" else np.zeros(n))
    y = y0 + (d if axis == "y" else np.zeros(n))
    static = np.zeros(n)
    static[0] = 1.0
    return _element_arrays(x, y, radius, thickness, static)


def gen_hexpack(radius, *, shape=None, R=None, Lx=None, Ly=None,
                raster=None, cell=None, x0=0.0, y0=0.0, thickness=100.0):
    """Hexagonal close packing: rows at dy = sqrt(3)*r, odd rows offset by
    r, keeping sites inside the footprint.  With ``raster`` (2-D .npy of
    thickness, meters; 0 = no ice) each site takes the raster thickness at
    its position (initialize_bergs_in_pattern.py's pattern fill)."""
    r = radius
    if raster is not None:
        ras = np.load(raster)
        Lx = ras.shape[0] * cell
        Ly = ras.shape[1] * cell
    xs, ys = [], []
    ny = int(np.floor((Ly if Ly else 2 * R) / (np.sqrt(3.) * r))) + 1
    nx = int(np.floor((Lx if Lx else 2 * R) / (2. * r))) + 1
    for j in range(ny):
        yy = j * np.sqrt(3.) * r + r
        off = r if (j % 2) else 0.0
        for i in range(nx):
            xx = i * 2. * r + r + off
            xs.append(xx)
            ys.append(yy)
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    if raster is not None:
        ii = np.clip((xs / cell).astype(int), 0, ras.shape[0] - 1)
        jj = np.clip((ys / cell).astype(int), 0, ras.shape[1] - 1)
        th = ras[ii, jj]
        keep = th > 0.
        xs, ys, th = xs[keep] + x0, ys[keep] + y0, th[keep]
        return _element_arrays(xs, ys, r, th)
    if shape == "circle":
        keep = (xs - R) ** 2 + (ys - R) ** 2 <= (R - r) ** 2
    else:                      # rectangle
        keep = (xs <= Lx - r) & (ys <= Ly - r)
    xs = xs[keep] + x0 - (R if shape == "circle" else 0.)
    ys = ys[keep] + y0 - (R if shape == "circle" else 0.)
    return _element_arrays(xs, ys, r, np.full(xs.shape, thickness))


def gen_collision(grid_res=1000.0, h_ice=300.0, Ly=20000.0):
    """The reference collision-test IC (tests/collision_tests/makeberg):
    hexagon-pack elements of radius R = (sqrt(3)/2)*0.45*grid_res over the
    circular thickness raster (thick = h_ice where the cell corner is
    within 1 km of (4.5, 4.5) km), then mirror the conglomerate about
    y = Ly/2 (initialize_bergs_in_pattern.py:905-915).  Gives 2 x 8
    hexagonal elements (#=16, tests/collision_tests/README)."""
    R = (np.sqrt(3.) / 2.) * 0.45 * grid_res
    area = (3. * np.sqrt(3.) / 2.) * (4. / 3.) * R * R
    # ice cells: corner (i*res, j*res) within 1 km of (4.5, 4.5) km
    ice = np.zeros((20, 20), bool)
    for i in range(20):
        for j in range(20):
            ice[i, j] = np.hypot(i * grid_res - 4500.,
                                 j * grid_res - 4500.) < 1000.
    xs, ys = [], []
    for i in range(2 * int(np.ceil(19000. / R))):
        x = (2. / np.sqrt(3.)) * R + np.sqrt(3.) * R * i
        if x >= 20000.:
            break
        for j in range(2 * int(np.ceil(19000. / R))):
            y = R + (i % 2) * R + 2. * R * j
            if y >= 20000.:
                break
            if ice[int(x // grid_res), int(y // grid_res)]:
                xs.append(x)
                ys.append(y)
    xs, ys = np.asarray(xs), np.asarray(ys)
    # mirrored second conglomerate (dy -> Ly - dy)
    xs = np.concatenate([xs, xs])
    ys = np.concatenate([ys, Ly - ys])
    n = len(xs)
    side = np.sqrt(area)
    return dict(lon=xs, lat=ys, mass=np.full(n, 850. * h_ice * area),
                thickness=np.full(n, h_ice), width=np.full(n, side),
                length=np.full(n, side), mass_scaling=np.ones(n),
                static_berg=np.zeros(n), id_cnt=np.arange(n) + 1,
                id_ij=np.zeros(n, int))


def gen_squarepack(radius, *, R, b=None, x0=0.0, y0=0.0,
                   thickness=200.0):
    """Square lattice of elements at 2r spacing inside a circle of
    radius R — or an ellipse with semi-minor axis ``b`` (the A68
    makeberg convention: element_type='square', width = 2r = spacing,
    so DEM rest lengths equal the packing distance and bonds start
    unstressed)."""
    r = radius
    bb = b if b is not None else R
    n = int(np.ceil(max(R, bb) / r))
    xs, ys = [], []
    for i in range(-n, n + 1):
        for j in range(-n, n + 1):
            x, y = i * 2. * r, j * 2. * r
            if (x / (R - r)) ** 2 + (y / (bb - r)) ** 2 <= 1.0:
                xs.append(x)
                ys.append(y)
    xs = np.asarray(xs) + x0
    ys = np.asarray(ys) + y0
    nb = len(xs)
    side = 2. * r
    return dict(lon=xs, lat=ys,
                mass=RHO_BERGS * thickness * side * side * np.ones(nb),
                thickness=np.full(nb, thickness), width=np.full(nb, side),
                length=np.full(nb, side), mass_scaling=np.ones(nb),
                static_berg=np.zeros(nb), id_cnt=np.arange(nb) + 1,
                id_ij=np.zeros(nb, int))


def gen_ground_frac():
    """The reference dem_ground_frac IC (tests/dem_ground_frac_test/
    makeberg/makeberg.py:240-340): one rectangular conglomerate 15 x 35 km
    of hexagon-packed r=1500 m elements centered at (50, 50) km, uniform
    thickness 200 m, drifting east at 0.1 m/s toward the Gaussian
    seamount."""
    r = 1.5e3
    rho = 850.0
    h = 200.0
    xmin, xmax = 50000. - 7500., 50000. + 7500.
    ymin, ymax = 50000. - 17500., 50000. + 17500.
    area = (3. * np.sqrt(3.) / 2.) * (4. / 3.) * r * r
    xs, ys = [], []
    j = 0
    x = xmin + r * 2. / np.sqrt(3.)
    while xmin <= x <= xmax:
        y = ymin + r + (j % 2) * r
        while y <= ymax:
            xs.append(x)
            ys.append(y)
            y += 2. * r
        j += 1
        x = xmin + r * 2. / np.sqrt(3.) + np.sqrt(3.) * r * j
    n = len(xs)
    side = np.sqrt(area)
    return dict(lon=np.asarray(xs), lat=np.asarray(ys),
                mass=np.full(n, rho * h * area),
                thickness=np.full(n, h), width=np.full(n, side),
                length=np.full(n, side), mass_scaling=np.ones(n),
                uvel=np.full(n, 0.1), vvel=np.zeros(n),
                static_berg=np.zeros(n), id_cnt=np.arange(n) + 1,
                id_ij=np.zeros(n, int))


def gen_footloose(x0, y0, thickness, width, length):
    """Single parent berg for the footloose tests (fl_test driver setup)."""
    n = 1
    return dict(lon=np.array([x0]), lat=np.array([y0]),
                mass=np.array([RHO_BERGS * thickness * width * length]),
                thickness=np.array([thickness]), width=np.array([width]),
                length=np.array([length]), mass_scaling=np.ones(n),
                static_berg=np.zeros(n), id_cnt=np.array([1]),
                id_ij=np.zeros(n, int))


def gen_footloose_pair():
    """The reference footloose_tests initial condition: two equal
    hexagonal elements side by side, bonded (the geometry computed in
    reference tests/footloose_tests/makeberg/makeberg.py:244-269 —
    grdres=5000, R_frac=0.45, thickness 300 m, square-equivalent
    width = sqrt(hexagon area))."""
    grdres = 5000.0
    xc = yc = 10000.1
    radius = (np.sqrt(3.) / 2.) * (0.45 * grdres)
    area = (3. * np.sqrt(3.) / 2.) * ((4. / 3.) * radius ** 2)
    width = np.sqrt(area)
    h = 300.0
    n = 2
    return dict(lon=np.array([xc - radius, xc + radius]),
                lat=np.array([yc, yc]),
                mass=np.full(n, RHO_BERGS * h * area),
                thickness=np.full(n, h), width=np.full(n, width),
                length=np.full(n, width), mass_scaling=np.ones(n),
                uvel=np.zeros(n), vvel=np.zeros(n),
                static_berg=np.zeros(n), id_cnt=np.arange(n) + 1,
                id_ij=np.zeros(n, int))


def write(arrays, out_dir, *, bonds=True, capacity=None, max_bonds=6,
          bond_length_factor=None):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import icebergs_tpu as ibt
    from icebergs_tpu.io import restart as rio
    from icebergs_tpu.ops import forces

    n = len(arrays["lon"])
    cap = capacity or max(8, 1 << int(np.ceil(np.log2(n + 1))))
    cfg = ibt.IcebergsConfig(grid_is_latlon=False, Lx=-1.0,
                             iceberg_bonds_on=bonds, max_bonds=max_bonds)
    st = ibt.create_bergs(cap, max_bonds=max_bonds, **arrays)
    if bonds:
        bl = cfg.length_for_manually_initialize_bonds
        if bond_length_factor is not None:
            # bond anything within factor * element side
            bl = bond_length_factor * float(arrays["width"][0])
        st = forces.initialize_bonds_host(
            st, cfg.replace(length_for_manually_initialize_bonds=bl))
    os.makedirs(out_dir, exist_ok=True)
    rio.write_restart_bergs(os.path.join(out_dir, "icebergs.res.nc"),
                            st, cfg)
    nbonds = 0
    if bonds:
        rio.write_restart_bonds(
            os.path.join(out_dir, "bonds_iceberg.res.nc"), st, cfg)
        nbonds = int(np.asarray(st.n_bonds).sum())
    print(f"makeberg: wrote {n} bergs, {nbonds} directed bonds -> "
          f"{out_dir}")
    return st


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="mode", required=True)

    b = sub.add_parser("beam")
    b.add_argument("--n", type=int, default=10)
    b.add_argument("--radius", type=float, default=500.)
    b.add_argument("--x0", type=float, default=5e3)
    b.add_argument("--y0", type=float, default=8e3)
    b.add_argument("--thickness", type=float, default=100.)
    b.add_argument("--axis", choices=("x", "y"), default="x")

    h = sub.add_parser("hexpack")
    h.add_argument("--shape", choices=("circle", "rect"), default="circle")
    h.add_argument("--R", type=float, default=4e3)
    h.add_argument("--Lx", type=float)
    h.add_argument("--Ly", type=float)
    h.add_argument("--raster", help="2-D .npy thickness field (m)")
    h.add_argument("--cell", type=float, default=500.,
                   help="raster cell size (m)")
    h.add_argument("--radius", type=float, default=400.)
    h.add_argument("--x0", type=float, default=0.)
    h.add_argument("--y0", type=float, default=0.)
    h.add_argument("--thickness", type=float, default=100.)

    f = sub.add_parser("footloose")
    f.add_argument("--x0", type=float, default=5e3)
    f.add_argument("--y0", type=float, default=5e3)
    f.add_argument("--thickness", type=float, default=100.)
    f.add_argument("--width", type=float, default=5e3)
    f.add_argument("--length", type=float, default=10e3)

    for q in (b, h, f):
        q.add_argument("--out", default=".")
        q.add_argument("--capacity", type=int)
        q.add_argument("--max-bonds", type=int, default=6)
        q.add_argument("--no-bonds", action="store_true")

    a = p.parse_args()
    if a.mode == "beam":
        arrays = gen_beam(a.n, a.radius, a.x0, a.y0, a.thickness,
                          axis=a.axis)
        factor = 1.1   # bond only adjacent elements (2r < 1.1*side)
    elif a.mode == "hexpack":
        arrays = gen_hexpack(a.radius, shape=a.shape, R=a.R, Lx=a.Lx,
                             Ly=a.Ly, raster=a.raster, cell=a.cell,
                             x0=a.x0, y0=a.y0, thickness=a.thickness)
        factor = 1.1
    else:
        arrays = gen_footloose(a.x0, a.y0, a.thickness, a.width, a.length)
        factor = None
    write(arrays, a.out, bonds=not a.no_bonds and a.mode != "footloose",
          capacity=a.capacity, max_bonds=a.max_bonds,
          bond_length_factor=factor)


if __name__ == "__main__":
    main()
