"""Eulerian grid container and geometry kernels.

TPU-native equivalent of ``type icebergs_gridded``
(``src/icebergs_framework.F90:112-229``) and of the geometry/search kernels
(``find_cell``/``pos_within_cell``/``bilin``,
``src/icebergs_framework.F90:5710-6575, 7071-7255``).

Layout conventions (0-based, differs from the Fortran but maps 1:1):

* **corner arrays** have shape ``(nx+1, ny+1)``; ``C[i, j]`` is the corner at
  the *south-west* of cell ``(i, j)``.  The Fortran ``grd%lon(i,j)`` (NE
  corner of cell ``(i,j)``, 1-based) equals ``lonc[i, j]`` here with the
  obvious shift.  B-grid velocities (uo, vo, ui, vi, ua, va) live on corners.
* **center arrays** carry a one-cell halo ring and have shape
  ``(nx+2, ny+2)``; cell ``(i, j)`` is at index ``[i+1, j+1]``.  The halo ring
  is zero-filled (land), matching FMS halo behavior at closed boundaries.

Only *regular* grids (uniform spacing in lon/lat or in meters) are
implemented in the fast path, mirroring ``grid_is_regular``
(icebergs_framework.F90:749).  All reference test cases use regular grids.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .tree import pytree_dataclass, static_field
from . import constants as C


@pytree_dataclass
class Grid:
    # static shape info
    nx: int = static_field()
    ny: int = static_field()

    # corner coordinate arrays, shape (nx+1, ny+1)
    lonc: jnp.ndarray = None
    latc: jnp.ndarray = None
    cosc: jnp.ndarray = None     # grid rotation cos at corners
    sinc: jnp.ndarray = None     # grid rotation sin at corners

    # center arrays with 1-ring halo, shape (nx+2, ny+2)
    msk: jnp.ndarray = None          # 1=ocean 0=land
    area: jnp.ndarray = None         # cell area (m^2)
    dx: jnp.ndarray = None           # zonal cell size (m)
    dy: jnp.ndarray = None           # meridional cell size (m)
    ocean_depth: jnp.ndarray = None  # bathymetry (m)
    lat_center: jnp.ndarray = None   # cell-center latitude

    # regular-grid metadata (scalars, traced)
    lon0: jnp.ndarray = None     # west corner longitude  (lonc[0,0])
    lat0: jnp.ndarray = None     # south corner latitude  (latc[0,0])
    dlon: jnp.ndarray = None     # corner spacing in x (deg or m)
    dlat: jnp.ndarray = None     # corner spacing in y (deg or m)

    # tile metadata: position of this (possibly halo-extended) tile
    # inside the global grid, for globally-unique spawn ids
    # (generate_id uses the GLOBAL cell, framework:4165-4243) and for
    # excluding non-owned halo cells from spawning/accumulation.
    # i_off/j_off are traced scalars (they differ per stacked tile);
    # None means 0 (a stand-alone global grid).
    i_off: jnp.ndarray = None    # global i of local cell 0
    j_off: jnp.ndarray = None
    nxg: int = static_field(default=0)     # global extent; 0 -> nx
    nyg: int = static_field(default=0)
    own_halo_x: int = static_field(default=0)  # non-owned ring width
    own_halo_y: int = static_field(default=0)

    @property
    def shape_centers(self):
        return (self.nx + 2, self.ny + 2)

    @property
    def shape_corners(self):
        return (self.nx + 1, self.ny + 1)


def make_uniform_grid(nx: int, ny: int, lon0: float, lat0: float,
                      dlon: float, dlat: float, *, grid_is_latlon: bool,
                      Rearth: float = C.REARTH_DEFAULT,
                      msk=None, ocean_depth=None,
                      dtype=jnp.float32) -> Grid:
    """Build a uniform Cartesian or lat-lon grid.

    Mirrors the stand-alone driver's grid setup
    (``driver/icebergs_driver.F90:245-328``): uniform spacing, wet everywhere
    unless a mask is given, metric factors from lat-lon when applicable.
    """
    xc = lon0 + dlon * np.arange(nx + 1)
    yc = lat0 + dlat * np.arange(ny + 1)
    lonc, latc = np.meshgrid(xc, yc, indexing="ij")

    # cell centers
    xm = lon0 + dlon * (np.arange(nx) + 0.5)
    ym = lat0 + dlat * (np.arange(ny) + 0.5)
    lonm, latm = np.meshgrid(xm, ym, indexing="ij")

    if grid_is_latlon:
        dx = (C.PI_180 * Rearth * np.cos(C.PI_180 * latm)) * dlon
        dy = (C.PI_180 * Rearth) * dlat * np.ones_like(latm)
    else:
        dx = dlon * np.ones_like(lonm)
        dy = dlat * np.ones_like(latm)
    area = dx * dy

    if msk is None:
        msk = np.ones((nx, ny))
    if ocean_depth is None:
        ocean_depth = np.zeros((nx, ny))

    def pad_center(a, fill=0.0):
        return jnp.asarray(np.pad(np.asarray(a, dtype=np.float64), 1,
                                  constant_values=fill), dtype)

    return Grid(
        nx=nx, ny=ny,
        lonc=jnp.asarray(lonc, dtype), latc=jnp.asarray(latc, dtype),
        cosc=jnp.ones((nx + 1, ny + 1), dtype),
        sinc=jnp.zeros((nx + 1, ny + 1), dtype),
        msk=pad_center(msk), area=pad_center(area),
        dx=pad_center(dx), dy=pad_center(dy),
        ocean_depth=pad_center(ocean_depth),
        lat_center=pad_center(latm),
        lon0=jnp.asarray(lon0, dtype), lat0=jnp.asarray(lat0, dtype),
        dlon=jnp.asarray(dlon, dtype), dlat=jnp.asarray(dlat, dtype),
    )


def make_curvilinear_grid(lonc, latc, *, Rearth: float = C.REARTH_DEFAULT,
                          msk=None, ocean_depth=None,
                          dtype=jnp.float32) -> Grid:
    """Build a grid from explicit corner arrays (nx+1, ny+1).

    Metric terms via haversine like the A68 data loader
    (driver/driver_data_fms2.F90:60-120).  Such grids use the curvilinear
    kernels in :mod:`icebergs_tpu.geometry` (set grid_is_regular=False).
    """
    lonc = np.asarray(lonc, np.float64)
    latc = np.asarray(latc, np.float64)
    nx, ny = lonc.shape[0] - 1, lonc.shape[1] - 1

    def hav(lon1, lat1, lon2, lat2):
        p = np.pi / 180.
        dlat = (lat2 - lat1) * p
        dlon = (lon2 - lon1) * p
        a = np.sin(dlat / 2) ** 2 + np.cos(lat1 * p) * np.cos(lat2 * p) \
            * np.sin(dlon / 2) ** 2
        return 2 * Rearth * np.arcsin(np.sqrt(np.clip(a, 0., 1.)))

    # northern-edge zonal length & eastern-edge meridional length per cell
    dx = hav(lonc[:-1, 1:], latc[:-1, 1:], lonc[1:, 1:], latc[1:, 1:])
    dy = hav(lonc[1:, :-1], latc[1:, :-1], lonc[1:, 1:], latc[1:, 1:])
    area = dx * dy
    latm = 0.25 * (latc[:-1, :-1] + latc[1:, :-1] + latc[:-1, 1:]
                   + latc[1:, 1:])

    if msk is None:
        msk = np.ones((nx, ny))
    if ocean_depth is None:
        ocean_depth = np.zeros((nx, ny))

    def pad_center(a, fill=0.0):
        return jnp.asarray(np.pad(np.asarray(a, np.float64), 1,
                                  constant_values=fill), dtype)

    return Grid(
        nx=nx, ny=ny,
        lonc=jnp.asarray(lonc, dtype), latc=jnp.asarray(latc, dtype),
        cosc=jnp.ones((nx + 1, ny + 1), dtype),
        sinc=jnp.zeros((nx + 1, ny + 1), dtype),
        msk=pad_center(msk), area=pad_center(area),
        dx=pad_center(dx), dy=pad_center(dy),
        ocean_depth=pad_center(ocean_depth),
        lat_center=pad_center(latm),
        lon0=jnp.asarray(lonc[0, 0], dtype),
        lat0=jnp.asarray(latc[0, 0], dtype),
        dlon=jnp.asarray(lonc[1, 0] - lonc[0, 0], dtype),
        dlat=jnp.asarray(latc[0, 1] - latc[0, 0], dtype),
    )


# --------------------------------------------------------------------------
# geometry kernels (vectorized over particles)
# --------------------------------------------------------------------------

def apply_modulo_around_point(x, y, Lx):
    """Return x in the range [y-Lx/2, y+Lx/2] (icebergs_framework.F90:6576)."""
    return jnp.where(Lx > 0., jnp.mod(x - (y - 0.5 * Lx), Lx) + (y - 0.5 * Lx), x)


def pos_to_cell(grid: Grid, lon, lat, Lx: float):
    """Locate (lon,lat) on a regular grid: cell index (i,j) and (xi,yj).

    Regular-grid fast path of ``pos_within_cell``
    (icebergs_framework.F90:6366-6430).  Returns 0-based cell indices
    clipped to the valid range; callers must mask out-of-domain particles.
    """
    cx = apply_modulo_around_point(lon, grid.lon0 + 0.5 * grid.dlon * grid.nx, Lx)
    fx = (cx - grid.lon0) / grid.dlon
    fy = (lat - grid.lat0) / grid.dlat
    i = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, grid.nx - 1)
    j = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, grid.ny - 1)
    # refine against the shared corner arrays, then measure xi/yj from the
    # cell's own corner: tile grids slice the global corners bitwise, so
    # both the cell assignment and the intra-cell coordinate are
    # independent of the decomposition (parallel_reprod) — the regular-
    # grid counterpart of corner-based pos_within_cell/calc_xiyj
    # (icebergs_framework.F90:6366-6430, 5994-6070).  The origin formula
    # alone rounds differently per tile (lon0 differs), which shifts xi by
    # an ulp and floor() by a whole cell near corners.
    lonc_i = grid.lonc[:, 0]
    latc_j = grid.latc[0, :]
    i = jnp.where(cx < lonc_i[i], i - 1, i)
    i = jnp.where(cx >= lonc_i[jnp.minimum(i + 1, grid.nx)], i + 1, i)
    i = jnp.clip(i, 0, grid.nx - 1)
    j = jnp.where(lat < latc_j[j], j - 1, j)
    j = jnp.where(lat >= latc_j[jnp.minimum(j + 1, grid.ny)], j + 1, j)
    j = jnp.clip(j, 0, grid.ny - 1)
    xi = (cx - lonc_i[i]) / grid.dlon
    yj = (lat - latc_j[j]) / grid.dlat
    return i, j, xi, yj


def cell_to_pos(grid: Grid, i, j, xi, yj):
    """Inverse of pos_to_cell: bilinear position from (i, j, xi, yj)."""
    lon = grid.lon0 + (i.astype(xi.dtype) + xi) * grid.dlon
    lat = grid.lat0 + (j.astype(yj.dtype) + yj) * grid.dlat
    return lon, lat


def convert_from_grid_to_meters(lat_ref, grid_is_latlon: bool, Rearth: float):
    """Metric (dx/dlon, dy/dlat) at a latitude (icebergs.F90:443-460)."""
    if grid_is_latlon:
        dx_dlon = C.PI_180 * Rearth * jnp.cos(C.PI_180 * lat_ref)
        dy_dlat = C.PI_180 * Rearth * jnp.ones_like(lat_ref)
    else:
        dx_dlon = jnp.ones_like(lat_ref)
        dy_dlat = jnp.ones_like(lat_ref)
    return dx_dlon, dy_dlat


def convert_from_meters_to_grid(lat_ref, grid_is_latlon: bool, Rearth: float):
    """Metric (dlon/dx, dlat/dy) at a latitude (icebergs.F90:462-478)."""
    dx_dlon, dy_dlat = convert_from_grid_to_meters(lat_ref, grid_is_latlon, Rearth)
    return 1.0 / dx_dlon, 1.0 / dy_dlat


def bilin_corner(fld_c, i, j, xi, yj, old_bug_bilin: bool):
    """Bilinear interpolation of a corner field to (xi,yj) within cell (i,j).

    Port of ``bilin`` (icebergs_framework.F90:7071-7089) including the
    ``old_bug_bilin`` compat switch (weights mirrored; the reference default).
    fld_c has shape (nx+1, ny+1); i, j are 0-based cell indices.
    """
    f00 = fld_c[i, j]
    f10 = fld_c[i + 1, j]
    f01 = fld_c[i, j + 1]
    f11 = fld_c[i + 1, j + 1]
    if old_bug_bilin:
        # bilin = (f(i,j)(1-xi) + f(i-1,j) xi)(1-yj) + (f(i,j-1)(1-xi)+f(i-1,j-1) xi) yj
        return ((f11 * (1. - xi) + f01 * xi) * (1. - yj)
                + (f10 * (1. - xi) + f00 * xi) * yj)
    return ((f11 * xi + f01 * (1. - xi)) * yj
            + (f10 * xi + f00 * (1. - xi)) * (1. - yj))


def center_at(fld, i, j):
    """Gather a halo-padded center field at 0-based cell offsets."""
    return fld[i + 1, j + 1]


def make_tripolar_grid(nx: int, ny: int, *, lat0: float = 30.0,
                       lat_join: float = 65.0, lat_poles: float = 75.0,
                       lon0: float = 0.0, msk=None, ocean_depth=None,
                       Rearth: float = C.REARTH_DEFAULT,
                       dtype=jnp.float32) -> Grid:
    """True tripolar corner coordinates: regular lat-lon below
    ``lat_join``, a two-pole Arctic cap above (Murray-1996-style
    topology).

    The cap rows interpolate along great circles between the join circle
    and the fold line; the fold line runs from pole 1 (lon0+90,
    lat_poles) over the geographic north pole to pole 2 (lon0+270,
    lat_poles), so the top corner row satisfies the tripolar pairing
    corner(i, ny) == corner(nx-i, ny) — the FOLD_NORTH_EDGE invariant
    (icebergs_framework.F90:649, 933).  Cells are general quads; bergs
    step through the curvilinear path (grid_is_regular=False).

    ``ny`` is split so cap rows get roughly the same meridional extent
    as lat-lon rows.  The two polar cells are degenerate quads
    (pentagon analog); keep them land-masked in ocean applications.
    """
    import numpy as _np

    frac_cap = (90.0 - lat_join) / (90.0 - lat0)
    ny_cap = max(2, int(round(ny * frac_cap)))
    ny_ll = ny - ny_cap
    assert ny_ll >= 1, "ny too small for the requested cap"

    lons = lon0 + 360.0 * _np.arange(nx + 1) / nx
    lonc = _np.zeros((nx + 1, ny + 1))
    latc = _np.zeros((nx + 1, ny + 1))

    # regular lat-lon part (rows 0..ny_ll): lat0 -> lat_join
    for j in range(ny_ll + 1):
        latc[:, j] = lat0 + (lat_join - lat0) * j / ny_ll
        lonc[:, j] = lons

    def sph(lon, lat):
        p = _np.pi / 180.0
        return _np.array([_np.cos(lat * p) * _np.cos(lon * p),
                          _np.cos(lat * p) * _np.sin(lon * p),
                          _np.sin(lat * p)])

    def geo(v):
        v = v / _np.linalg.norm(v)
        lat = _np.degrees(_np.arcsin(_np.clip(v[2], -1., 1.)))
        lon = _np.degrees(_np.arctan2(v[1], v[0])) % 360.0
        return lon, lat

    def slerp(a, b, t):
        a = a / _np.linalg.norm(a)
        b = b / _np.linalg.norm(b)
        w = _np.arccos(_np.clip(a @ b, -1., 1.))
        if w < 1e-12:
            return a
        return (_np.sin((1 - t) * w) * a + _np.sin(t * w) * b) / _np.sin(w)

    # fold line: pole1 -> north pole -> pole2 and mirrored back.
    # i in [0, nx/2] walks P1 -> NP -> P2; i in [nx/2, nx] mirrors.
    p1 = sph(lon0 + 90.0, lat_poles)
    p2 = sph(lon0 + 270.0, lat_poles)
    npole = _np.array([0.0, 0.0, 1.0])
    half = nx // 2
    fold = _np.zeros((nx + 1, 3))
    for i in range(half + 1):
        t = i / half
        if t <= 0.5:
            fold[i] = slerp(p1, npole, 2 * t)
        else:
            fold[i] = slerp(npole, p2, 2 * t - 1)
    for i in range(half + 1, nx + 1):
        fold[i] = fold[nx - i]          # tripolar pairing

    # cap rows: great-circle interpolation join circle -> fold line
    for i in range(nx + 1):
        q = sph(lons[i], lat_join)
        for k in range(1, ny_cap + 1):
            t = k / ny_cap
            lon_c, lat_c = geo(slerp(q, fold[i], t))
            lonc[i, ny_ll + k] = lon_c
            latc[i, ny_ll + k] = lat_c
    # keep longitudes continuous along each column (no 360 jumps)
    for i in range(nx + 1):
        for j in range(ny_ll + 1, ny + 1):
            d = lonc[i, j] - lonc[i, j - 1]
            if d > 180.0:
                lonc[i, j] -= 360.0
            elif d < -180.0:
                lonc[i, j] += 360.0

    return make_curvilinear_grid(lonc, latc, Rearth=Rearth, msk=msk,
                                 ocean_depth=ocean_depth, dtype=dtype)
