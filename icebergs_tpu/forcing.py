"""Forcing fields passed to ``icebergs_run`` each coupling step.

Mirrors the forcing copies held in ``type icebergs_gridded``
(``src/icebergs_framework.F90:130-150``): B-grid corner velocities for
ocean / sea-ice / atmosphere, plus A-grid scalars (ssh, sst, sss, cn, hi).

Corner arrays have shape (nx+1, ny+1); center arrays carry the 1-ring halo,
shape (nx+2, ny+2), like :class:`icebergs_tpu.grid.Grid`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .tree import pytree_dataclass


@pytree_dataclass
class Forcing:
    # corner (B-grid) velocities, shape (nx+1, ny+1)
    uo: jnp.ndarray = None   # ocean
    vo: jnp.ndarray = None
    ui: jnp.ndarray = None   # sea ice
    vi: jnp.ndarray = None
    ua: jnp.ndarray = None   # atmosphere (10m wind or from stress)
    va: jnp.ndarray = None
    # center (A-grid) scalars, halo-padded shape (nx+2, ny+2)
    ssh: jnp.ndarray = None  # sea surface height (m)
    sst: jnp.ndarray = None  # sea surface temperature (C)
    sss: jnp.ndarray = None  # sea surface salinity (1e-3)
    cn: jnp.ndarray = None   # sea ice concentration (0..1)
    hi: jnp.ndarray = None   # sea ice thickness (m)


def uniform_forcing(nx: int, ny: int, *, uo=0., vo=0., ui=0., vi=0.,
                    ua=0., va=0., ssh=0., sst=5., sss=30., cn=0., hi=0.,
                    dtype=jnp.float32) -> Forcing:
    """Constant forcing like the stand-alone driver's synthetic defaults
    (driver/icebergs_driver.F90:253-266)."""
    def corner(v):
        return jnp.full((nx + 1, ny + 1), v, dtype)

    def center(v):
        return jnp.full((nx + 2, ny + 2), v, dtype)

    return Forcing(uo=corner(uo), vo=corner(vo), ui=corner(ui), vi=corner(vi),
                   ua=corner(ua), va=corner(va), ssh=center(ssh),
                   sst=center(sst), sss=center(sss), cn=center(cn),
                   hi=center(hi))


def swirl_forcing(nx: int, ny: int, dxy: float, *, uo=0.3, ua=5.0,
                  ssh=0., sst=5., sss=30., cn=0., hi=0., core_frac=0.35,
                  dtype=jnp.float32) -> Forcing:
    """Divergence-free clockwise Rankine swirl on a uniform Cartesian grid.

    Statistically steady benchmark forcing: a uniform current piles the
    bergs against the downstream wall (every extra step raises the local
    density until neighbor windows overflow), while an azimuthal flow
    preserves the uniform density indefinitely — solid-body rotation out
    to ``core_frac`` of the half-width, 1/r decay beyond.  Clockwise so
    the f-plane Coriolis force (NH) points toward the vortex center and
    holds the bergs in.  ``uo``/``ua`` are the peak ocean/wind speeds.
    """
    L = min(nx, ny) * dxy
    xc, yc = 0.5 * nx * dxy, 0.5 * ny * dxy
    r0 = core_frac * 0.5 * L
    x = np.arange(nx + 1) * dxy - xc
    y = np.arange(ny + 1) * dxy - yc
    X, Y = np.meshgrid(x, y, indexing="ij")
    r = np.hypot(X, Y)
    rs = np.maximum(r, 1e-9)
    prof = np.minimum(rs / r0, r0 / rs)         # Rankine profile, <= 1
    ex, ey = Y / rs, -X / rs                    # clockwise unit azimuth

    def corner(vmax):
        return (jnp.asarray(prof * ex * vmax, dtype),
                jnp.asarray(prof * ey * vmax, dtype))

    def center(v):
        return jnp.full((nx + 2, ny + 2), v, dtype)

    uoc, voc = corner(uo)
    uac, vac = corner(ua)
    zero = jnp.zeros((nx + 1, ny + 1), dtype)
    return Forcing(uo=uoc, vo=voc, ui=zero, vi=zero, ua=uac, va=vac,
                   ssh=center(ssh), sst=center(sst), sss=center(sss),
                   cn=center(cn), hi=center(hi))


def forcing_from_arrays(*, uo, vo, ui, vi, ua, va, ssh, sst, sss, cn, hi,
                        dtype=jnp.float32) -> Forcing:
    """Build Forcing from raw numpy arrays.

    Corner fields must be (nx+1, ny+1); center fields may be (nx, ny)
    (they are halo-padded here) or already (nx+2, ny+2).
    """
    def corner(a):
        return jnp.asarray(a, dtype)

    def center(a):
        a = np.asarray(a)
        return jnp.asarray(np.pad(a, 1), dtype)

    def maybe_center(a, nx, ny):
        a = np.asarray(a)
        if a.shape == (nx + 2, ny + 2):
            return jnp.asarray(a, dtype)
        return center(a)

    nx, ny = np.asarray(ssh).shape[0], np.asarray(ssh).shape[1]
    if np.asarray(ssh).shape[0] == np.asarray(uo).shape[0] + 1:
        nx, ny = nx - 2, ny - 2
    return Forcing(
        uo=corner(uo), vo=corner(vo), ui=corner(ui), vi=corner(vi),
        ua=corner(ua), va=corner(va),
        ssh=maybe_center(ssh, nx, ny), sst=maybe_center(sst, nx, ny),
        sss=maybe_center(sss, nx, ny), cn=maybe_center(cn, nx, ny),
        hi=maybe_center(hi, nx, ny))
