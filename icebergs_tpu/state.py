"""Particle and bond state as fixed-capacity structure-of-arrays.

TPU-native replacement for the reference's per-cell doubly-linked particle
lists (``type iceberg``, ``src/icebergs_framework.F90:290-359``) and bond
lists (``type bond``, ``src/icebergs_framework.F90:362-386``).

Design: a single flat capacity-``N`` slab per field with an ``alive`` mask.
Birth/death are mask flips using a free-slot allocator; there is no pointer
chasing and every kernel is an array op.  Bonds are a fixed ``(N, B)`` table
of partner slot indices (the reference serializes bonds into exactly this
``max_bonds``-wide form when packing comm buffers,
icebergs_framework.F90:1264-1293).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .tree import pytree_dataclass, static_field

# Fields that make up the dynamic per-berg state (all shape (N,), float)
FLOAT_FIELDS = (
    # position / velocity (type iceberg: lon,lat,uvel,vvel)
    "lon", "lat", "uvel", "vvel",
    # geometry / mass
    "mass", "thickness", "width", "length",
    # Verlet acceleration split (axn..byn, icebergs_framework.F90:300-303)
    "axn", "ayn", "bxn", "byn",
    # order-invariance copies (uvel_old.., icebergs_framework.F90:305-308)
    "lon_old", "lat_old", "uvel_old", "vvel_old",
    "uvel_prev", "vvel_prev",
    # provenance
    "start_lon", "start_lat", "start_day", "start_mass",
    "mass_scaling", "mass_of_bits", "heat_density",
    # markers (kept float like the reference)
    "halo_berg", "static_berg",
    # intra-cell coordinates
    "xi", "yj",
    # cached interpolated environment (icebergs_framework.F90:330-340)
    "uo", "vo", "ui", "vi", "ua", "va",
    "ssh_x", "ssh_y", "sst", "sss", "cn", "hi", "od",
    # footloose (fl_k counter; fl masses; per-parent child counter for
    # unique child ids)
    "fl_k", "mass_of_fl_bits", "mass_of_fl_bergy_bits", "fl_spawn_count",
    # MTS fast accelerations (axn_fast.., icebergs_framework.F90:345-350)
    "axn_fast", "ayn_fast", "bxn_fast", "byn_fast",
    # DEM angular state (ang_vel/ang_accel/rot, icebergs_framework.F90:352-356)
    "ang_vel", "ang_accel", "rot",
    # cached bond count (n_bonds)
    "n_bonds",
)

INT_FIELDS = (
    "ine", "jne",          # cell indices (0-based here)
    "start_year",
    "id_cnt", "id_ij",     # 64-bit id split into two int32 (framework:4165-4243)
    "conglom_id",          # conglomerate label (MTS)
)

# Bond table fields, shape (N, B)
BOND_FLOAT_FIELDS = (
    "bond_length",          # rest length L0 (orig_bond_length)
    "bond_tangd1", "bond_tangd2",   # DEM tangential displacement accumulators
    "bond_nstress", "bond_sstress",  # DEM normal/shear stress bookkeeping
    "bond_rel_rotation",
)
BOND_INT_FIELDS = (
    "bond_idx",             # slot index of partner (-1 = empty)
    "bond_id_cnt", "bond_id_ij",  # partner id (for re-matching after comms)
    "bond_broken",          # 1 = broken (DEM fracture)
)


_fields = {}
for _f in FLOAT_FIELDS + BOND_FLOAT_FIELDS:
    _fields[_f] = None
for _f in INT_FIELDS + BOND_INT_FIELDS:
    _fields[_f] = None


@pytree_dataclass
class BergState:
    """Fixed-capacity SoA particle state (+ bond table)."""
    alive: jnp.ndarray = None            # (N,) bool
    # float fields (N,)
    lon: jnp.ndarray = None
    lat: jnp.ndarray = None
    uvel: jnp.ndarray = None
    vvel: jnp.ndarray = None
    mass: jnp.ndarray = None
    thickness: jnp.ndarray = None
    width: jnp.ndarray = None
    length: jnp.ndarray = None
    axn: jnp.ndarray = None
    ayn: jnp.ndarray = None
    bxn: jnp.ndarray = None
    byn: jnp.ndarray = None
    lon_old: jnp.ndarray = None
    lat_old: jnp.ndarray = None
    uvel_old: jnp.ndarray = None
    vvel_old: jnp.ndarray = None
    uvel_prev: jnp.ndarray = None
    vvel_prev: jnp.ndarray = None
    start_lon: jnp.ndarray = None
    start_lat: jnp.ndarray = None
    start_day: jnp.ndarray = None
    start_mass: jnp.ndarray = None
    mass_scaling: jnp.ndarray = None
    mass_of_bits: jnp.ndarray = None
    heat_density: jnp.ndarray = None
    halo_berg: jnp.ndarray = None
    static_berg: jnp.ndarray = None
    xi: jnp.ndarray = None
    yj: jnp.ndarray = None
    uo: jnp.ndarray = None
    vo: jnp.ndarray = None
    ui: jnp.ndarray = None
    vi: jnp.ndarray = None
    ua: jnp.ndarray = None
    va: jnp.ndarray = None
    ssh_x: jnp.ndarray = None
    ssh_y: jnp.ndarray = None
    sst: jnp.ndarray = None
    sss: jnp.ndarray = None
    cn: jnp.ndarray = None
    hi: jnp.ndarray = None
    od: jnp.ndarray = None
    fl_k: jnp.ndarray = None
    mass_of_fl_bits: jnp.ndarray = None
    mass_of_fl_bergy_bits: jnp.ndarray = None
    fl_spawn_count: jnp.ndarray = None
    axn_fast: jnp.ndarray = None
    ayn_fast: jnp.ndarray = None
    bxn_fast: jnp.ndarray = None
    byn_fast: jnp.ndarray = None
    ang_vel: jnp.ndarray = None
    ang_accel: jnp.ndarray = None
    rot: jnp.ndarray = None
    n_bonds: jnp.ndarray = None
    # int fields (N,)
    ine: jnp.ndarray = None
    jne: jnp.ndarray = None
    start_year: jnp.ndarray = None
    id_cnt: jnp.ndarray = None
    id_ij: jnp.ndarray = None
    conglom_id: jnp.ndarray = None
    # bond table (N, B)
    bond_idx: jnp.ndarray = None
    bond_id_cnt: jnp.ndarray = None
    bond_id_ij: jnp.ndarray = None
    bond_broken: jnp.ndarray = None
    bond_length: jnp.ndarray = None
    bond_tangd1: jnp.ndarray = None
    bond_tangd2: jnp.ndarray = None
    bond_nstress: jnp.ndarray = None
    bond_sstress: jnp.ndarray = None
    bond_rel_rotation: jnp.ndarray = None

    @property
    def capacity(self) -> int:
        return self.alive.shape[0]

    @property
    def max_bonds(self) -> int:
        return self.bond_idx.shape[1]

    @property
    def dtype(self):
        return self.lon.dtype

    def count(self):
        """Number of live bergs (traced scalar)."""
        return jnp.sum(self.alive.astype(jnp.int32))


def empty_state(capacity: int, max_bonds: int = 6,
                dtype=jnp.float32) -> BergState:
    """Allocate an all-dead state of the given capacity."""
    z = jnp.zeros((capacity,), dtype)
    zi = jnp.zeros((capacity,), jnp.int32)
    zb = jnp.zeros((capacity, max_bonds), dtype)
    zbi = jnp.zeros((capacity, max_bonds), jnp.int32)
    kw = {}
    for f in FLOAT_FIELDS:
        kw[f] = z
    for f in INT_FIELDS:
        kw[f] = zi
    for f in BOND_FLOAT_FIELDS:
        kw[f] = zb
    for f in BOND_INT_FIELDS:
        kw[f] = zbi
    kw["bond_idx"] = zbi - 1  # -1 = no bond
    return BergState(alive=jnp.zeros((capacity,), bool), **kw)


def create_bergs(capacity: int, *, lon, lat, uvel=None, vvel=None,
                 mass=None, thickness=None, width=None, length=None,
                 mass_scaling=None, start_year=None, start_day=None,
                 id_cnt=None, id_ij=None, static_berg=None,
                 max_bonds: int = 6, dtype=jnp.float32, **extra) -> BergState:
    """Build a BergState from per-berg arrays (n <= capacity live slots)."""
    import numpy as np
    lon = np.asarray(lon, dtype=np.float64)
    n = lon.shape[0]
    if n > capacity:
        raise ValueError(f"{n} bergs > capacity {capacity}")
    st = empty_state(capacity, max_bonds=max_bonds, dtype=dtype)

    def fill(name, val, default=0.0, integer=False):
        if val is None:
            val = np.full((n,), default)
        val = np.asarray(val)
        if val.ndim == 0:
            val = np.full((n,), float(val))
        tgt = np.zeros((capacity,), dtype=np.int32 if integer else np.float64)
        tgt[:n] = val
        arr = jnp.asarray(tgt, jnp.int32 if integer else dtype)
        return arr

    alive = jnp.arange(capacity) < n
    kw = dict(
        alive=alive,
        lon=fill("lon", lon), lat=fill("lat", lat),
        uvel=fill("uvel", uvel), vvel=fill("vvel", vvel),
        mass=fill("mass", mass, 1e9), thickness=fill("thickness", thickness, 100.),
        width=fill("width", width, 100.), length=fill("length", length, 100.),
        mass_scaling=fill("mass_scaling", mass_scaling, 1.0),
        start_year=fill("start_year", start_year, 0, integer=True),
        start_day=fill("start_day", start_day, 0.),
        start_lon=fill("start_lon", lon), start_lat=fill("start_lat", lat),
        static_berg=fill("static_berg", static_berg, 0.),
        id_cnt=fill("id_cnt", id_cnt if id_cnt is not None else np.arange(n),
                    integer=True),
        id_ij=fill("id_ij", id_ij, 0, integer=True),
    )
    kw["start_mass"] = fill("start_mass", extra.pop("start_mass", None))
    if kw["start_mass"] is None:
        kw["start_mass"] = kw["mass"]
    kw["lon_old"] = kw["lon"]
    kw["lat_old"] = kw["lat"]
    kw["uvel_old"] = kw["uvel"]
    kw["vvel_old"] = kw["vvel"]
    kw["heat_density"] = fill("heat_density", extra.pop("heat_density", None))
    for name, val in extra.items():
        integer = name in INT_FIELDS
        kw[name] = fill(name, val, integer=integer)
    return st.replace(**kw)


def pack_id(id_cnt, id_ij):
    """Assemble the 64-bit id = cnt * 2^32 + ij as a float for diagnostics."""
    return id_cnt.astype(jnp.float64 if jax.config.read("jax_enable_x64")
                         else jnp.float32) * 4294967296.0 + id_ij


def allocate_slots(alive, want):
    """Pack spawn requests into dead slots (prefix-sum allocator).

    ``want`` is a boolean request vector (any length).  Returns
    (granted, slots): ``granted[r]`` iff request r got a slot, ``slots[r]``
    its state index (-1 otherwise).  This replaces the reference's
    pointer-based ``add_new_berg_to_list`` with a fixed-shape scatter.
    """
    capacity = alive.shape[0]
    order = jnp.cumsum(want.astype(jnp.int32)) - 1        # request rank
    dead_rank = jnp.cumsum((~alive).astype(jnp.int32)) - 1
    slot_ids = jnp.arange(capacity, dtype=jnp.int32)
    slot_of_rank = jnp.zeros((capacity,), jnp.int32).at[
        jnp.where(~alive, dead_rank, capacity)].set(slot_ids, mode='drop')
    nfree = jnp.sum((~alive).astype(jnp.int32))
    granted = want & (order < nfree)
    slots = jnp.where(granted,
                      slot_of_rank[jnp.clip(order, 0, capacity - 1)], -1)
    return granted, slots




def grow_capacity(st: BergState, new_capacity: int) -> BergState:
    """Return a copy of ``st`` with a larger slot pool (host-side).

    The reference grows its linked lists on demand; fixed-shape slabs
    instead grow explicitly between jitted steps (a new capacity means a
    recompile, so call this rarely — e.g. when ``allocate_slots`` starts
    reporting overflow).  Existing slot indices (and therefore bond_idx
    partner slots) are preserved; new slots are dead with empty bonds.
    """
    if new_capacity < st.capacity:
        raise ValueError(f"cannot shrink: {new_capacity} < {st.capacity}")
    if new_capacity == st.capacity:
        return st
    import dataclasses
    pad = new_capacity - st.capacity
    ref = empty_state(pad, max_bonds=st.max_bonds, dtype=st.dtype)
    kw = {}
    for f in dataclasses.fields(st):
        a = getattr(st, f.name)
        kw[f.name] = jnp.concatenate([a, getattr(ref, f.name)], axis=0)
    return BergState(**kw)
