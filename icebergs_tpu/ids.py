"""64-bit iceberg id scheme (F19).

Port of ``generate_id``/``id_from_2_ints``/``split_id``/``convert_old_id``
(``src/icebergs_framework.F90:4165-4243, 7276-7298``): an id is the pair
(per-cell calving counter, ij-hash) with ij = i + iNg*(j-1) (1-based).
We store the pair as two int32 fields (id_cnt, id_ij) — exactly the split
representation the reference uses in restart files and comm buffers — and
provide the packed-int64 view for diagnostics and legacy conversion.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def ij_component_of_id(i, j, iNg: int):
    """ij hash for 0-based cell indices (reference uses 1-based:
    ij = i1 + iNg*(j1-1) with i1=i+1, j1=j+1)."""
    return (i + 1) + iNg * j


def id_from_2_ints(cnt, ij):
    """Pack (cnt, ij) into int64: cnt in the high 32 bits."""
    return (np.int64(cnt) << 32) | (np.int64(ij) & 0xFFFFFFFF)


def split_id(packed):
    """Inverse of id_from_2_ints."""
    packed = np.int64(packed)
    return np.int32(packed >> 32), np.int32(packed & 0xFFFFFFFF)


def convert_old_id(old_id, iNg: int, jNg: int):
    """32-bit legacy id -> (cnt, ij) (cij_from_old_id + ij_component,
    icebergs_framework.F90:4197-4221)."""
    ncells = iNg * jNg
    cnt = old_id // ncells
    ij_old = old_id % ncells
    j1 = ij_old // iNg
    i1 = ij_old % iNg
    return np.int32(cnt), np.int32(i1 + iNg * (j1 - 1))


def ids_of_state(st):
    """Packed int64 ids for all slots (host-side diagnostics)."""
    return id_from_2_ints(np.asarray(st.id_cnt, np.int64),
                          np.asarray(st.id_ij, np.int64))


def check_for_duplicate_ids(st):
    """Duplicate-id detection (test_check_for_duplicate_ids_in_list,
    icebergs_framework.F90:7455-7487).  Returns duplicated packed ids."""
    alive = np.asarray(st.alive) & (np.asarray(st.halo_berg) < 0.5)
    ids = ids_of_state(st)[alive]
    uniq, counts = np.unique(ids, return_counts=True)
    return uniq[counts > 1]
