"""Pallas block-transpose pack/unpack for the permute transport.

The persistent re-sort moves the whole state by ONE (N, 128-lane) u32
row gather (6.8 ms at 1M on v5e) — but building that packed matrix with
XLA (`ops/sorted.stack_cols`: 1-D concat + (C, N) -> (N, C<=128)
transpose) and slicing it back costs ~45 ms: the padded-minor-dim
relayout runs at ~20 GB/s, and padding the column list to a full 128
before the transpose is WORSE (62 ms measured).  These two kernels do
the same transposes as explicit VMEM block copies at streaming
bandwidth.

Bitwise: pure u32 transport (no arithmetic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BN = 512


def _auto_interpret(interpret):
    if interpret is not None:
        return interpret
    return jax.default_backend() not in ("tpu", "axon")


def pack_rows_to_lanes(R, *, interpret: bool = None):
    """(C, N) u32 -> (N, 128) u32; lanes C..127 read as zero.

    C <= 128.  One grid step transposes a (Cpad8, BN) block into a
    (BN, 128) block in VMEM."""
    interpret = _auto_interpret(interpret)
    C, N = R.shape
    assert C <= 128, C
    Cp = -(-C // 8) * 8
    nblocks = -(-N // _BN)
    Npad = nblocks * _BN
    Rp = jnp.zeros((Cp, Npad), jnp.uint32).at[:C, :N].set(R)

    def kernel(in_ref, out_ref):
        blk = in_ref[...]                          # (Cp, BN)
        t = blk.T                                  # (BN, Cp)
        if Cp < 128:
            t = jnp.concatenate(
                [t, jnp.zeros((_BN, 128 - Cp), jnp.uint32)], axis=1)
        out_ref[...] = t

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((Cp, _BN), lambda b: (0, b))],
        out_specs=pl.BlockSpec((_BN, 128), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((Npad, 128), jnp.uint32),
        interpret=interpret,
    )(Rp)
    return out[:N]


def unpack_lanes_to_rows(P, C: int, *, interpret: bool = None):
    """(N, 128) u32 -> (C, N) u32 (inverse of pack_rows_to_lanes)."""
    interpret = _auto_interpret(interpret)
    N = P.shape[0]
    assert P.shape[1] == 128, P.shape
    Cp = -(-C // 8) * 8
    nblocks = -(-N // _BN)
    Npad = nblocks * _BN
    Pp = jnp.zeros((Npad, 128), jnp.uint32).at[:N].set(P)

    def kernel(in_ref, out_ref):
        blk = in_ref[...]                          # (BN, 128)
        out_ref[...] = blk[:, :Cp].T               # (Cp, BN)

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((_BN, 128), lambda b: (b, 0))],
        out_specs=pl.BlockSpec((Cp, _BN), lambda b: (0, b)),
        out_shape=jax.ShapeDtypeStruct((Cp, Npad), jnp.uint32),
        interpret=interpret,
    )(Pp)
    return out[:C, :N]
