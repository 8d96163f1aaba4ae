"""Trace-time communication context for halo exchange.

The boundary-values code asks this module how to move donor slabs between
blocks.  Outside any context (the default), the exchange is a whole-axis
gather ``jnp.take(slab, nbr, 0)`` — correct on one device and under plain
NamedSharding.  Inside ``use_comm(ShardComm(...))`` (see
``parallel/shard_comm.py``), the same call becomes an explicit
per-neighbor-slab ``jax.lax.ppermute`` exchange running inside
``shard_map`` — the TPU-native equivalent of the reference's rank-packed
MPI messages (reference: src/bvals/bvals_cc.cpp:42-255).

The context is consulted at *trace* time only; the jitted cycle bakes in
whichever exchange was active when it was traced.
"""

from __future__ import annotations

from contextlib import contextmanager

_CURRENT = None


def current_comm():
    return _CURRENT


@contextmanager
def use_comm(comm):
    global _CURRENT
    prev = _CURRENT
    _CURRENT = comm
    try:
        yield comm
    finally:
        _CURRENT = prev
