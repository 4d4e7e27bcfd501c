"""Device-mesh data parallelism for variant calling.

Replaces the reference's Spark/WDL scatter-gather (engine/spark/, SURVEY §2.6):
genomic interval shards map to data parallelism over a 1-D device mesh; the PairHMM
pair batch is sharded along its pair (lane) axis with shard_map; global reductions
(BQSR covariate tables, per-shard stats) ride psum over ICI.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import pairhmm_tpu

SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (SHARD_AXIS,))


def pad_pairs_to_devices(packed: dict, n_pairs: int, n_devices: int):
    """Pad the pair axis (last dim) so it divides n_devices * LANES."""
    lane_mult = n_devices * pairhmm_tpu.LANES
    n = packed["rbase"].shape[1]
    target = ((n + lane_mult - 1) // lane_mult) * lane_mult
    if target == n:
        return packed
    out = {}
    for k, v in packed.items():
        pad = np.zeros((v.shape[0], target - n), v.dtype)
        if k in ("rlen", "hlen"):
            pad += 1
        out[k] = np.concatenate([v, pad], axis=1)
    return out


def pairhmm_sharded(mesh: Mesh, packed: dict, rp: int, hmax: int, interpret: bool = False):
    """Run the PairHMM kernel data-parallel over the mesh's shard axis."""
    in_spec = P(None, SHARD_AXIS)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(in_spec,) * 8,
        out_specs=in_spec,
        check_rep=False,
    )
    def step(rbase, rq, iq, dq, gcp, e, rlen, hlen):
        return pairhmm_tpu._pairhmm_call_v6(
            rbase, rq, iq, dq, gcp, e, rlen, hlen, rp=rp, hmax=hmax, interpret=interpret
        )

    args = (
        packed["rbase"], packed["rq"], packed["iq"], packed["dq"], packed["gcp"],
        packed["e"], packed["rlen"], packed["hlen"],
    )
    jitted = jax.jit(step)
    return jitted(*args)


def bqsr_histogram_step(mesh: Mesh, keys: jnp.ndarray, errors: jnp.ndarray, n_bins: int):
    """Sharded covariate histogram accumulation with a global psum — the BQSR
    pass-1 reduction pattern (RecalibrationTables as scatter-add + all-reduce)."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
        out_specs=(P(), P()),
        check_rep=False,
    )
    def step(local_keys, local_errors):
        obs = jnp.zeros(n_bins, jnp.float32).at[local_keys].add(1.0)
        errs = jnp.zeros(n_bins, jnp.float32).at[local_keys].add(local_errors)
        return (
            jax.lax.psum(obs, SHARD_AXIS),
            jax.lax.psum(errs, SHARD_AXIS),
        )

    return jax.jit(step)(keys, errors)
