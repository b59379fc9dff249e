"""Device mesh setup and data-parallel execution.

The reference's entire distribution model is process-level data parallelism
over reads with filesystem-based reduction (SURVEY §2.3): multiprocessing
worker pools (signalAlign.py:103-146), per-read expectation files summed on a
shared filesystem (trainModels.py:126-135), and jobTree for cluster fan-out.

TPU-native mapping: reads (problems) are batched along a leading axis sharded
over a ``data`` mesh axis (ICI within a slice, DCN across hosts); model tables
are replicated (largest state is the 4096x5 match model, ~160 KB); the EM
all-reduce becomes a ``psum`` over the (transitions, kmer-gap, likelihood)
pytree inside shard_map — the expectation-file sum made a collective.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine import device as dev
from ..engine import fb


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1D data-parallel mesh over all (or the first n) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_batch(batch: dev.SM3Problem, mesh: Mesh) -> dev.SM3Problem:
    """Place a stacked problem batch with the leading axis sharded over
    ``data``; per-problem model tables travel with their problems."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def distributed_posteriors(plan: fb.EnginePlan, W: int, mesh: Mesh,
                           batch: dev.SM3Problem):
    """Data-parallel batched posterior computation: the compiler partitions the
    vmapped pipeline along the sharded batch axis; no collectives needed."""
    batch = shard_batch(batch, mesh)
    fn = jax.jit(partial(dev.sm3_batch_posteriors, plan, W),
                 out_shardings=NamedSharding(mesh, P("data")))
    return fn(batch)


def em_step_fn(plan: fb.EnginePlan, W: int, mesh: Mesh, batch_like):
    """Jitted distributed E-step + psum reduce for batches shaped like
    ``batch_like`` (works single- and multi-process: the input must already
    be sharded P("data") over the mesh)."""
    from jax import shard_map

    @partial(shard_map, mesh=mesh,
             in_specs=(jax.tree.map(lambda _: P("data"), batch_like),),
             out_specs=(P(), P(), P()))
    def step(local_batch):
        trans, kmer_gap, lik = dev.sm3_batch_expectations(plan, W, local_batch)
        trans = jax.lax.psum(trans, "data")
        kmer_gap = jax.lax.psum(kmer_gap, "data")
        lik = jax.lax.psum(lik, "data")
        return trans, kmer_gap, lik

    return jax.jit(step)


def distributed_em_step(plan: fb.EnginePlan, W: int, mesh: Mesh,
                        batch: dev.SM3Problem, presharded: bool = False):
    """One distributed E-step + reduce: each shard computes expectations over
    its local problems; psum over ``data`` yields replicated global tallies
    (the TPU equivalent of add_and_norm_expectations, trainModels.py:126-135).
    Returns replicated (transitions (3,3), kmer_gap (4096,), likelihood).

    Pass ``presharded=True`` when ``batch`` is already a global jax.Array
    pytree (multi-host path, parallel/distributed.make_global_batch)."""
    if not presharded:
        batch = shard_batch(batch, mesh)
    return em_step_fn(plan, W, mesh, batch)(batch)


def em_m_step(trans, kmer_gap):
    """Replicated M-step: row-normalize transitions, normalize kmer tallies
    (continuousPairHmm_normalize, continuousHmm.c:174-191) — pure jnp so it
    can live inside the jitted training step."""
    row = trans.sum(axis=1, keepdims=True)
    trans_n = jnp.where(row > 0, trans / row, trans)
    tot = kmer_gap.sum()
    kmer_n = jnp.where(tot > 0, kmer_gap / tot, kmer_gap)
    return trans_n, kmer_n


def distributed_train_step(plan: fb.EnginePlan, W: int, mesh: Mesh,
                           batch: dev.SM3Problem):
    """Full distributed EM training step (E-step + psum + M-step), jitted over
    the mesh; returns the new (normalized) parameters and likelihood."""
    trans, kmer_gap, lik = distributed_em_step(plan, W, mesh, batch)
    trans_n, kmer_n = em_m_step(trans, kmer_gap)
    return trans_n, kmer_n, lik


def pallas_em_step_fn(plan: fb.EnginePlan, W: int, mesh: Mesh, batch_like,
                      Bt: int | None = None, interpret: bool = False):
    """Jitted distributed E-step on the Pallas fast path (the production
    route: ops/pallas_fb kernels -> on-device kmer scatter -> psum).  The
    scan-engine step (em_step_fn) remains as the portable/f64 fallback."""
    from jax import shard_map

    from ..engine import pallas_pipeline as pp

    @partial(shard_map, mesh=mesh,
             in_specs=(jax.tree.map(lambda _: P("data"), batch_like),),
             out_specs=(P(), P(), P()),
             check_vma=False)  # pallas_call outputs carry no vma info
    def step(local_batch):
        trans, kmer_gap, lik = pp.sm3_pallas_expectations(
            plan, W, local_batch, Bt=Bt, interpret=interpret)
        return (jax.lax.psum(trans, "data"), jax.lax.psum(kmer_gap, "data"),
                jax.lax.psum(lik, "data"))

    return jax.jit(step)


def distributed_train_step_pallas(plan: fb.EnginePlan, W: int, mesh: Mesh,
                                  batch, presharded: bool = False,
                                  Bt: int | None = None,
                                  interpret: bool = False):
    """Distributed EM training step driven by the Pallas kernels:
    E-step (fused backward EM tallies) + psum + M-step."""
    if not presharded:
        batch = shard_batch(batch, mesh)
    trans, kmer_gap, lik = pallas_em_step_fn(plan, W, mesh, batch, Bt=Bt,
                                             interpret=interpret)(batch)
    trans_n, kmer_n = em_m_step(trans, kmer_gap)
    return trans_n, kmer_n, lik
