"""Multi-host (DCN) distribution for the trainer's scoring step.

The reference trainer is single-host shared-memory (Go goroutines +
channels, trainvocab.go:1826-2293).  Scaling past one host is a new,
TPU-native component: processes are connected with ``jax.distributed``
(gRPC coordination), devices form a hybrid mesh whose outer axis spans
hosts over DCN and whose inner axis spans the chips of each host over ICI,
and the per-token score vectors are psum-reduced over BOTH axes — XLA
routes the intra-host partial sums over ICI and the cross-host combine
over DCN.

Every process holds its own corpus shard (the host axis shards the text
exactly like the ICI data axis does), so N-host scoring is bit-exact vs
single-host scoring on the concatenated corpus: integer psum is
associative and the strip layout is identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .score import _shard_score

HOST_AXIS = "hosts"
DATA_AXIS = "data"


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Initialize the JAX distributed runtime (idempotent).

    With no arguments relies on the environment (TPU pod metadata or
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); explicit
    arguments support manual multi-process launches (including CPU tests).
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def make_multihost_mesh() -> Mesh:
    """(hosts, data) mesh: outer axis across processes (DCN), inner axis
    across each process's local devices (ICI)."""
    n_proc = jax.process_count()
    local = jax.local_device_count()
    devices = np.asarray(jax.devices()).reshape(n_proc, local)
    return Mesh(devices, (HOST_AXIS, DATA_AXIS))


def make_multihost_score_step(mesh: Mesh, chunk: int, has_delete: bool,
                              delete_token: int, n_ids: int):
    """Mesh-sharded scoring step over (hosts, data).

    text is sharded over both axes (flattened shard per device); tables are
    replicated.  Outputs are psum'd over ICI then DCN — identical on every
    device of every host.
    """
    kernel = functools.partial(
        _shard_score, chunk=chunk, has_delete=has_delete,
        delete_token=delete_token, n_ids=n_ids)

    def step(text, dfa, dout, sdfa, sout, bb_byte, p1, i1, i2, ids3):
        scores, n_tok, n_miss = kernel(
            text, dfa, dout, sdfa, sout, bb_byte, p1, i1, i2, ids3)
        # ICI reduction first (cheap), then the DCN combine of host partials
        axes = (DATA_AXIS, HOST_AXIS)
        return (jax.lax.psum(scores, axes),
                jax.lax.psum(n_tok, axes),
                jax.lax.psum(n_miss, axes))

    spec_data = P((HOST_AXIS, DATA_AXIS))
    spec_rep = P()
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(spec_data,) + (spec_rep,) * 9,
        out_specs=(spec_rep, spec_rep, spec_rep),
        check_vma=False)
    return jax.jit(sharded)


def shard_text_for_process(text: np.ndarray, mesh: Mesh, chunk: int):
    """Build this process's slice of the globally-sharded corpus array.

    The global text is padded to devices*chunk-aligned strips and laid out
    so device d (in mesh order) owns strips [d*S, (d+1)*S).  Returns the
    jax.Array with the multihost sharding attached (addressable shards only).
    """
    n_dev = mesh.devices.size
    per = -(-len(text) // n_dev)
    per = -(-per // chunk) * chunk
    total = per * n_dev
    buf = np.zeros(total, np.uint8)
    buf[:len(text)] = text
    sharding = NamedSharding(mesh, P((HOST_AXIS, DATA_AXIS)))
    local_devs = [d for d in mesh.devices.reshape(-1)
                  if d.process_index == jax.process_index()]
    arrays = []
    for d in local_devs:
        i = list(mesh.devices.reshape(-1)).index(d)
        arrays.append(jax.device_put(buf[i * per:(i + 1) * per], d))
    return jax.make_array_from_single_device_arrays(
        (total,), sharding, arrays)
