"""Pallas ring SpMM with inter-chip remote DMA (comm/compute overlap).

The TPU-native counterpart of the boundary-row exchange SURVEY.md section
2.4 promises: the protein-row-sharded P-P SpMM (parallel/ring.py) with the
activation-shard rotation done by the KERNEL itself — each ring step starts
an async remote copy of the current [n_local, d] shard to the left
neighbor's spare buffer slot over ICI, computes the local adjacency block's
gather/scatter matmuls while the copy is in flight, then waits and advances.
Double-buffered comm slots; a pairwise neighbor barrier per step keeps
devices within one step of each other so a send can never land in a buffer
its owner is still reading.

The XLA path (parallel/ring.py:ring_spmm — lax.scan + ppermute) computes the
same thing and is the correctness oracle; this kernel exists to own the
overlap schedule instead of leaving it to XLA's async collective-permute
heuristics.  Backward pass: the cached GCN normalization is SYMMETRIC
(A_hat^T = A_hat globally), so dh is the same ring SpMM applied to the
cotangent — the identical argument as ops/pallas_segment.py:gcn_spmm_padded.

Runs under shard_map; validated in interpret mode on the virtual CPU mesh
(tests/test_pallas_ring.py) — single-chip hardware cannot execute it for
real, which is exactly why the oracle path stays the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tip_tpu.ops.pallas_segment import _onehot, _onehot_t

RING_COLLECTIVE_ID = 11


def _ring_kernel(axis_name, chunk, src_ref, dstl_ref, w_ref, h_ref, out_ref,
                 comm_ref, send_sem, recv_sem):
    s = pl.program_id(0)
    k = pl.num_programs(0)
    my = jax.lax.axis_index(axis_name)
    n_dev = jax.lax.axis_size(axis_name)
    left = jax.lax.rem(my - 1 + n_dev, n_dev)
    right = jax.lax.rem(my + 1, n_dev)
    n_local, d = h_ref.shape
    e_pad = src_ref.shape[1]
    slot = jax.lax.rem(s, 2)
    nslot = jax.lax.rem(s + 1, 2)

    @pl.when(s == 0)
    def _():
        comm_ref[0] = h_ref[:]
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    rdma = pltpu.make_async_remote_copy(
        src_ref=comm_ref.at[slot],
        dst_ref=comm_ref.at[nslot],
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=left,  # chip i needs shard (i+s+1), held by chip i+1
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )

    @pl.when(s < k - 1)
    def _():
        rdma.start()

    # local block SpMM while the copy is in flight
    def body(j, _):
        sl = src_ref[0, pl.ds(j * chunk, chunk)]
        dl = dstl_ref[0, pl.ds(j * chunk, chunk)]
        ww = w_ref[0, pl.ds(j * chunk, chunk)]
        msgs = jnp.dot(
            _onehot(sl, n_local, jnp.float32), comm_ref[slot],
            preferred_element_type=jnp.float32,
        ) * ww[:, None]
        out_ref[:] += jnp.dot(
            _onehot_t(dl, n_local, jnp.float32), msgs,
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, e_pad // chunk, body, 0)

    @pl.when(s < k - 1)
    def _():
        rdma.wait()

    # pairwise neighbor barrier: nobody enters step s+1 until both
    # neighbors finished step s => a step-(s+1) send (slot parity s) can
    # never overwrite a buffer its owner still reads in step s-1.
    @pl.when(k > 1)
    def _():
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=left)
        pltpu.semaphore_signal(barrier, inc=1, device_id=right)
        pltpu.semaphore_wait(barrier, 2)


def _ring_fwd(h_own, src_l, dst_l, w, axis_name: str, chunk: int,
              interpret: bool):
    k, e_pad = src_l.shape
    n_local, d = h_own.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, e_pad), lambda s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_pad), lambda s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_pad), lambda s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # h_own whole
        ],
        out_specs=pl.BlockSpec((n_local, d), lambda s: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, n_local, d), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kw = {"interpret": pltpu.InterpretParams()} if interpret else {}
    return pl.pallas_call(
        functools.partial(_ring_kernel, axis_name, chunk),
        out_shape=jax.ShapeDtypeStruct((n_local, d), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            collective_id=RING_COLLECTIVE_ID,
        ),
        **kw,
    )(src_l, dst_l, w, h_own)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def ring_spmm_rdma(h_own, src_l, dst_l, w, axis_name: str, chunk: int = 512,
                   interpret: bool = False):
    """out[rows_i] = sum_s A[rows_i, rows_(i+s)] @ h[rows_(i+s)], in-kernel.

    Same contract as parallel/ring.py:ring_spmm (h_own [n_local, d]; ring
    blocks [k, E_pad] step-major, E_pad a multiple of ``chunk``; the global
    edge weights must form a SYMMETRIC matrix for the backward pass).
    """
    return _ring_fwd(h_own, src_l, dst_l, w, axis_name, chunk, interpret)


def _ring_vjp_fwd(h_own, src_l, dst_l, w, axis_name, chunk, interpret):
    out = _ring_fwd(h_own, src_l, dst_l, w, axis_name, chunk, interpret)
    return out, (src_l, dst_l, w)


def _ring_vjp_bwd(axis_name, chunk, interpret, res, dout):
    src_l, dst_l, w = res
    dh = _ring_fwd(dout, src_l, dst_l, w, axis_name, chunk, interpret)
    return dh, None, None, None


ring_spmm_rdma.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)
