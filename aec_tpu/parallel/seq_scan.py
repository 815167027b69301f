"""Sequence-parallel (pipelined) scan over a device mesh.

The framework's recurrences (GRU state, adaptive-filter state) are nonlinear,
so a single sequence cannot be parallelized associatively; the TPU-native
pattern for sequences whose frame axis must be sharded (memory capacity, or
co-locating frames with other sharded tensors) is a PIPELINE (SURVEY §5.7):

- the frame axis T is split into n_devices contiguous chunks, chunk i on
  device i;
- a stream of S sequences flows through the device pipeline GPipe-style:
  in round p, device i scans chunk i of sequence (p - i), then hands the
  carry to device i+1 over the ring via ``lax.ppermute`` (ICI neighbor
  exchange);
- after S + n - 1 rounds every sequence has traversed every chunk; outputs
  are naturally sharded [S, T/n] per device and the final carries come off
  the last stage.

For the AEC workload plain data parallelism over utterances is strictly
better (recurrent state is O(1) in T) and remains the default; this module
exists for the long-sequence regime and as the framework's pp/sp primitive.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def pipelined_scan(
    step_fn: Callable[[Any, Any], tuple[Any, Any]],
    init_state: Any,
    xs: Any,
    mesh: Mesh,
    axis: str = "data",
):
    """Scan ``step_fn`` over axis 1 (frames) of ``xs`` (leading axis =
    sequences), with frames sharded over ``axis`` and sequences pipelined.

    step_fn: (state, x_t) -> (state, y_t), same contract as ``lax.scan``.
    xs: pytree of [S, T, ...]; T must divide by the mesh axis size.
    Returns (ys [S, T, ...] frames-sharded, final_states [S, ...]).
    """
    n = mesh.shape[axis]

    def local(xs_local):
        # xs_local: [S, T/n, ...] (this device's frame chunk of every seq)
        idx = jax.lax.axis_index(axis)
        s_total = jax.tree.leaves(xs_local)[0].shape[0]

        def zero_like_state():
            return jax.tree.map(jnp.zeros_like, init_state)

        ys_shape = jax.eval_shape(
            lambda s, x: jax.lax.scan(step_fn, s, x)[1],
            init_state,
            jax.tree.map(lambda a: a[0], xs_local),
        )
        ys_buf = jax.tree.map(
            lambda sh: jnp.zeros((s_total, *sh.shape), sh.dtype), ys_shape
        )
        finals_buf = jax.tree.map(
            lambda leaf: jnp.zeros((s_total, *leaf.shape), leaf.dtype), init_state
        )

        def round_body(p, carry):
            ys_buf, finals_buf, recv = carry
            s = p - idx  # sequence index this device works on this round
            active = (s >= 0) & (s < s_total)
            s_c = jnp.clip(s, 0, s_total - 1)
            x_seq = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, s_c, 0, keepdims=False),
                xs_local,
            )
            # stage 0 always starts sequences fresh; others use received carry
            carry_in = jax.tree.map(
                lambda a, b: jnp.where(idx == 0, a, b), init_state, recv
            )
            new_state, ys = jax.lax.scan(step_fn, carry_in, x_seq)
            ys_buf = jax.tree.map(
                lambda buf, y: jnp.where(
                    active,
                    jax.lax.dynamic_update_index_in_dim(buf, y, s_c, 0),
                    buf,
                ),
                ys_buf,
                ys,
            )
            # last stage records the sequence's final state
            is_last = idx == n - 1
            finals_buf = jax.tree.map(
                lambda buf, st: jnp.where(
                    active & is_last,
                    jax.lax.dynamic_update_index_in_dim(buf, st, s_c, 0),
                    buf,
                ),
                finals_buf,
                new_state,
            )
            # hand the carry to the right neighbor (ring, ICI)
            send = jax.tree.map(
                lambda st, z: jnp.where(active, st, z), new_state, zero_like_state()
            )
            recv = jax.tree.map(
                lambda a: jax.lax.ppermute(
                    a, axis, [(i, i + 1) for i in range(n - 1)]
                ),
                send,
            )
            return ys_buf, finals_buf, recv

        ys_buf, finals_buf, _ = jax.lax.fori_loop(
            0, s_total + n - 1, round_body, (ys_buf, finals_buf, zero_like_state())
        )
        # broadcast final states off the last stage (others contribute zeros)
        finals = jax.tree.map(lambda a: jax.lax.psum(a, axis), finals_buf)
        return ys_buf, finals

    # output structure of one scan step stack (for out_specs)
    ys_struct = jax.eval_shape(
        lambda s, x: jax.lax.scan(step_fn, s, x)[1],
        init_state,
        jax.tree.map(lambda a: a[0], xs),
    )
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(None, axis), xs),),
        out_specs=(
            jax.tree.map(lambda _: P(None, axis), ys_struct),
            jax.tree.map(lambda _: P(), init_state),
        ),
        check_rep=False,
    )(xs)
