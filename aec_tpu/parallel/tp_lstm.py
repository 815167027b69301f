"""Tensor-parallel LSTM scan: the recurrent weight stream sharded over chips.

Why this exists: ATT-CCRN's reference-faithful bottleneck is a 4096-unit
LSTM (reference attention_ccrn.py:369). At inference batch 1 its cost on one
chip IS the per-step HBM stream of ``w_hh`` — 134 MB even in bf16, far past
VMEM residency (the ``kernels/pallas_lstm.py`` cure) — so the measured
~91 ms/utterance sits at the single-chip weight-bandwidth floor
(docs/ROOFLINE.md). The only remaining lever is MORE MEMORY SYSTEMS: shard
the weight stream over the mesh so each chip streams 1/D of it per step and
exchange only the (tiny) hidden state over ICI.

Layout (the Megatron column-parallel recipe, adapted to a recurrence):

- the hidden dim H is split into D contiguous shards; shard d owns hidden
  slice ``h[d*H/D:(d+1)*H/D]`` AND the rows of ``w_ih``/``w_hh``/biases that
  produce its slice of ALL FOUR gates (torch row order is [i;f;g;o], so the
  owned rows are gate-strided — ``_gate_perm`` builds the permutation);
- per step each shard computes ``gates_local = x_proj_t + h_full @
  w_hh_local^T`` (contraction over FULL H — no partial sums, so numerics
  are op-identical to the dense scan), updates its c/h slices locally, then
  ``lax.all_gather(tiled=True)`` reassembles ``h_full`` (B*H floats — 16 KB
  for ATT-CCRN at batch 1) for the next step over ICI;
- the input projection + both biases are hoisted outside the scan, sharded
  the same way (each chip projects onto its own gate rows).

Per-step traffic: HBM ``4*H*H*bytes/D`` per chip (the win, ~8x on v5e-8)
vs an ICI all-gather of ``B*H`` floats (microseconds); compute is the same
MXU work split D ways. This is exactly the scaling-book "shard the weights,
let the activations ride ICI" recipe — worthwhile only in the
weight-stream-bound regime (big H, small B). LittleNet/TwoLayerGRU are
thousands of times too small to benefit; DCCRN's H=1024 pair is VMEM-
resident in the fused kernel already. ATT-CCRN is the user.

``models.att_ccrn.att_ccrn_apply(..., lstm_mesh=...)`` routes its bottleneck
here; ``__graft_entry__.dryrun_multichip`` exercises it on the virtual mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from aec_tpu.ops.lstm import LstmParams


def _gate_perm(hidden: int, n_shards: int) -> np.ndarray:
    """Row permutation putting shard d's [i;f;g;o] slices contiguous.

    Shard d of the permuted (4H,)-row array holds, for each gate g in
    [i,f,g,o], original rows ``g*H + d*H/D + [0..H/D)`` — i.e. the gate
    rows producing hidden slice d.
    """
    hp = hidden // n_shards
    return np.concatenate(
        [g * hidden + d * hp + np.arange(hp) for d in range(n_shards) for g in range(4)]
    )


def lstm_scan_tp(
    params: LstmParams,
    x: jax.Array,
    mesh: Mesh,
    axis: str = "model",
    h0: jax.Array | None = None,
    c0: jax.Array | None = None,
    recurrent_dtype=None,
):
    """[B, T, I] -> ([B, T, H], (h_T, c_T)), weights sharded over ``axis``.

    Same contract and gate math as ``ops.lstm.lstm_scan`` (torch semantics);
    H must divide the mesh axis size. ``x`` is replicated over ``axis``
    (shard it over a separate data axis as usual). ``recurrent_dtype``
    mirrors ``lstm_scan``: None = bf16 weight stream on TPU (the MXU's
    DEFAULT operand rounding makes it op-equivalent), f32 elsewhere.
    """
    b, t, _ = x.shape
    hidden = params["w_hh"].shape[-1]
    d = mesh.shape[axis]
    if hidden % d:
        raise ValueError(f"hidden={hidden} not divisible by mesh axis {axis}={d}")
    hp = hidden // d
    if h0 is None:
        h0 = jnp.zeros((b, hidden), x.dtype)
    if c0 is None:
        c0 = jnp.zeros((b, hidden), x.dtype)
    if recurrent_dtype is None and jax.default_backend() == "tpu":
        recurrent_dtype = jnp.bfloat16

    perm = _gate_perm(hidden, d)
    w_ih = params["w_ih"][perm]
    w_hh = params["w_hh"][perm]
    bias = (params["b_ih"] + params["b_hh"])[perm]

    def local(w_ih_l, w_hh_l, b_l, xs, h_full, c_full):
        # w_*_l: (4H/D, ·) — this shard's gate rows; h_full/c_full replicated
        idx = jax.lax.axis_index(axis)
        c_l = jax.lax.dynamic_slice_in_dim(c_full, idx * hp, hp, 1)
        x_proj = jnp.matmul(xs, w_ih_l.T) + b_l  # (B, T, 4H/D)
        w_hh_t = w_hh_l.T
        if recurrent_dtype is not None:
            w_hh_t = w_hh_t.astype(recurrent_dtype)  # cast ONCE, stream half

        def step(carry, xp_t):
            h_f, c = carry
            gates = xp_t + jnp.dot(
                h_f.astype(w_hh_t.dtype), w_hh_t, preferred_element_type=x.dtype
            )
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_l = jax.nn.sigmoid(o) * jnp.tanh(c)
            # reassemble h for the next step's full-H contraction: shard
            # order == original order by construction of _gate_perm
            h_f = jax.lax.all_gather(h_l, axis, axis=1, tiled=True)
            return (h_f, c), h_l

        (h_last, c_last), ys = jax.lax.scan(
            step, (h_full, c_l), jnp.swapaxes(x_proj, 0, 1)
        )
        ys = jnp.swapaxes(ys, 0, 1)  # (B, T, H/D)
        c_last = jax.lax.all_gather(c_last, axis, axis=1, tiled=True)
        return ys, h_last, c_last

    rep = P()  # replicated
    ys, h_last, c_last = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), rep, rep, rep),
        out_specs=(P(None, None, axis), rep, rep),
        check_rep=False,
    )(w_ih, w_hh, bias, x, h0, c0)
    return ys, (h_last, c_last)


def shard_lstm_params(params: LstmParams, mesh: Mesh, axis: str = "model"):
    """Place LSTM params with their gate rows sharded over ``axis``.

    Optional: ``lstm_scan_tp`` works on replicated params (shard_map slices
    them), but pre-placing avoids holding D copies of the 268 MB w_ih/w_hh
    pair in HBM. The arrays stay in the canonical torch row order — only
    the device placement is sharded; ``lstm_scan_tp`` permutes on trace.
    """
    s_rows = NamedSharding(mesh, P(axis))
    s_rep = NamedSharding(mesh, P())
    return LstmParams(
        w_ih=jax.device_put(params["w_ih"], s_rows),
        w_hh=jax.device_put(params["w_hh"], s_rows),
        b_ih=jax.device_put(params["b_ih"], s_rep),
        b_hh=jax.device_put(params["b_hh"], s_rep),
    )
