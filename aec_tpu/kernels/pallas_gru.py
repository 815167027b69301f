"""Pallas TPU kernel: fused batched GRU scan with VMEM-resident state.

The stage-2 GRU (ops/gru.py) is a ``lax.scan`` whose per-step body is tiny —
a [B, H] x [H, 3H] matmul plus gates with H=32 — so on TPU the XLA while-loop
overhead (per-step HBM round trips for the carry + loop bookkeeping)
dominates the batched pipeline. Here the WHOLE recurrence is one
``pallas_call``:

- the hidden state h [B, H] lives in VMEM scratch across all grid steps;
- the input projection ``x @ w_ih.T + b_ih`` (plus the additive b_hr/b_hz
  halves of the hidden bias — they commute with the sigmoid sums) is hoisted
  OUTSIDE the kernel into one big MXU matmul, exactly as in ops/gru.py;
- each grid step streams ``unroll`` pre-projected frames in and ``unroll``
  hidden outputs out; the recurrent math per frame is three small MXU dots
  (r/z/n gates kept as separate [H, H] operands — static lane-dim slicing at
  sub-128 offsets would force Mosaic relayouts).

Gate math matches torch/ops.gru exactly (b_hn must stay INSIDE the reset
gate product: ``n = tanh(xn + b_in + r * (h W_hn^T + b_hn))``), so this is a
drop-in for ``gru_scan`` — verified in tests/test_pallas_gru.py (interpret
mode vs the scan, plus the torch oracle via the existing little_net tests).

A ``jax.custom_vjp`` wrapper makes the kernel differentiable by recomputing
the backward pass through the plain XLA scan formulation, so training code
may call it transparently.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(unroll: int):
    def kernel(h0_ref, xr_ref, xz_ref, xn_ref, whr_ref, whz_ref, whn_ref,
               bhn_ref, y_ref, h):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            h[:] = h0_ref[:]

        for u in range(unroll):
            hr = jnp.dot(h[:], whr_ref[:], preferred_element_type=jnp.float32)
            hz = jnp.dot(h[:], whz_ref[:], preferred_element_type=jnp.float32)
            hn = (
                jnp.dot(h[:], whn_ref[:], preferred_element_type=jnp.float32)
                + bhn_ref[:]
            )
            r = jax.nn.sigmoid(xr_ref[0, u] + hr)
            z = jax.nn.sigmoid(xz_ref[0, u] + hz)
            n = jnp.tanh(xn_ref[0, u] + r * hn)
            h_new = (1.0 - z) * n + z * h[:]
            h[:] = h_new
            y_ref[0, u] = h_new

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "unroll"))
def _gru_scan_fused_fwd(
    params,
    x: jax.Array,  # [B, T, I]
    h0: jax.Array,  # [B, H]
    *,
    interpret: bool = False,
    unroll: int = 8,
) -> tuple[jax.Array, jax.Array]:
    b, t_steps, _ = x.shape
    hidden = params["w_hh"].shape[-1]

    # Hoisted input projection (one big MXU matmul), with the additive
    # b_hr/b_hz bias halves folded in; b_hn stays inside the reset product.
    bias = params["b_ih"] + jnp.concatenate(
        [params["b_hh"][: 2 * hidden], jnp.zeros((hidden,), params["b_hh"].dtype)]
    )
    x_proj = jnp.matmul(x, params["w_ih"].T) + bias  # [B, T, 3H]
    xr, xz, xn = jnp.split(x_proj, 3, axis=-1)

    unroll = max(1, min(unroll, t_steps))
    t_pad = (-t_steps) % unroll
    t_total = t_steps + t_pad

    def to_tm(a):  # [B, T, H] -> (T/unroll, unroll, B, H) time-major blocks
        if t_pad:
            a = jnp.pad(a, [(0, 0), (0, t_pad), (0, 0)])
        a = jnp.swapaxes(a, 0, 1).astype(jnp.float32)
        return a.reshape(t_total // unroll, unroll, b, hidden)

    whr, whz, whn = (
        params["w_hh"][:hidden].T,
        params["w_hh"][hidden : 2 * hidden].T,
        params["w_hh"][2 * hidden :].T,
    )

    step_spec = pl.BlockSpec(
        (1, unroll, b, hidden), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM
    )
    whole = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    ys = pl.pallas_call(
        _kernel(unroll),
        grid=(t_total // unroll,),
        in_specs=[
            whole((b, hidden)),  # h0
            step_spec,  # xr
            step_spec,  # xz
            step_spec,  # xn
            whole((hidden, hidden)),  # whr
            whole((hidden, hidden)),  # whz
            whole((hidden, hidden)),  # whn
            whole((1, hidden)),  # bhn
        ],
        out_specs=step_spec,
        out_shape=jax.ShapeDtypeStruct(
            (t_total // unroll, unroll, b, hidden), jnp.float32
        ),
        scratch_shapes=[pltpu.VMEM((b, hidden), jnp.float32)],
        interpret=interpret,
    )(
        h0.astype(jnp.float32),
        to_tm(xr),
        to_tm(xz),
        to_tm(xn),
        whr.astype(jnp.float32),
        whz.astype(jnp.float32),
        whn.astype(jnp.float32),
        params["b_hh"][2 * hidden :].astype(jnp.float32)[None, :],
    )
    ys = ys.reshape(t_total, b, hidden)[:t_steps]  # [T, B, H]
    ys = jnp.swapaxes(ys, 0, 1)
    return ys.astype(x.dtype), ys[:, -1].astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gru_scan_fused(params, x, h0, interpret=False):
    """Fused-kernel GRU scan: ``[B, T, I] -> ([B, T, H], h_T)``.

    Differentiable: the backward pass recomputes through the plain
    ``lax.scan`` formulation (ops/gru.py), whose VJP XLA generates.
    ``interpret=True`` runs the kernel under the Pallas interpreter so an
    explicit ``gru_scan(fused=True)`` works off-TPU (ops/gru.py routes it).
    """
    return _gru_scan_fused_fwd(params, x, h0, interpret=interpret)


def _fwd(params, x, h0, interpret):
    return _gru_scan_fused_fwd(params, x, h0, interpret=interpret), (
        params, x, h0,
    )


def _bwd(interpret, res, g):
    from aec_tpu.ops import gru as gru_mod

    params, x, h0 = res
    _, vjp = jax.vjp(
        lambda p, xx, hh: gru_mod.gru_scan(p, xx, hh, fused=False), params, x, h0
    )
    return vjp(g)


gru_scan_fused.defvjp(_fwd, _bwd)
