"""GRU as a ``lax.scan`` over frames, with torch-compatible parameters.

The reference uses ``nn.GRU(batch_first=True)`` (ERB.py:213, :84). For
weight-level parity (shared checkpoints, golden tests) we keep the torch
parameter layout — stacked gates ordered [reset; update; new] with separate
input/hidden biases — but compute TPU-first:

- the input projection for ALL frames is hoisted out of the recurrence into
  one big ``[B*T, I] x [I, 3H]`` matmul (MXU), so the scan body only carries
  the O(H^2) hidden-state work;
- the scan carries ``h`` of shape [B, H]; all batch elements and all hidden
  units update in parallel per frame — the same structure the stage-1
  adaptive filters use (SURVEY.md §3.3).

Gate math (torch semantics):
    r = sigmoid(x W_ir^T + b_ir + h W_hr^T + b_hr)
    z = sigmoid(x W_iz^T + b_iz + h W_hz^T + b_hz)
    n = tanh(x W_in^T + b_in + r * (h W_hn^T + b_hn))
    h' = (1 - z) * n + z * h
"""

from __future__ import annotations

from typing import TypedDict

import jax
import jax.numpy as jnp
import numpy as np


class GruParams(TypedDict):
    w_ih: jax.Array  # (3H, I) rows ordered [r; z; n]
    w_hh: jax.Array  # (3H, H)
    b_ih: jax.Array  # (3H,)
    b_hh: jax.Array  # (3H,)


def gru_init(
    key: jax.Array, input_dim: int, hidden: int, *, orthogonal: bool = True,
    dtype=jnp.float32,
) -> GruParams:
    """Initialize GRU params.

    ``orthogonal=True`` mirrors the reference's init policy (ERB.py:245-250):
    orthogonal weight matrices; biases keep torch's default
    U(-1/sqrt(H), 1/sqrt(H)).
    """
    k_wih, k_whh, k_bih, k_bhh = jax.random.split(key, 4)
    if orthogonal:
        w_init = jax.nn.initializers.orthogonal()
        w_ih = w_init(k_wih, (3 * hidden, input_dim), dtype)
        w_hh = w_init(k_whh, (3 * hidden, hidden), dtype)
    else:
        bound_i = 1.0 / np.sqrt(hidden)
        w_ih = jax.random.uniform(k_wih, (3 * hidden, input_dim), dtype, -bound_i, bound_i)
        w_hh = jax.random.uniform(k_whh, (3 * hidden, hidden), dtype, -bound_i, bound_i)
    bound = 1.0 / np.sqrt(hidden)
    return GruParams(
        w_ih=w_ih,
        w_hh=w_hh,
        b_ih=jax.random.uniform(k_bih, (3 * hidden,), dtype, -bound, bound),
        b_hh=jax.random.uniform(k_bhh, (3 * hidden,), dtype, -bound, bound),
    )


def gru_cell(params: GruParams, h: jax.Array, x_proj: jax.Array) -> jax.Array:
    """One GRU step given a PRE-PROJECTED input.

    ``x_proj`` is ``x @ w_ih.T + b_ih`` of shape [B, 3H] (hoisted matmul);
    ``h`` is [B, H]. Returns h' [B, H].
    """
    h_proj = jnp.matmul(h, params["w_hh"].T) + params["b_hh"]  # [B, 3H]
    xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
    hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def gru_scan(
    params: GruParams,
    x: jax.Array,
    h0: jax.Array | None = None,
    *,
    fused: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Run the GRU over frames: ``[B, T, I] -> ([B, T, H], h_T)``.

    The input projection runs as a single batched matmul before the scan.

    ``fused``: run the recurrence as ONE Pallas kernel with the hidden state
    resident in VMEM (kernels/pallas_gru.py) instead of a ``lax.scan``.
    MEASURED (v5e, slope method): at batch 256 x 513 frames the XLA scan is
    already FASTER (0.53 ms vs 1.49 ms fused) — with the input projection
    hoisted, XLA keeps the tiny carry on-chip and the loop overhead is
    negligible, so the kernel only pays extra relayouts. ``None`` = auto:
    fused only for single-stream (B == 1) long scans on TPU, where per-step
    overhead still dominates. The fused path is differentiable (custom VJP
    recomputes through the scan formulation) and numerically matches the
    scan to float32 roundoff (tests/test_pallas_gru.py).
    """
    b, t, _ = x.shape
    hidden = params["w_hh"].shape[-1]
    if h0 is None:
        h0 = jnp.zeros((b, hidden), dtype=x.dtype)
    if fused is None:
        fused = b == 1 and t >= 64 and jax.default_backend() == "tpu"
    if fused:
        from aec_tpu.kernels.pallas_gru import gru_scan_fused

        # off-TPU an explicit fused=True runs the kernel in interpret mode
        # (the Pallas TPU lowering is unavailable there); numerics match the
        # compiled kernel — tests/test_pallas_gru.py uses the same mode
        return gru_scan_fused(
            params, x, h0, jax.default_backend() != "tpu"
        )
    x_proj = jnp.matmul(x, params["w_ih"].T) + params["b_ih"]  # [B, T, 3H]

    def step(h, xp_t):
        h_next = gru_cell(params, h, xp_t)
        return h_next, h_next

    h_last, ys = jax.lax.scan(step, h0, jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(ys, 0, 1), h_last
