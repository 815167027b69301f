"""LSTM as a ``lax.scan`` with torch-compatible parameters.

Used by the DCCRN bottleneck (reference dccrn.py:517,560-566) and the
complex-LSTM stack (dccrn.py:423-450). Same design as ops/gru.py: the input
projection for all frames is hoisted into one MXU matmul; the scan body only
carries the O(H^2) recurrent work.

Gate math/layout (torch semantics), rows ordered [i; f; g; o]:
    i = sigmoid(x W_ii^T + b_ii + h W_hi^T + b_hi)
    f = sigmoid(...); g = tanh(...); o = sigmoid(...)
    c' = f * c + i * g;   h' = o * tanh(c')
"""

from __future__ import annotations

from typing import TypedDict

import jax
import jax.numpy as jnp
import numpy as np


class LstmParams(TypedDict):
    w_ih: jax.Array  # (4H, I)
    w_hh: jax.Array  # (4H, H)
    b_ih: jax.Array  # (4H,)
    b_hh: jax.Array  # (4H,)


def lstm_init(key: jax.Array, input_dim: int, hidden: int, dtype=jnp.float32) -> LstmParams:
    """torch default init: U(-1/sqrt(H), 1/sqrt(H)) everywhere."""
    ks = jax.random.split(key, 4)
    bound = 1.0 / np.sqrt(hidden)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return LstmParams(
        w_ih=u(ks[0], (4 * hidden, input_dim)),
        w_hh=u(ks[1], (4 * hidden, hidden)),
        b_ih=u(ks[2], (4 * hidden,)),
        b_hh=u(ks[3], (4 * hidden,)),
    )


def quantize_rows_int8(w: jax.Array):
    """Symmetric per-row int8 quantization: ``w ~= w_q * scale[:, None]``.

    Rows of ``w_hh`` are per-gate-output units, so a per-row scale keeps the
    quantization grid matched to each unit's weight range (the standard
    per-output-channel scheme). Returns (int8 codes, f32 per-row scale).
    """
    amax = jnp.max(jnp.abs(w), axis=1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_q = jnp.round(w / scale[:, None]).astype(jnp.int8)
    return w_q, scale


def lstm_cell(params: LstmParams, h, c, x_proj):
    gates = x_proj + jnp.matmul(h, params["w_hh"].T) + params["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_next = f * c + i * g
    h_next = o * jnp.tanh(c_next)
    return h_next, c_next


def lstm_scan(params: LstmParams, x: jax.Array, h0=None, c0=None,
              recurrent_dtype=None, int8_kernel: bool | None = None):
    """[B, T, I] -> ([B, T, H], (h_T, c_T)).

    ``recurrent_dtype`` (None = auto: bfloat16 on the TPU backend, else
    f32): storage dtype the recurrent weights are STREAMED in. On TPU the
    f32 matmul's DEFAULT precision already rounds both operands to bf16 on
    the MXU, so casting w_hh once outside the scan is op-equivalent — but
    it halves the per-step HBM weight traffic, which IS the cost of a big
    LSTM at small batch: ATT-CCRN's 4096-unit bottleneck (reference
    attention_ccrn.py:369) measures 179.7 -> 91.8 ms per 8 s utterance at
    batch 1 on v5e (XLA streams the (4H, H) f32 block per step; at batch 8
    XLA already hoists a bf16 convert, measured no change). Off-TPU the
    cast would genuinely change numerics vs the f64/torch oracles, so the
    default keeps f32 there.

    ``recurrent_dtype="int8"`` (opt-in, INFERENCE-ONLY) halves the weight
    stream again: w_hh is quantized once per-row to int8
    (``quantize_rows_int8``), h is quantized per step at the fixed scale
    127 (|h| < 1 by construction: h = sigmoid * tanh), and the recurrence
    runs as an s8 x s8 -> s32 MXU matmul with the per-row dequant folded
    into one cheap (B, 4H) multiply. Unlike the bf16 cast this is NOT
    op-equivalent — grade quality before adopting (see
    benchmarks/ab_lstm_int8.py; ATT-CCRN wav SNR vs the f32 path is the
    shipped grade). The ``jnp.round`` sites have zero gradient, so this
    path must not be used under ``jax.grad``.
    """
    b, t, _ = x.shape
    hidden = params["w_hh"].shape[-1]
    default_state = h0 is None and c0 is None
    if h0 is None:
        h0 = jnp.zeros((b, hidden), dtype=x.dtype)
    if c0 is None:
        c0 = jnp.zeros((b, hidden), dtype=x.dtype)
    x_proj = jnp.matmul(x, params["w_ih"].T) + params["b_ih"]
    if recurrent_dtype is None and jax.default_backend() == "tpu":
        recurrent_dtype = jnp.bfloat16
    if recurrent_dtype is not None and not isinstance(recurrent_dtype, str):
        # dtype-object spelling: np.dtype('int8') == 'int8', so jnp.int8 /
        # np.int8 normalize to the string route; any OTHER integer dtype
        # must not fall into the cast branch, where .astype would silently
        # truncate the weights to ~0
        if jnp.issubdtype(jnp.dtype(recurrent_dtype), jnp.integer):
            if jnp.dtype(recurrent_dtype) == jnp.dtype(jnp.int8):
                recurrent_dtype = "int8"
            else:
                raise ValueError(
                    f"integer recurrent_dtype {recurrent_dtype!r} is not "
                    "supported; only 'int8' (quantized streaming) is"
                )
    elif isinstance(recurrent_dtype, str) and recurrent_dtype != "int8":
        recurrent_dtype = jnp.dtype(recurrent_dtype)
        if jnp.issubdtype(recurrent_dtype, jnp.integer):
            raise ValueError(
                f"integer recurrent_dtype {recurrent_dtype!r} is not "
                "supported; only 'int8' (quantized streaming) is"
            )

    if recurrent_dtype == "int8":
        w_q, w_scale = quantize_rows_int8(params["w_hh"])
        w_q_t = w_q.T  # (H, 4H) int8 — the per-step HBM stream
        out_scale = (w_scale / 127.0).astype(x.dtype)  # (4H,)
        b_hh = params["b_hh"]
        # int8-RESIDENT Pallas kernel (round-4, kernels/pallas_lstm.py):
        # quantized weights pinned in VMEM across the whole time grid, h
        # carried as int8 scratch. MEASURED SLOWER than this XLA scan at
        # the ATT-CCRN bottleneck dims (honest same-process slope, v5e:
        # kernel 28.96 ms vs scan 24.67 per 512-frame batch-1 utterance —
        # benchmarks/results/ab_lstm_int8_r4.json): XLA already keeps the
        # 67 MB int8 block VMEM-resident, both formulations face the same
        # serial dot-latency chain, and the kernel adds per-grid-step DMA
        # overhead. Kept as an EXPLICIT opt-in (int8_kernel=True) — a
        # measured dead end in the pallas_fullsubnet.py tradition, not a
        # route.
        use_kernel = bool(int8_kernel)
        if use_kernel and not (default_state and hidden % 128 == 0):
            raise ValueError(
                "int8_kernel=True needs zero initial state and "
                "128-aligned hidden dim (got h0/c0 set or "
                f"hidden={hidden})"
            )
        if use_kernel:
            from aec_tpu.kernels.pallas_lstm import lstm_int8_fused

            ys, c_last = lstm_int8_fused(
                w_q_t, out_scale, x_proj + b_hh,
                interpret=jax.default_backend() != "tpu",
            )
            ys = ys.astype(x.dtype)
            return ys, (ys[:, -1], c_last.astype(x.dtype))

        def step(carry, xp_t):
            h, c = carry
            # |h| < 1 by construction (h = sigmoid * tanh), but a caller may
            # supply h0 from a differently-scaled source; out-of-range
            # float->int8 converts are implementation-defined in XLA, so
            # clip (one cheap VPU op) to make the invariant robust
            h_q = jnp.round(jnp.clip(h * 127.0, -127.0, 127.0)).astype(jnp.int8)
            acc = jax.lax.dot_general(
                h_q, w_q_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            gates = xp_t + acc.astype(x.dtype) * out_scale + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_next = f * c + i * g
            h_next = o * jnp.tanh(c_next)
            return (h_next, c_next), h_next
    elif recurrent_dtype is not None:
        w_hh_t = params["w_hh"].T.astype(recurrent_dtype)  # cast ONCE
        b_hh = params["b_hh"]

        def step(carry, xp_t):
            h, c = carry
            gates = xp_t + jnp.dot(
                h.astype(recurrent_dtype), w_hh_t,
                preferred_element_type=x.dtype,
            ) + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_next = f * c + i * g
            h_next = o * jnp.tanh(c_next)
            return (h_next, c_next), h_next
    else:

        def step(carry, xp_t):
            h, c = carry
            h, c = lstm_cell(params, h, c, xp_t)
            return (h, c), h

    (h_last, c_last), ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(ys, 0, 1), (h_last, c_last)


def complex_lstm_init(key, input_dim: int, hidden: int, dtype=jnp.float32):
    """'Naive' complex LSTM (dccrn.py:423-450): separate real/imag LSTMs of
    half width, cross-combined as (r2r - i2i, i2r + r2i)."""
    k_r, k_i = jax.random.split(key)
    return {
        "real": lstm_init(k_r, input_dim // 2, hidden // 2, dtype),
        "imag": lstm_init(k_i, input_dim // 2, hidden // 2, dtype),
    }


def complex_lstm_scan(params, real: jax.Array, imag: jax.Array,
                      fused: bool | None = None):
    """([B,T,I/2], [B,T,I/2]) -> ([B,T,H/2], [B,T,H/2]).

    The reference's naive form (dccrn.py:434-442) is four independent LSTM
    passes (real/imag params x real/imag inputs) cross-combined as
    (r2r - i2i, i2r + r2i). All four share the time axis, so they fold into
    ONE ``lax.scan`` whose recurrence is a single batched matmul: the group
    axis g stacks the two parameter sets, the batch axis stacks the two
    inputs — four skinny (B,H)@(H,4H) products become one
    (2,2B,H)@(2,H,4H) per step, quartering the sequential step count.
    Measured on v5e (DCCRN single-utterance enhancement, batch 1): the
    sequential scan overhead dominates, so this is a direct wall-clock cut.
    Numerics are op-identical to the four separate scans.

    ``fused`` (None = auto on the TPU backend at batch <= 16, long
    sequences): the WHOLE grouped recurrence as one Pallas kernel with
    VMEM-resident h/c and recurrent weights (kernels/pallas_lstm.py) — the
    remaining per-step XLA while-loop overhead was 86% of DCCRN's
    single-utterance cost. The batch crossover was measured, not guessed
    (benchmarks/ab_lstm_batch.py, same-process slopes at DCCRN dims): the
    kernel wins at EVERY batch swept — b1 1.21x, b4 1.73x, b8 1.28x,
    b16 1.47x — so the route covers the whole measured range; b > 16 stays
    on the scan (unswept; xp VMEM blocks grow linearly with b).
    Differentiable (custom_vjp recomputes through this scan).
    """
    b, t, _ = real.shape
    if fused is None:
        fused = b <= 16 and t >= 64 and jax.default_backend() == "tpu"
    if fused:
        from aec_tpu.kernels.pallas_lstm import complex_lstm_scan_fused

        # off-TPU an explicit fused=True runs the kernel in interpret mode
        return complex_lstm_scan_fused(
            params, (real, imag), jax.default_backend() != "tpu"
        )
    hidden = params["real"]["w_hh"].shape[-1]
    w_ih = jnp.stack([params["real"]["w_ih"], params["imag"]["w_ih"]])
    w_hh = jnp.stack([params["real"]["w_hh"], params["imag"]["w_hh"]])
    b_ih = jnp.stack([params["real"]["b_ih"], params["imag"]["b_ih"]])
    b_hh = jnp.stack([params["real"]["b_hh"], params["imag"]["b_hh"]])
    x2 = jnp.concatenate([real, imag], axis=0)  # (2B, T, I)
    # input projection for all four paths hoisted into one batched matmul
    x_proj = jnp.einsum("bti,gji->gbtj", x2, w_ih) + b_ih[:, None, None, :]
    # stream the recurrent weights bf16 on TPU (op-equivalent to the MXU's
    # DEFAULT operand rounding, halves per-step HBM weight traffic — the
    # lstm_scan finding; here 33.6 MB/step f32 for DCCRN's H=1024 pair)
    if jax.default_backend() == "tpu":
        w_hh = w_hh.astype(jnp.bfloat16)

    def step(carry, xp_t):  # xp_t (2, 2B, 4H)
        hh, cc = carry
        gates = xp_t + jnp.einsum(
            "gbh,gjh->gbj", hh.astype(w_hh.dtype), w_hh,
            preferred_element_type=real.dtype,
        )
        gates = gates + b_hh[:, None, :]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        cc = jax.nn.sigmoid(f) * cc + jax.nn.sigmoid(i) * jnp.tanh(g)
        hh = jax.nn.sigmoid(o) * jnp.tanh(cc)
        return (hh, cc), hh

    h0 = jnp.zeros((2, 2 * b, hidden), real.dtype)
    _, ys = jax.lax.scan(step, (h0, h0), jnp.moveaxis(x_proj, 2, 0))
    ys = jnp.moveaxis(ys, 0, 2)  # (2, 2B, T, H)
    r2r, i2r = ys[0, :b], ys[0, b:]
    r2i, i2i = ys[1, :b], ys[1, b:]
    return r2r - i2i, i2r + r2i
