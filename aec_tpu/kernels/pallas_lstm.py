"""Pallas TPU kernel: fused GROUPED complex-LSTM scan (DCCRN bottleneck).

ops/lstm.complex_lstm_scan already folds the reference's four naive-complex
LSTM passes (dccrn.py:434-442) into ONE ``lax.scan`` whose per-step body is
a single grouped matmul — but at batch 1 (the model-zoo single-utterance
path) that scan is still the whole model's cost: measured 7.6 ms for
DCCRN's 8 s enhancement vs 1.1 ms with the bottleneck bypassed, i.e. the
XLA while-loop overhead (~6 us/step for ~1.4 us of matvec work) is 86% of
the model. Same disease the stage-2 GRU had; same cure as
kernels/pallas_gru.py:

- the (2 groups x 2B rows, H) hidden/cell state lives in VMEM scratch
  across the whole time grid;
- the input projections + ALL biases are hoisted outside into one big MXU
  matmul (LSTM has no GRU-style reset-gate bias subtlety — everything
  commutes into x_proj);
- the per-group recurrent weights (H, 4H) stay VMEM-resident (~33.6 MB
  fp32 for DCCRN's H=1024 pair — needs the raised Mosaic VMEM cap);
- each grid step streams ``unroll`` pre-projected frames in and ``unroll``
  hidden outputs out; per frame: one (2B, H) x (H, 4H) dot per group +
  elementwise gates. Dots are plain single-pass bf16 — exactly the
  ``Precision.DEFAULT`` einsum the scan formulation uses, so numerics
  match the scan like-for-like.

A ``jax.custom_vjp`` recomputes the backward through the scan formulation,
so DCCRN training code can call it transparently.

Batch sweep (late round-3, same-process 12-unit slopes at DCCRN dims
T=512/I=2048 — benchmarks/ab_lstm_batch.py, artifact
results/ab_lstm_batch_r3.json): the kernel beats the grouped scan at every
batch swept — b1 2.68 vs 3.24 ms (1.21x), b4 2.29 vs 3.98 (1.73x), b8 3.82
vs 4.90 (1.28x), b16 5.79 vs 8.51 (1.47x) — the per-step scan overhead the
batch was expected to amortize away still dominates at b=16. Auto-route is
b <= 16 (ops/lstm.complex_lstm_scan); NOTE the first A/B with a narrow
2-unit slope read NEGATIVE slopes (pure tunnel noise) — sub-5 ms costs need
the wide-slope method.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(unroll: int, g2b: int, hidden: int):
    half = g2b // 2  # rows per group (= 2B)

    def kernel(xp_ref, w0_ref, w1_ref, y_ref, h, c):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            h[:] = jnp.zeros_like(h)
            c[:] = jnp.zeros_like(c)

        for u in range(unroll):
            hb = h[:].astype(jnp.bfloat16)
            hh = jnp.concatenate(
                [
                    jnp.dot(hb[:half], w0_ref[:],
                            preferred_element_type=jnp.float32),
                    jnp.dot(hb[half:], w1_ref[:],
                            preferred_element_type=jnp.float32),
                ],
                axis=0,
            )
            gates = xp_ref[0, u] + hh  # (g2b, 4H)
            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
            g_ = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden :])
            c_new = f * c[:] + i * g_
            h_new = o * jnp.tanh(c_new)
            c[:] = c_new
            h[:] = h_new
            y_ref[0, u] = h_new

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "unroll", "vmem_limit_mb")
)
def _grouped_lstm_fused_fwd(
    w_ih: jax.Array,  # (2, 4H, I) stacked real/imag input weights
    w_hh: jax.Array,  # (2, 4H, H)
    b_ih: jax.Array,  # (2, 4H)
    b_hh: jax.Array,  # (2, 4H)
    x2: jax.Array,  # (2B, T, I) — [real_inputs || imag_inputs]
    *,
    interpret: bool = False,
    unroll: int = 8,
    vmem_limit_mb: int = 100,
) -> jax.Array:
    """Returns ys (2, 2B, T, H) matching the grouped-scan layout."""
    b2, t_steps, _ = x2.shape
    hidden = w_hh.shape[-1]
    g2b = 2 * b2

    # hoisted input projection for all four paths + all biases
    xp = jnp.einsum("bti,gji->gbtj", x2, w_ih) + (b_ih + b_hh)[:, None, None, :]
    xp = xp.reshape(g2b, t_steps, 4 * hidden)  # group-major rows

    unroll = max(1, min(unroll, t_steps))
    t_pad = (-t_steps) % unroll
    t_total = t_steps + t_pad
    if t_pad:
        xp = jnp.pad(xp, [(0, 0), (0, t_pad), (0, 0)])
    xp = jnp.swapaxes(xp, 0, 1).astype(jnp.float32)
    xp = xp.reshape(t_total // unroll, unroll, g2b, 4 * hidden)

    step_spec = pl.BlockSpec(
        (1, unroll, g2b, 4 * hidden), lambda t: (t, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    whole = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    ys = pl.pallas_call(
        _kernel(unroll, g2b, hidden),
        grid=(t_total // unroll,),
        in_specs=[
            step_spec,
            whole((hidden, 4 * hidden)),
            whole((hidden, 4 * hidden)),
        ],
        out_specs=pl.BlockSpec(
            (1, unroll, g2b, hidden), lambda t: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (t_total // unroll, unroll, g2b, hidden), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((g2b, hidden), jnp.float32),  # h
            pltpu.VMEM((g2b, hidden), jnp.float32),  # c
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        ),
    )(
        xp,
        # bf16 weights: the in-kernel dots single-pass-cast to bf16 anyway
        # (Precision.DEFAULT parity with the scan), and halving the operand
        # bytes halves whatever per-grid-step refetch Mosaic schedules for
        # the large constant blocks
        w_hh[0].T.astype(jnp.bfloat16),
        w_hh[1].T.astype(jnp.bfloat16),
    )
    ys = ys.reshape(t_total, g2b, hidden)[:t_steps]  # (T, 2*2B, H)
    ys = jnp.moveaxis(ys.reshape(t_steps, 2, b2, hidden), 0, 2)  # (2,2B,T,H)
    return ys


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def complex_lstm_scan_fused(params, real_imag, interpret=False):
    """Fused grouped complex-LSTM: ((r [B,T,I/2], i)) -> (r_out, i_out).

    Drop-in for ops/lstm.complex_lstm_scan's cross-combination; the
    backward recomputes through the scan formulation (XLA's VJP).
    """
    return _fused_apply(params, real_imag, interpret)


def _fused_apply(params, real_imag, interpret):
    real, imag = real_imag
    b = real.shape[0]
    w_ih = jnp.stack([params["real"]["w_ih"], params["imag"]["w_ih"]])
    w_hh = jnp.stack([params["real"]["w_hh"], params["imag"]["w_hh"]])
    b_ih = jnp.stack([params["real"]["b_ih"], params["imag"]["b_ih"]])
    b_hh = jnp.stack([params["real"]["b_hh"], params["imag"]["b_hh"]])
    x2 = jnp.concatenate([real, imag], axis=0)
    ys = _grouped_lstm_fused_fwd(
        w_ih, w_hh, b_ih, b_hh, x2, interpret=interpret
    )
    r2r, i2r = ys[0, :b], ys[0, b:]
    r2i, i2i = ys[1, :b], ys[1, b:]
    out = (r2r - i2i, i2r + r2i)
    return jax.tree.map(lambda a: a.astype(real.dtype), out)


def _int8_kernel(unroll: int, b_rows: int, hidden: int, t_steps: int):
    """Per-grid-step body of the int8-resident single-LSTM scan."""

    def kernel(xp_ref, wq_ref, scale_ref, y_ref, c_out, hq, c):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            hq[:] = jnp.zeros_like(hq)
            c[:] = jnp.zeros_like(c)

        out_scale = scale_ref[:]  # (1, 4H) f32 = w_row_scale / 127
        for u in range(unroll):
            acc = jax.lax.dot_general(
                hq[:], wq_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (b_rows, 4H) s8 x s8 -> s32 on the MXU
            gates = xp_ref[0, u] + acc.astype(jnp.float32) * out_scale
            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
            g_ = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden :])
            c_new = f * c[:] + i * g_
            h_new = o * jnp.tanh(c_new)
            y_ref[0, u] = h_new

            # time-padded tail frames (t_pad) must not advance the carried
            # state — c_final would otherwise be corrupted by zero-input
            # pseudo-steps
            @pl.when(t * unroll + u < t_steps)
            def _advance():
                c[:] = c_new
                # |h| < 1 by construction; clip keeps the f32->int8 convert
                # defined for any input. Same fixed-scale-127 quantization
                # as ops/lstm.py's int8 scan branch — the requantization is
                # a pure function of h, so carrying int8 h forward is
                # numerically IDENTICAL to the scan formulation.
                hq[:] = jnp.round(
                    jnp.clip(h_new * 127.0, -127.0, 127.0)
                ).astype(jnp.int8)

        # constant-index output block: copied out once, after the last step
        c_out[:] = c[:]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "unroll", "vmem_limit_mb")
)
def lstm_int8_fused(
    w_q_t: jax.Array,  # (H, 4H) int8 per-row-quantized recurrent weights
    out_scale: jax.Array,  # (4H,) f32 — w_row_scale / 127 (dequant fold)
    xp: jax.Array,  # (B, T, 4H) f32 — x @ w_ih.T + b_ih + b_hh, hoisted
    *,
    interpret: bool = False,
    unroll: int = 1,
    vmem_limit_mb: int = 100,
) -> jax.Array:
    """int8-RESIDENT Pallas LSTM scan: returns ys (B, T, H) f32.

    The round-3 XLA int8 scan (ops/lstm.lstm_scan recurrent_dtype="int8")
    cut ATT-CCRN's batch-1 bottleneck 92.5 -> 24.5 ms by shrinking the 4H^2
    recurrent block to 64 MiB — under v5e's 128 MiB VMEM, so XLA keeps it
    resident. This kernel removes what's left of the per-step XLA
    while-loop overhead the same way kernels above do for bf16: weights
    pinned in VMEM across the whole time grid via a constant-index
    BlockSpec, h carried as int8 scratch (requantizing f32 h each step is a
    pure function of h, so feeding the int8 carry forward is numerically
    IDENTICAL to the scan formulation), c in f32 scratch, ``unroll``
    pre-projected frames streamed per grid step. Inference-only (the
    round() sites have zero gradient), like the scan branch it mirrors.

    Verdict-r3 item 3 — MEASURED VERDICT: the kernel LOSES to the XLA int8
    scan at the target dims (honest same-process slope on v5e, H=4096
    T=512 batch-1: kernel 28.96 ms vs scan 24.67 —
    benchmarks/results/ab_lstm_int8_r4.json). The 67 MB int8 weight block
    already fits VMEM, so XLA keeps it resident in the scan too; both
    formulations pay the same serial (B,H)x(H,4H) dot-latency chain, and
    the kernel adds per-grid-step DMA/sync the XLA while-loop pipelines
    better. Kept un-routed (lstm_scan(int8_kernel=True) opt-in) as the
    measured record, pallas_fullsubnet.py-style. Earlier async probe
    readings of ~0.4 ms were relay-memoization artifacts — only
    host-readback slope timings count on this tunnel (CLAUDE.md).

    ``unroll`` defaults to 1 — at ATT-CCRN dims (H=4096, T=512) the remote
    Mosaic compile measured 937 s at unroll=8 vs 12.4 s at unroll=1 for
    indistinguishable runtime (the serial (B,H)x(H,4H) dot-latency chain is
    the cost; per-grid-step overhead is ~1 us, so unrolling buys ~T us
    total while the compiler has to schedule ``unroll`` copies of the giant
    dot). Raise it only for small hidden sizes.
    """
    b, t_steps, four_h = xp.shape
    hidden = four_h // 4
    # MXU/VPU row padding: f32 min sublane tile is 8; the int8 h operand
    # rides the same rows (Mosaic pads the int8 scratch internally)
    b_rows = max(8, b)
    if b_rows % 8:
        b_rows += -b_rows % 8
    unroll = max(1, min(unroll, t_steps))
    t_pad = (-t_steps) % unroll
    t_total = t_steps + t_pad
    xp = jnp.pad(
        xp.astype(jnp.float32), [(0, b_rows - b), (0, t_pad), (0, 0)]
    )
    xp = jnp.swapaxes(xp, 0, 1).reshape(
        t_total // unroll, unroll, b_rows, four_h
    )

    whole = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    ys = pl.pallas_call(
        _int8_kernel(unroll, b_rows, hidden, t_steps),
        grid=(t_total // unroll,),
        in_specs=[
            pl.BlockSpec(
                (1, unroll, b_rows, four_h), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            whole((hidden, four_h)),
            whole((1, four_h)),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, unroll, b_rows, hidden), lambda t: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            whole((b_rows, hidden)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (t_total // unroll, unroll, b_rows, hidden), jnp.float32
            ),
            jax.ShapeDtypeStruct((b_rows, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_rows, hidden), jnp.int8),  # h (quantized carry)
            pltpu.VMEM((b_rows, hidden), jnp.float32),  # c
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        ),
    )(xp, w_q_t, out_scale.reshape(1, four_h).astype(jnp.float32))
    ys, c_final = ys
    ys = ys.reshape(t_total, b_rows, hidden)[:t_steps, :b]
    return jnp.swapaxes(ys, 0, 1), c_final[:b]  # (B, T, H), (B, H)


def _fwd(params, real_imag, interpret):
    return _fused_apply(params, real_imag, interpret), (params, real_imag)


def _bwd(interpret, res, g):
    from aec_tpu.ops import lstm as lstm_mod

    params, (real, imag) = res
    _, vjp = jax.vjp(
        lambda p, r, i: lstm_mod.complex_lstm_scan(p, r, i, fused=False),
        params, real, imag,
    )
    dp, dr, di = vjp(g)
    return dp, (dr, di)


complex_lstm_scan_fused.defvjp(_fwd, _bwd)
