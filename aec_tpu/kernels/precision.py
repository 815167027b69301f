"""bf16_3x matmul decomposition for Pallas TPU kernels.

Mosaic lowers a float32 ``jnp.dot`` to a SINGLE-pass bf16 MXU matmul (only
the accumulator honors ``preferred_element_type``), so kernels that need
XLA's ``Precision.HIGH`` numerics — measured ERLE-identical to full fp32 for
the stage-1 filters (benchmarks/validate_precision.py), while single-pass
bf16 loses up to 1.45 dB tail-ERLE on high-ERLE scenes — must decompose
explicitly:

    x @ m  ~=  x_hi @ m_hi + x_hi @ m_lo + x_lo @ m_hi

with ``v_hi = bf16(v)`` and ``v_lo = bf16(v - f32(v_hi))`` (the classic
bfloat16_3x split; the dropped x_lo @ m_lo term is O(eps^2)). Constant
matrices are split once outside the kernel; the dynamic operand splits
in-kernel on the VPU. The fused Kalman/NLMS kernels are NOT matmul-bound
(bf16 vs f32 dot operands measured identical throughput), so the two extra
MXU passes are effectively free.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def split_hi_lo(m) -> tuple[jnp.ndarray, jnp.ndarray]:
    """float32 matrix -> (hi, lo) bf16 pair with hi + lo ~= m."""
    m = np.asarray(m, np.float32)
    hi = m.astype(jnp.bfloat16)
    lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return jnp.asarray(hi), jnp.asarray(lo)


def dot_high(x, m_hi_ref, m_lo_ref):
    """bf16_3x product of a float32 operand with a pre-split matrix ref."""
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (
        jnp.dot(x_hi, m_hi_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(x_hi, m_lo_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(x_lo, m_hi_ref[:], preferred_element_type=jnp.float32)
    )


def dot_fast(x, m_hi_ref, _m_lo_ref=None):
    """Single-pass bf16 product (Precision.DEFAULT equivalent)."""
    return jnp.dot(
        x.astype(jnp.bfloat16), m_hi_ref[:], preferred_element_type=jnp.float32
    )


def dot_high_lhs(m_hi_ref, m_lo_ref, x):
    """bf16_3x product ``m @ x`` with the constant matrix on the LEFT.

    Mirror of :func:`dot_high` for batch-in-lanes kernels, where the dynamic
    operand keeps the batch axis in lanes and the transform contracts over
    its sublane (bin) axis."""
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (
        jnp.dot(m_hi_ref[:], x_hi, preferred_element_type=jnp.float32)
        + jnp.dot(m_lo_ref[:], x_hi, preferred_element_type=jnp.float32)
        + jnp.dot(m_hi_ref[:], x_lo, preferred_element_type=jnp.float32)
    )


def dot_fast_lhs(m_hi_ref, _m_lo_ref, x):
    """Single-pass bf16 ``m @ x`` (constant on the left)."""
    return jnp.dot(
        m_hi_ref[:], x.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )


def dot_high_lhs_k1(m_hi_ref, m_lo_ref, m_last_ref, x):
    """``m @ x`` where m has K = 2^p + 1 columns (the rfft bin count).

    The MXU pads contraction dims to multiples of 128, so contracting 257
    costs 384 (+50% on the FLOP-dominant constraint matmuls). Here the first
    2^p columns run as the bf16_3x matmul and the last (Nyquist-bin) column
    is an EXACT f32 rank-1 VPU update — both faster and slightly more
    accurate than padding. ``m_hi/lo`` are the (rows, K-1) split; ``m_last``
    is the (rows, 1) f32 final column; ``x`` is (K, n)."""
    body = dot_high_lhs(m_hi_ref, m_lo_ref, x[:-1])
    return body + m_last_ref[:] * x[-1:]


def dot_fast_lhs_k1(m_hi_ref, _m_lo_ref, m_last_ref, x):
    """Single-pass variant of :func:`dot_high_lhs_k1`."""
    body = dot_fast_lhs(m_hi_ref, _m_lo_ref, x[:-1])
    return body + m_last_ref[:] * x[-1:]


def dot_mat2_lhs(m_hi_ref, m_lo_ref, x):
    """2-pass MATRIX-EXACT ``m @ x``: ``m_hi@x_hi + m_lo@x_hi``.

    The constant matrix is represented to bf16^2 (~16 mantissa bits, i.e.
    effectively exact for DFT bases); the dynamic operand is rounded once to
    bf16. On-chip A/B (benchmarks/ab_perop2.py): for the stage-1 constraint
    projection this recovers the full bf16_3x quality — the 1-pass tier's
    ERLE loss is the SYSTEMATIC projection-operator bias from rounding the
    matrix (same non-causal leakage every step, accumulating in W), while
    operand rounding is per-step gradient noise the adaptive loop averages
    out. One fewer MXU pass than :func:`dot_high_lhs`."""
    x_hi = x.astype(jnp.bfloat16)
    return (
        jnp.dot(m_hi_ref[:], x_hi, preferred_element_type=jnp.float32)
        + jnp.dot(m_lo_ref[:], x_hi, preferred_element_type=jnp.float32)
    )


def dot_mat2_lhs_k1(m_hi_ref, m_lo_ref, m_last_ref, x):
    """Matrix-exact 2-pass variant of :func:`dot_high_lhs_k1`."""
    return dot_mat2_lhs(m_hi_ref, m_lo_ref, x[:-1]) + m_last_ref[:] * x[-1:]


def dot_op2_lhs(m_hi_ref, m_lo_ref, x):
    """2-pass OPERAND-EXACT ``m @ x``: ``m_hi@x_hi + m_hi@x_lo``.

    Mirror ablation of :func:`dot_mat2_lhs` (matrix rounded once to bf16,
    operand to bf16^2). Measured NOT sufficient for the constraint
    projection — kept for the ablation column in
    benchmarks/validate_precision.py."""
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (
        jnp.dot(m_hi_ref[:], x_hi, preferred_element_type=jnp.float32)
        + jnp.dot(m_hi_ref[:], x_lo, preferred_element_type=jnp.float32)
    )


def dot_op2_lhs_k1(m_hi_ref, m_lo_ref, m_last_ref, x):
    """Matrix-bf16 2-pass variant of :func:`dot_high_lhs_k1`."""
    return dot_op2_lhs(m_hi_ref, m_lo_ref, x[:-1]) + m_last_ref[:] * x[-1:]


def dot_native_lhs(m_ref, _m_lo_ref, x):
    """TRUE-fp32 ``m @ x`` via Mosaic's native precision=HIGHEST lowering.

    Round-3 finding: Mosaic DOES honor ``precision=HIGHEST`` on in-kernel
    dots (measured 1.75e-7 max rel err vs f64 — exact fp32; ``HIGH`` is
    rejected with 'Unsupported dot precision', which is why the manual
    bf16_3x split above exists). One IR op instead of three, no in-kernel
    operand splitting, and BETTER numerics than the 3x split. ``m_ref``
    must hold the f32 matrix (bl_common.stage1_consts(native=True))."""
    import jax

    return jax.lax.dot_general(
        m_ref[:], x, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def dot_native_lhs_k1(m_ref, _m_lo_ref, m_last_ref, x):
    """Native-HIGHEST variant of :func:`dot_high_lhs_k1`."""
    return dot_native_lhs(m_ref, _m_lo_ref, x[:-1]) + m_last_ref[:] * x[-1:]
