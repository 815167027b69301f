"""Complex-valued conv/norm building blocks for the DCCRN family.

Re-designs of the reference's complex layers (dccrn.py:103-383) in TPU-native
layout: activations are [B, F, T, C] (NHWC — freq/time spatial, channels
last, the layout XLA:TPU convolutions want), where the channel axis holds
[real_channels || imag_channels] exactly like the reference's channel-dim
split (dccrn.py:142).

A complex conv with kernels (Wr, Wi) applied to x = xr + i*xi is
    yr = conv(xr, Wr) - conv(xi, Wi)
    yi = conv(xr, Wi) + conv(xi, Wr)
== TWO real convolutions of the concatenated input with concatenated kernels
(we stack [xr || xi] once and build block kernels), keeping the MXU batched.
"""

from __future__ import annotations

from typing import TypedDict

import jax
import jax.numpy as jnp
import numpy as np


class ConvParams(TypedDict):
    w_r: jax.Array  # (kh, kw, Cin/2, Cout/2) HWIO
    w_i: jax.Array
    b_r: jax.Array  # (Cout/2,)
    b_i: jax.Array


def complex_conv_init(key, c_in: int, c_out: int, kernel, dtype=jnp.float32) -> ConvParams:
    """N(0, 0.05) weights, zero bias (dccrn.py:136-139); channel counts are
    the TOTAL (real+imag) like the reference's constructor."""
    kh, kw = kernel
    k1, k2 = jax.random.split(key)
    shape = (kh, kw, c_in // 2, c_out // 2)
    return ConvParams(
        w_r=0.05 * jax.random.normal(k1, shape, dtype),
        w_i=0.05 * jax.random.normal(k2, shape, dtype),
        b_r=jnp.zeros((c_out // 2,), dtype),
        b_i=jnp.zeros((c_out // 2,), dtype),
    )


def _split_ri(x: jax.Array):
    c = x.shape[-1] // 2
    return x[..., :c], x[..., c:]


def complex_conv(params: ConvParams, x: jax.Array, stride, padding) -> jax.Array:
    """x [B, F, T, 2Cc] -> [B, F', T', 2Cc_out]; padding per spatial dim."""
    xr, xi = _split_ri(x)
    dn = ("NHWC", "HWIO", "NHWC")
    conv = lambda inp, w: jax.lax.conv_general_dilated(
        inp, w, window_strides=stride, padding=padding, dimension_numbers=dn
    )
    # two fused real convs: [xr||xi] * [Wr;-Wi] and [xr||xi] * [Wi;Wr]
    x_cat = jnp.concatenate([xr, xi], axis=-1)
    w_real = jnp.concatenate([params["w_r"], -params["w_i"]], axis=2)
    w_imag = jnp.concatenate([params["w_i"], params["w_r"]], axis=2)
    yr = conv(x_cat, w_real) + params["b_r"]
    yi = conv(x_cat, w_imag) + params["b_i"]
    return jnp.concatenate([yr, yi], axis=-1)


def complex_conv_transpose(
    params: ConvParams, x: jax.Array, stride, padding, output_padding
) -> jax.Array:
    """Transposed complex conv matching torch ConvTranspose2d geometry
    (dccrn.py:156-207): out = (in-1)*stride - 2*pad + kernel + out_pad."""
    xr, xi = _split_ri(x)
    kh, kw = params["w_r"].shape[:2]
    ph, pw = padding
    oph, opw = output_padding
    sh, sw = stride
    # torch conv_transpose == lhs-dilated conv with flipped kernel and
    # padding (k - 1 - p) low / (k - 1 - p + output_padding) high.
    pad = [(kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw)]
    dn = ("NHWC", "HWIO", "NHWC")

    def tconv(inp, w):
        w_flip = jnp.flip(w, axis=(0, 1))
        return jax.lax.conv_general_dilated(
            inp,
            w_flip,
            window_strides=(1, 1),
            padding=pad,
            lhs_dilation=(sh, sw),
            dimension_numbers=dn,
        )

    x_cat = jnp.concatenate([xr, xi], axis=-1)
    w_real = jnp.concatenate([params["w_r"], -params["w_i"]], axis=2)
    w_imag = jnp.concatenate([params["w_i"], params["w_r"]], axis=2)
    yr = tconv(x_cat, w_real) + params["b_r"]
    yi = tconv(x_cat, w_imag) + params["b_i"]
    return jnp.concatenate([yr, yi], axis=-1)


def complex_cat(tensors: list[jax.Array]) -> jax.Array:
    """Concatenate keeping [reals || imags] channel order (dccrn.py:386-395)."""
    reals, imags = [], []
    for t in tensors:
        r, i = _split_ri(t)
        reals.append(r)
        imags.append(i)
    return jnp.concatenate(reals + imags, axis=-1)


class BatchNormParams(TypedDict):
    scale: jax.Array
    bias: jax.Array


class BatchNormState(TypedDict):
    mean: jax.Array
    var: jax.Array


def batch_norm_init(c: int, dtype=jnp.float32):
    return (
        BatchNormParams(scale=jnp.ones((c,), dtype), bias=jnp.zeros((c,), dtype)),
        BatchNormState(mean=jnp.zeros((c,), dtype), var=jnp.ones((c,), dtype)),
    )


def batch_norm(
    params: BatchNormParams,
    state: BatchNormState,
    x: jax.Array,
    *,
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
):
    """Plain real BatchNorm over all non-channel axes (the reference applies
    real nn.BatchNorm2d even after complex convs, dccrn.py:473). Returns
    (y, new_state); torch running-stat semantics (unbiased var in stats)."""
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        count = np.prod([x.shape[a] for a in axes])
        unbiased = var * count / max(count - 1, 1)
        new_state = BatchNormState(
            mean=(1 - momentum) * state["mean"] + momentum * mean,
            var=(1 - momentum) * state["var"] + momentum * unbiased,
        )
    else:
        mean, var, new_state = state["mean"], state["var"], state
    y = (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["bias"]
    return y, new_state


def prelu_init(dtype=jnp.float32):
    """torch nn.PReLU() default: one shared slope, init 0.25."""
    return jnp.asarray(0.25, dtype)


def prelu(alpha, x):
    return jnp.where(x >= 0, x, alpha * x)


def complex_batch_norm_init(key, c: int, dtype=jnp.float32):
    """Whitening complex BN (dccrn.py:210-267): per complex channel a 2x2
    affine W (Wrr=Wii=1, Wri ~ U(-0.9, 0.9)) + complex bias, running complex
    mean and 2x2 covariance. ``c`` is the TOTAL channel count (real+imag)."""
    cc = c // 2
    params = {
        "w_rr": jnp.ones((cc,), dtype),
        "w_ri": jax.random.uniform(key, (cc,), dtype, -0.9, 0.9),
        "w_ii": jnp.ones((cc,), dtype),
        "b_r": jnp.zeros((cc,), dtype),
        "b_i": jnp.zeros((cc,), dtype),
    }
    state = {
        "m_r": jnp.zeros((cc,), dtype),
        "m_i": jnp.zeros((cc,), dtype),
        "v_rr": jnp.ones((cc,), dtype),
        "v_ri": jnp.zeros((cc,), dtype),
        "v_ii": jnp.ones((cc,), dtype),
    }
    return params, state


def complex_batch_norm(
    params, state, x: jax.Array, *, train: bool, momentum: float = 0.1, eps: float = 1e-5
):
    """Complex whitening batch norm (dccrn.py:273-383 forward).

    Centers each complex channel, whitens by the inverse square root of the
    2x2 real covariance [[Vrr, Vri], [Vri, Vii]] (closed form), then applies
    the learned 2x2 affine + bias. x is [..., 2Cc] NHWC [reals || imags].
    Returns (y, new_state).
    """
    xr, xi = _split_ri(x)
    axes = tuple(range(x.ndim - 1))
    if train:
        m_r, m_i = jnp.mean(xr, axes), jnp.mean(xi, axes)
        xr_c, xi_c = xr - m_r, xi - m_i
        v_rr = jnp.mean(xr_c * xr_c, axes)
        v_ri = jnp.mean(xr_c * xi_c, axes)
        v_ii = jnp.mean(xi_c * xi_c, axes)
        lerp = lambda old, new: old + momentum * (new - old)
        new_state = {
            "m_r": lerp(state["m_r"], m_r),
            "m_i": lerp(state["m_i"], m_i),
            "v_rr": lerp(state["v_rr"], v_rr),
            "v_ri": lerp(state["v_ri"], v_ri),
            "v_ii": lerp(state["v_ii"], v_ii),
        }
    else:
        m_r, m_i = state["m_r"], state["m_i"]
        xr_c, xi_c = xr - m_r, xi - m_i
        v_rr, v_ri, v_ii = state["v_rr"], state["v_ri"], state["v_ii"]
        new_state = state
    v_rr, v_ii = v_rr + eps, v_ii + eps

    # inverse sqrt of the 2x2 covariance (closed form, dccrn.py:346-355)
    tau = v_rr + v_ii
    delta = v_rr * v_ii - v_ri * v_ri
    s = jnp.sqrt(delta)
    t = jnp.sqrt(tau + 2.0 * s)
    rst = 1.0 / (s * t)
    u_rr, u_ii, u_ri = (s + v_ii) * rst, (s + v_rr) * rst, -v_ri * rst

    # combined affine Z = W @ U (dccrn.py:366-371)
    z_rr = params["w_rr"] * u_rr + params["w_ri"] * u_ri
    z_ri = params["w_rr"] * u_ri + params["w_ri"] * u_ii
    z_ir = params["w_ri"] * u_rr + params["w_ii"] * u_ri
    z_ii = params["w_ri"] * u_ri + params["w_ii"] * u_ii

    yr = z_rr * xr_c + z_ri * xi_c + params["b_r"]
    yi = z_ir * xr_c + z_ii * xi_c + params["b_i"]
    return jnp.concatenate([yr, yi], axis=-1), new_state
