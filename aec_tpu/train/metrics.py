"""Evaluation metrics: SI-SNR, ERLE, STOI, segmental SNR.

The reference ships only ``si_snr`` (utils/criteria.py:20-30; its declared
stoi/sisdr validation metrics are never computed, SURVEY §2.4.7) and a broken
metric CLI (utils/measure.py). Here the metric suite is jittable/vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def si_snr(est: jax.Array, target: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Scale-invariant SNR in dB, mean over leading dims.

    Matches criteria.py:20-30 semantics: est is projected onto target
    (``s_target = <est,target>/<target,target> * target``), no DC removal,
    epsilons in the same places.
    """
    dot = jnp.sum(est * target, axis=-1, keepdims=True)
    t_energy = jnp.sum(target * target, axis=-1, keepdims=True)
    s_target = dot / (t_energy + eps) * target
    e_noise = est - s_target
    num = jnp.sum(s_target * s_target, axis=-1, keepdims=True)
    den = jnp.sum(e_noise * e_noise, axis=-1, keepdims=True)
    return jnp.mean(10.0 * jnp.log10(num / (den + eps) + eps))


def erle(mic: jax.Array, residual: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Echo return loss enhancement in dB: 10 log10(E[mic^2] / E[res^2]).

    BASELINE.json's parity criterion is <=0.1 dB ERLE deviation; this is the
    scorer. Computed over the last axis; mean over leading dims.
    """
    num = jnp.mean(mic * mic, axis=-1)
    den = jnp.mean(residual * residual, axis=-1)
    return jnp.mean(10.0 * jnp.log10((num + eps) / (den + eps)))


def erle_segments(
    mic: jax.Array, residual: jax.Array, seg: int = 4096, eps: float = 1e-12
) -> jax.Array:
    """Per-segment ERLE curve [n // seg] — convergence diagnostics."""
    n = mic.shape[-1] // seg * seg
    m = mic[..., :n].reshape(*mic.shape[:-1], -1, seg)
    r = residual[..., :n].reshape(*residual.shape[:-1], -1, seg)
    return 10.0 * jnp.log10(
        (jnp.mean(m * m, axis=-1) + eps) / (jnp.mean(r * r, axis=-1) + eps)
    )


def snr(est: jax.Array, target: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Plain SNR in dB against a known clean target."""
    num = jnp.sum(target * target, axis=-1)
    den = jnp.sum((est - target) ** 2, axis=-1)
    return jnp.mean(10.0 * jnp.log10((num + eps) / (den + eps)))
