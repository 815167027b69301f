"""Pallas TPU kernel: the ENTIRE two-stage AEC pipeline in one kernel.

Composition of the two batch-in-lanes kernels (pallas_kalman._kernel_batched_bl
and pallas_stage2._kernel) into a single ``pallas_call``: each grid step
consumes one 16 ms hop of far/mic per utterance and

1. advances the partitioned-block Kalman filter (state VMEM-resident,
   far-frame STFT in-kernel, factored constraint, Nyquist rank-1 splits),
   producing the echo-cancelled block;
2. feeds that block STRAIGHT INTO the LittleNet stage-2 recurrence — the
   windowed analysis DFTs, ERB features, GRU step, mask head,
   back-projection and pinv OLA synthesis — without the linear waveform
   ever existing in HBM;
3. emits the enhanced block (and the stage-1 block + mask, preserving the
   ``two_stage_cancel`` contract).

Timing alignment: the stage-2 analysis frame t is [lin_{t-1} || lin_t], so
the grid runs T+1 steps; step T feeds the zero flush block (stage-1 is
skipped there via ``pl.when``), and output block t-1 completes at step t
exactly as in pallas_stage2.py.

Precision policy per ``dot_mode`` (matches the separate production kernels):
"mixed" (default) = stage-1 y/analysis transforms bf16_3x + everything else
single-pass bf16 (stage-2's Precision.DEFAULT tier); "high" = all bf16_3x
(interpret-mode parity tests; exceeds the scoped-VMEM budget on chip).

Only the ``normalize=False`` two-stage path can run here: the reference's
pseudo-norm on the stage-2 input would need the stage-1 output's global
mean/std BEFORE the kernel runs.

MEASURED (v5e, batch 256 x 8.2 s, 4-unit slope, same process): 16.37 ms vs
16.25 ms for the two-kernel composition — a DEAD HEAT, with bit-identical
output waveforms (same per-column op structure). The ~0.7 ms HBM round trip
saved on the linear waveform is repaid by stage-2 running at the combined
kernel's tile=128 (stage-1's VMEM state caps the tile) instead of its own
256. ``two_stage_cancel`` therefore keeps the two-kernel composition;
this kernel remains the single-dispatch option (one kernel launch per
batch, useful where dispatch latency dominates, e.g. small-batch
low-latency serving).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aec_tpu.configs import KalmanConfig
from aec_tpu.dsp import stft as stft_mod
from aec_tpu.dsp.stft import StftConfig
from aec_tpu.dsp.windows import periodic_window
from aec_tpu.kernels import precision as prec
from aec_tpu.linear import overlap_save as ols


def _kernel(
    kcfg: KalmanConfig, scfg: StftConfig, e_bands: int, tile: int, l: int,
    t_blocks: int, dot_mode: str,
):
    a, a2 = kcfg.a, kcfg.a * kcfg.a
    obs, floor = kcfg.obs_smooth, kcfg.psi_floor
    k = scfg.n_freqs
    hop = scfg.hop
    h_dim = e_bands
    high = dot_mode == "high"
    # stage-1 tiers (see pallas_kalman)
    dot_x = prec.dot_high_lhs  # analysis: always 3-pass (_SPECTRA_DEFAULT)
    dot_y = prec.dot_high_lhs_k1  # cancellation-critical: always 3-pass
    dot_r = prec.dot_high_lhs if high else prec.dot_fast_lhs
    dot_c = prec.dot_high_lhs_k1 if high else prec.dot_fast_lhs_k1
    # stage-2 tiers (see pallas_stage2)
    dot2 = prec.dot_high_lhs if high else prec.dot_fast_lhs
    dot2_k1 = prec.dot_high_lhs_k1 if high else prec.dot_fast_lhs_k1

    def lsum(v):
        out = v[:, :tile]
        for li in range(1, l):
            out = out + v[:, li * tile : (li + 1) * tile]
        return out

    def lbcast(v):
        return jnp.concatenate([v] * l, axis=1)

    def kernel(far_ref, d_ref,
               # stage-1 constants
               fwr_hi, fwr_lo, fwi_hi, fwi_lo,
               itr_hi, itr_lo, itr_last, iti_hi, iti_lo, iti_last,
               fr_hi, fr_lo, fi_hi, fi_lo,
               ihr_hi, ihr_lo, ihr_last, ihi_hi, ihi_lo, ihi_last,
               fbr_hi, fbr_lo, fbi_hi, fbi_lo,
               # stage-2 constants
               ar_hi, ar_lo, ai_hi, ai_lo,
               s2r_hi, s2r_lo, s2r_last, s2i_hi, s2i_lo, s2i_last,
               ef_hi, ef_lo, eb_hi, eb_lo,
               wih_hi, wih_lo, whh_hi, whh_lo,
               w1_hi, w1_lo, w2_hi, w2_lo,
               bih, bhh, b1, b2, inv_env,
               # outputs
               out_ref, lin_ref, mask_ref,
               # stage-1 state
               wr, wi, p, xbr, xbi, psi, fprev,
               # stage-2 state (+ the in-VMEM lin handoff block)
               h, tail, prev_lin, prev_far, lin_sc):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            wr[:] = jnp.zeros_like(wr)
            wi[:] = jnp.zeros_like(wi)
            p[:] = jnp.full_like(p, kcfg.init_p)
            xbr[:] = jnp.zeros_like(xbr)
            xbi[:] = jnp.zeros_like(xbi)
            psi[:] = jnp.full_like(psi, floor)
            fprev[:] = jnp.zeros_like(fprev)
            h[:] = jnp.zeros_like(h)
            tail[:] = jnp.zeros_like(tail)
            prev_lin[:] = jnp.zeros_like(prev_lin)
            prev_far[:] = jnp.zeros_like(prev_far)

        far_b = far_ref[0, 0]  # (hop, tile); zeros at the t == T flush step

        # ---- stage 1: one Kalman block update (skipped on the flush step)
        @pl.when(t < t_blocks)
        def _stage1():
            frame = jnp.concatenate([fprev[:], far_b], axis=0)  # (2B, tile)
            fprev[:] = far_b
            xr_t = dot_x(fwr_hi, fwr_lo, frame)  # (K, tile)
            xi_t = dot_x(fwi_hi, fwi_lo, frame)
            xr = jnp.concatenate([xr_t, xbr[:, :-tile]], axis=1)
            xi = jnp.concatenate([xi_t, xbi[:, :-tile]], axis=1)
            xbr[:] = xr
            xbi[:] = xi

            wr_p, wi_p = a * wr[:], a * wi[:]
            p_pred = a2 * p[:] + (1.0 - a2) * (wr[:] * wr[:] + wi[:] * wi[:])

            yr = lsum(wr_p * xr - wi_p * xi)
            yi = lsum(wr_p * xi + wi_p * xr)
            y_blk = dot_y(itr_hi, itr_lo, itr_last, yr) + dot_y(
                iti_hi, iti_lo, iti_last, yi
            )
            e_blk = d_ref[0, 0] - y_blk  # (hop, tile)
            lin_sc[:] = e_blk
            lin_ref[0, 0] = e_blk
            er = dot_r(fr_hi, fr_lo, e_blk)
            ei = dot_r(fi_hi, fi_lo, e_blk)

            psi_new = jnp.maximum(
                obs * psi[:] + (1.0 - obs) * (er * er + ei * ei), floor
            )
            psi[:] = psi_new

            x2 = xr * xr + xi * xi
            den = lsum(x2 * p_pred) + 2.0 * psi_new
            er_d, ei_d = lbcast(er / den), lbcast(ei / den)
            gr = p_pred * (xr * er_d + xi * ei_d)
            gi = p_pred * (xr * ei_d - xi * er_d)
            t_blk = dot_c(ihr_hi, ihr_lo, ihr_last, gr) + dot_c(
                ihi_hi, ihi_lo, ihi_last, gi
            )
            wr[:] = wr_p + dot_r(fbr_hi, fbr_lo, t_blk)
            wi[:] = wi_p + dot_r(fbi_hi, fbi_lo, t_blk)
            p[:] = jnp.maximum(p_pred * (1.0 - p_pred * x2 / lbcast(den)), floor)

        @pl.when(t == t_blocks)
        def _flush_zero():
            lin_sc[:] = jnp.zeros_like(lin_sc)

        # ---- stage 2: LittleNet frame step on the in-VMEM stage-1 block
        lin_b = lin_sc[:]
        lin_frame = jnp.concatenate([prev_lin[:], lin_b], axis=0)  # (win, tile)
        far_frame = jnp.concatenate([prev_far[:], far_b], axis=0)
        prev_lin[:] = lin_b
        prev_far[:] = far_b

        sr = dot2(ar_hi, ar_lo, lin_frame)  # (K, tile)
        si = dot2(ai_hi, ai_lo, lin_frame)
        fr2 = dot2(ar_hi, ar_lo, far_frame)
        fi2 = dot2(ai_hi, ai_lo, far_frame)
        mag = jnp.sqrt(sr * sr + si * si + 1e-9)
        fmag = jnp.sqrt(fr2 * fr2 + fi2 * fi2 + 1e-9)

        me = dot2(ef_hi, ef_lo, mag)  # (E, tile)
        fe = dot2(ef_hi, ef_lo, fmag)
        feats = jnp.concatenate([me, jnp.abs(me - fe)], axis=0)
        xp = dot2(wih_hi, wih_lo, feats) + bih[:]
        hp = dot2(whh_hi, whh_lo, h[:]) + bhh[:]
        r = jax.nn.sigmoid(xp[:h_dim] + hp[:h_dim])
        z = jax.nn.sigmoid(xp[h_dim : 2 * h_dim] + hp[h_dim : 2 * h_dim])
        n_ = jnp.tanh(xp[2 * h_dim :] + r * hp[2 * h_dim :])
        h_new = (1.0 - z) * n_ + z * h[:]
        h[:] = h_new
        hid = jnp.concatenate([h_new, me], axis=0)
        l1 = jax.nn.relu(dot2(w1_hi, w1_lo, hid) + b1[:])
        mask = jax.nn.sigmoid(dot2(w2_hi, w2_lo, l1) + b2[:])
        mask_ref[0, 0] = mask

        gain = dot2(eb_hi, eb_lo, mask * me)  # (K, tile)
        syn = dot2_k1(s2r_hi, s2r_lo, s2r_last, gain * sr) + dot2_k1(
            s2i_hi, s2i_lo, s2i_last, gain * si
        )  # (win, tile)
        out_ref[0, 0] = (tail[:] + syn[:hop]) * inv_env[:] + 1e-9
        tail[:] = syn[hop:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kcfg", "scfg", "interpret", "tile", "dot_mode"),
)
def two_stage_fused(
    params,
    far: jax.Array,  # (BATCH, n), n % hop == 0
    mic: jax.Array,
    erb: jax.Array,  # (K, E)
    *,
    kcfg: KalmanConfig = KalmanConfig(),
    scfg: StftConfig = StftConfig(),
    interpret: bool = False,
    tile: int = 128,
    dot_mode: str = "mixed",
) -> dict[str, jax.Array]:
    """Full two-stage AEC, one kernel: wavs in -> {wav, linear_wav, mask}."""
    batch, n = far.shape
    assert n % scfg.hop == 0, "fused two-stage needs hop-multiple lengths"
    hop = scfg.hop
    block = hop
    k = scfg.n_freqs
    e_bands = erb.shape[-1]
    l = kcfg.n_blocks
    t_blocks = n // hop

    tile = min(tile, batch)
    b_pad = (-batch) % tile
    # one trailing zero block: the stage-2 stft right pad / flush frame
    farb = jnp.pad(
        far.astype(jnp.float32).reshape(batch, t_blocks, hop),
        [(0, b_pad), (0, 1), (0, 0)],
    )
    micb = jnp.pad(
        mic.astype(jnp.float32).reshape(batch, t_blocks, hop),
        [(0, b_pad), (0, 1), (0, 0)],
    )
    bt = (batch + b_pad) // tile
    t_total = t_blocks + 1

    def tm(a):  # (B', T, hop) -> (bt, T, hop, tile)
        a = a.reshape(bt, tile, t_total, hop)
        return jnp.transpose(a, (0, 2, 3, 1))

    # stage-1 constants (pallas_kalman layout)
    fwd, inv_tail, _ = ols._dft_mats(block)
    n2 = 2 * block
    inv_full = np.concatenate(
        [np.fft.irfft(np.eye(k), n=n2), np.fft.irfft(1j * np.eye(k), n=n2)],
        axis=0,
    ).astype(np.float32)
    fwd_head, fwd_tail = fwd[:block, :], fwd[block:, :]

    def plain_np(c):
        return list(prec.split_hi_lo(c))

    def k1_np(c):
        return [*prec.split_hi_lo(c[:, :-1]), jnp.asarray(c[:, -1:], jnp.float32)]

    s1_consts = (
        plain_np(fwd[:, :k].T)
        + plain_np(fwd[:, k:].T)
        + k1_np(inv_tail[:k, :].T)
        + k1_np(inv_tail[k:, :].T)
        + plain_np(fwd_tail[:, :k].T)
        + plain_np(fwd_tail[:, k:].T)
        + k1_np(inv_full[:k, :block].T)
        + k1_np(inv_full[k:, :block].T)
        + plain_np(fwd_head[:, :k].T)
        + plain_np(fwd_head[:, k:].T)
    )

    # stage-2 constants (pallas_stage2 layout; params/erb are traced)
    analysis, synthesis = stft_mod._bases(scfg)
    analysis = analysis.astype(np.float32)
    synthesis = synthesis.astype(np.float32)

    def split(m):
        m = jnp.asarray(m, jnp.float32)
        hi = m.astype(jnp.bfloat16)
        lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return [hi, lo]

    def k1_t(c):
        return [*split(c[:, :-1]), jnp.asarray(c[:, -1:], jnp.float32)]

    erb_f = jnp.asarray(erb, jnp.float32)
    gru = params["gru"]
    s2_consts = (
        split(analysis[:, :k].T)
        + split(analysis[:, k:].T)
        + k1_t(synthesis[:k, :].T)
        + k1_t(synthesis[k:, :].T)
        + split(erb_f.T)
        + split(erb_f)
        + split(jnp.asarray(gru["w_ih"], jnp.float32))
        + split(jnp.asarray(gru["w_hh"], jnp.float32))
        + split(jnp.asarray(params["lin1"]["w"], jnp.float32))
        + split(jnp.asarray(params["lin2"]["w"], jnp.float32))
    )
    w2 = periodic_window(scfg.win_type, scfg.win_len) ** 2
    inv_env = (1.0 / (w2[:hop] + w2[hop:] + 1e-8)).astype(np.float32)
    vecs = [
        jnp.asarray(gru["b_ih"], jnp.float32)[:, None],
        jnp.asarray(gru["b_hh"], jnp.float32)[:, None],
        jnp.asarray(params["lin1"]["b"], jnp.float32)[:, None],
        jnp.asarray(params["lin2"]["b"], jnp.float32)[:, None],
        jnp.asarray(inv_env[:, None]),
    ]

    step = pl.BlockSpec(
        (1, 1, hop, tile), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, 1, hop, tile),
        lambda b, t: (b, jnp.maximum(t - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    lin_spec = pl.BlockSpec(
        (1, 1, hop, tile),
        lambda b, t: (b, jnp.minimum(t, t_blocks - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    mask_spec = pl.BlockSpec(
        (1, 1, e_bands, tile), lambda b, t: (b, t, 0, 0),
        memory_space=pltpu.VMEM,
    )
    whole = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda b, t: (0, 0), memory_space=pltpu.VMEM
    )

    out, lin, mask = pl.pallas_call(
        _kernel(kcfg, scfg, e_bands, tile, l, t_blocks, dot_mode),
        grid=(bt, t_total),
        in_specs=[step, step]
        + [whole(*c.shape) for c in s1_consts]
        + [whole(*c.shape) for c in s2_consts]
        + [whole(*v.shape) for v in vecs],
        out_specs=[out_spec, lin_spec, mask_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bt, t_blocks, hop, tile), jnp.float32),
            jax.ShapeDtypeStruct((bt, t_blocks, hop, tile), jnp.float32),
            jax.ShapeDtypeStruct((bt, t_total, e_bands, tile), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, l * tile), jnp.float32),  # wr
            pltpu.VMEM((k, l * tile), jnp.float32),  # wi
            pltpu.VMEM((k, l * tile), jnp.float32),  # p
            pltpu.VMEM((k, l * tile), jnp.float32),  # xbr
            pltpu.VMEM((k, l * tile), jnp.float32),  # xbi
            pltpu.VMEM((k, tile), jnp.float32),  # psi
            pltpu.VMEM((hop, tile), jnp.float32),  # fprev (stage-1 far ring)
            pltpu.VMEM((e_bands, tile), jnp.float32),  # gru h
            pltpu.VMEM((hop, tile), jnp.float32),  # OLA tail
            pltpu.VMEM((hop, tile), jnp.float32),  # prev lin block
            pltpu.VMEM((hop, tile), jnp.float32),  # prev far block
            pltpu.VMEM((hop, tile), jnp.float32),  # lin handoff
        ],
        interpret=interpret,
    )(
        tm(farb),
        tm(micb),
        *s1_consts,
        *s2_consts,
        *vecs,
    )

    def back(a, rows):  # (bt, T', rows, tile) -> (BATCH, T' * rows)
        a = jnp.transpose(a, (0, 3, 1, 2)).reshape(bt * tile, -1, rows)
        return a[:batch]

    wav = back(out, hop).reshape(batch, -1)[:, :n]
    lin_wav = back(lin, hop).reshape(batch, -1)[:, :n]
    mask = back(mask, e_bands)
    return {"wav": wav, "linear_wav": lin_wav, "mask": mask}
