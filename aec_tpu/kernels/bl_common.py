"""Shared building blocks for the batch-in-lanes Pallas kernels.

Three kernels share the same per-step math (pallas_kalman's batched stage-1
block update, pallas_stage2's LittleNet frame step, and pallas_two_stage
which composes both in one grid step) and the same constant constructions.
Keeping them here guarantees the kernels stay numerically in lockstep — the
composed kernel's waveform is asserted bit-identical to the composition of
the separate ones.

Layout conventions (see pallas_kalman._kernel_batched_bl for the rationale):
bins in sublanes, (partition x utterance-tile) columns in lanes, re/im as
separate arrays, transforms as left-multiplications by constant bases, with
K=257 contractions split as 256 MXU columns + an exact f32 Nyquist rank-1
update (precision.dot_*_lhs_k1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from aec_tpu.kernels import precision as prec


def make_lsum(l: int, tile: int):
    """(K, L*tile) -> (K, tile): reduce over 128-aligned partition groups."""

    def lsum(v):
        out = v[:, :tile]
        for li in range(1, l):
            out = out + v[:, li * tile : (li + 1) * tile]
        return out

    return lsum


def make_lbcast(l: int):
    """(K, tile) -> (K, L*tile): broadcast across partition lane groups."""

    def lbcast(v):
        return jnp.concatenate([v] * l, axis=1)

    return lbcast


def stage1_dots(dot_mode: str):
    """The (dot_x, dot_y, dot_e, dot_c, dot_fb) tuple for a stage-1 tier.

    Pass counts per MXU matmul (x=far analysis, y=echo synthesis, e=residual
    analysis, c/fb=factored constraint head/tail):

    ========  ==  ==  ==  ==  ==
    mode       x   y   e   c  fb
    ========  ==  ==  ==  ==  ==
    high       3   3   3   3   3   parity oracle tier (== Precision.HIGH)
    balanced   3   3   1   2   2   production ``quality="parity"`` route
    lean       2   2   1   2   2   x/y also matrix-exact 2-pass (UNROUTED)
    mixed      3   3   1   1   1   Kalman ``quality="fast"`` route
    bf16       1   1   1   1   1
    native     fp32 via Mosaic precision=HIGHEST (~6-pass; oracle only)
    ========  ==  ==  ==  ==  ==

    "lean" is a GRADED DEAD END for the default routes (on-chip, 8-scene
    battery): single-rounding the DYNAMIC operand at the x/y sites floors
    the achievable null depth — Kalman echo_only -1.70 dB, NLMS
    deep-convergence scenes -29 to -36 dB (WORSE than mixed; the far-end
    spectrum X itself is what gets rounded, so Y = W*X_rounded can never
    cancel the mic built from true X past bf16 relative accuracy). The
    c-site finding "operand rounding is free" does NOT generalize: the
    constraint's dynamic operand is the (small) update G, not the signal.

    The balanced tier is built on two on-chip findings (ab_perop*.py,
    graded in validate_precision.py): (1) the mixed tier's -0.16 dB
    worst-case ERLE lives entirely in the constraint pair — the residual
    dot at 1-pass costs nothing; (2) within the constraint, only the
    MATRIX rounding matters (systematic projection-operator bias that
    accumulates in W), so the 2-pass matrix-exact split
    (precision.dot_mat2_lhs) recovers the full 3-pass quality at 2/3 the
    constraint cost.
    """
    if dot_mode == "native":
        return (
            prec.dot_native_lhs, prec.dot_native_lhs_k1, prec.dot_native_lhs,
            prec.dot_native_lhs_k1, prec.dot_native_lhs,
        )
    if dot_mode == "lean":
        # balanced with the x/y sites ALSO dropped to the 2-pass
        # matrix-exact split (matrix rounding is the measured loss
        # mechanism at every graded site; operand rounding costs
        # <=0.06 dB) — passes (2,2,1,2,2), ~6% below balanced's MXU floor
        # (the constraint pair dominates — benchmarks/roofline.py)
        return (
            prec.dot_mat2_lhs, prec.dot_mat2_lhs_k1, prec.dot_fast_lhs,
            prec.dot_mat2_lhs_k1, prec.dot_mat2_lhs,
        )
    if dot_mode not in ("high", "balanced", "mixed", "bf16"):
        raise ValueError(f"unknown stage-1 dot_mode {dot_mode!r}")
    high = dot_mode == "high"
    hi3 = dot_mode in ("high", "balanced", "mixed")
    bal = dot_mode == "balanced"
    return (
        prec.dot_high_lhs if hi3 else prec.dot_fast_lhs,
        prec.dot_high_lhs_k1 if hi3 else prec.dot_fast_lhs_k1,
        prec.dot_high_lhs if high else prec.dot_fast_lhs,
        prec.dot_high_lhs_k1 if high
        else (prec.dot_mat2_lhs_k1 if bal else prec.dot_fast_lhs_k1),
        prec.dot_high_lhs if high
        else (prec.dot_mat2_lhs if bal else prec.dot_fast_lhs),
    )


def _plain(c, native=False):
    if native:
        # native-HIGHEST mode keeps the matrix in f32 (Mosaic honors
        # precision=HIGHEST on in-kernel dots — measured 1.75e-7 rel, true
        # fp32); the lo slot becomes a minimal dummy so the operand count
        # and kernel signatures stay mode-independent
        return [jnp.asarray(c, jnp.float32), jnp.zeros((8, 128), jnp.float32)]
    return list(prec.split_hi_lo(c))


def _k1(c, native=False):
    """(rows, K) constant: bf16_3x split (or native f32) of the first K-1
    columns + the final (Nyquist) column as an f32 (rows, 1) vector."""
    if native:
        return [
            jnp.asarray(c[:, :-1], jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.asarray(c[:, -1:], jnp.float32),
        ]
    return [*prec.split_hi_lo(c[:, :-1]), jnp.asarray(c[:, -1:], jnp.float32)]


def stage1_consts(block: int, native: bool = False) -> list[jax.Array]:
    """The 24 stage-1 constant operands, in kernel argument order:

    FW_r/i (K, N) plain   — in-kernel far-frame analysis DFT
    IT_r/i (block, K) k1  — inverse-DFT tail (echo estimate -> time block)
    F_r/i  (K, block) plain — error block -> spectrum
    IH_r/i (block, K) k1  — factored-constraint head (rank-B projection)
    FB_r/i (K, block) plain — factored-constraint tail
    """
    from aec_tpu.linear import overlap_save as ols

    k = block + 1
    fwd, inv_tail, _ = ols._dft_mats(block)
    n2 = 2 * block
    inv_full = np.concatenate(
        [np.fft.irfft(np.eye(k), n=n2), np.fft.irfft(1j * np.eye(k), n=n2)],
        axis=0,
    ).astype(np.float32)  # (2K, N)
    fwd_head, fwd_tail = fwd[:block, :], fwd[block:, :]
    return (
        _plain(fwd[:, :k].T, native)
        + _plain(fwd[:, k:].T, native)
        + _k1(inv_tail[:k, :].T, native)
        + _k1(inv_tail[k:, :].T, native)
        + _plain(fwd_tail[:, :k].T, native)
        + _plain(fwd_tail[:, k:].T, native)
        + _k1(inv_full[:k, :block].T, native)
        + _k1(inv_full[k:, :block].T, native)
        + _plain(fwd_head[:, :k].T, native)
        + _plain(fwd_head[:, k:].T, native)
    )


def _split_traced(m):
    """Traceable bf16_3x split (params/erb arrive as jit arguments)."""
    m = jnp.asarray(m, jnp.float32)
    hi = m.astype(jnp.bfloat16)
    lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return [hi, lo]


def _k1_traced(c):
    return [*_split_traced(c[:, :-1]), jnp.asarray(c[:, -1:], jnp.float32)]


def stage2_consts(params, erb, cfg) -> list[jax.Array]:
    """The 22 stage-2 constant operands, in kernel argument order:

    A_r/i (K, win) plain — windowed analysis DFT
    S_r/i (win, K) k1    — pinv synthesis
    ERB_f (E, K), ERB_b (K, E) plain; GRU W_ih/W_hh, lin1/lin2 W plain.
    """
    from aec_tpu.dsp import stft as stft_mod

    k = cfg.n_freqs
    analysis, synthesis = stft_mod._bases(cfg)
    analysis = analysis.astype(np.float32)
    synthesis = synthesis.astype(np.float32)
    erb_f = jnp.asarray(erb, jnp.float32)
    gru = params["gru"]
    return (
        _split_traced(analysis[:, :k].T)
        + _split_traced(analysis[:, k:].T)
        + _k1_traced(synthesis[:k, :].T)
        + _k1_traced(synthesis[k:, :].T)
        + _split_traced(erb_f.T)
        + _split_traced(erb_f)
        + _split_traced(jnp.asarray(gru["w_ih"], jnp.float32))
        + _split_traced(jnp.asarray(gru["w_hh"], jnp.float32))
        + _split_traced(jnp.asarray(params["lin1"]["w"], jnp.float32))
        + _split_traced(jnp.asarray(params["lin2"]["w"], jnp.float32))
    )


def stage2_vecs(params, cfg) -> list[jax.Array]:
    """Bias column vectors + the inverse interior OLA envelope (hop, 1)."""
    from aec_tpu.dsp.windows import periodic_window

    gru = params["gru"]
    w2 = periodic_window(cfg.win_type, cfg.win_len) ** 2
    inv_env = (1.0 / (w2[: cfg.hop] + w2[cfg.hop :] + 1e-8)).astype(np.float32)
    return [
        jnp.asarray(gru["b_ih"], jnp.float32)[:, None],
        jnp.asarray(gru["b_hh"], jnp.float32)[:, None],
        jnp.asarray(params["lin1"]["b"], jnp.float32)[:, None],
        jnp.asarray(params["lin2"]["b"], jnp.float32)[:, None],
        jnp.asarray(inv_env[:, None]),
    ]


def step_index(t_inner: int, unroll: int, u: int):
    """Linear block index of unroll sub-step ``u`` on the 2-level
    (batch, t_outer, t_inner) grid both bl kernels share — the alternating
    constraint schedule keys off this."""
    return (pl.program_id(1) * t_inner + pl.program_id(2)) * unroll + u


def reproject_w(dots, consts, wr, wi):
    """Whole-filter constraint re-projection (the alternating scheme's
    projection step; see kalman_block_step's ``project`` doc). Applies the
    factored head/tail pair from the 24-tuple ``consts`` to the W refs
    in place — shared so the Kalman and NLMS kernels stay in lockstep."""
    dot_c, dot_fb = dots[3], dots[4]
    (ihr_hi, ihr_lo, ihr_last, ihi_hi, ihi_lo, ihi_last,
     fbr_hi, fbr_lo, fbi_hi, fbi_lo) = consts[14:24]
    t_blk = dot_c(ihr_hi, ihr_lo, ihr_last, wr[:]) + dot_c(
        ihi_hi, ihi_lo, ihi_last, wi[:]
    )
    wr[:] = dot_fb(fbr_hi, fbr_lo, t_blk)
    wi[:] = dot_fb(fbi_hi, fbi_lo, t_blk)


def kalman_block_step(kcfg, l, tile, dots, consts, state, far_b, d_b,
                      project=True, vpu_opt=False):
    """One batched PBFD-Kalman block update on batch-in-lanes refs.

    ``dots``  = (dot_x, dot_y, dot_e, dot_c, dot_fb) — the per-tier matmul
    fns: far-frame analysis, echo-estimate synthesis, residual analysis,
    constraint head (k1), constraint tail. The e/c/fb split exists because
    the three sites have DIFFERENT precision sensitivity (measured on chip,
    benchmarks/ab_perop*.py): the constraint pair carries the mixed tier's
    ERLE loss (systematic projection bias), the residual dot none of it.
    ``consts`` = the 24-tuple from :func:`stage1_consts` (as kernel refs);
    ``state`` = (wr, wi, p, xbr, xbi, psi, fprev) scratch refs.
    Mutates the state refs; returns the echo-cancelled block (hop, tile).
    Equations: linear/kalman.kalman_step.

    ``project``: the gradient-constraint scheduling knob (the constraint
    pair is ~80%% of the kernel's MXU work — benchmarks/roofline.py).
    Python ``True`` keeps today's exact per-update projection. A TRACED
    bool switches to the alternating scheme: the update accumulates
    UNCONSTRAINED (w += g, pure VPU) and, on steps where ``project`` is
    true, the WHOLE filter is re-projected onto the time-support-B
    manifold (same factored head/tail pair applied to W instead of G —
    exactly equivalent on projection steps because the projection is
    linear and idempotent, and W was on-manifold k steps ago). Between
    projections the circular-wraparound leakage is bounded by k raw
    updates, each decayed by the Kalman transition a<1.

    GRADED (on-chip 8-scene battery, validate_precision fused_bal_ce2/4):
    constrain_every=2 loses 0.6-1.4 dB tail ERLE on the high-ERLE scenes
    (echo_only -1.36, long_rir -0.64, bulk_delay -0.44) and measurably
    CHANGES the adaptation dynamics (speech_far +3.4 dB — a different
    algorithm, not a numerics tier), so it is NOT routed by any quality
    mode; the round-1 "constrain-every-k dead end" verdict stands under
    proper slope-era measurement. Kept as an explicit opt-in for callers
    who accept the trade.
    """
    dot_x, dot_y, dot_e, dot_c, dot_fb = dots
    (fwr_hi, fwr_lo, fwi_hi, fwi_lo,
     itr_hi, itr_lo, itr_last, iti_hi, iti_lo, iti_last,
     fr_hi, fr_lo, fi_hi, fi_lo,
     ihr_hi, ihr_lo, ihr_last, ihi_hi, ihi_lo, ihi_last,
     fbr_hi, fbr_lo, fbi_hi, fbi_lo) = consts
    wr, wi, p, xbr, xbi, psi, fprev = state
    a, a2 = kcfg.a, kcfg.a * kcfg.a
    obs, floor = kcfg.obs_smooth, kcfg.psi_floor
    lsum = make_lsum(l, tile)
    lbcast = make_lbcast(l)

    # in-kernel analysis STFT of the far frame [(t-1)B, (t+1)B)
    frame = jnp.concatenate([fprev[:], far_b], axis=0)  # (2B, tile)
    fprev[:] = far_b
    xr_t = dot_x(fwr_hi, fwr_lo, frame)  # (K, tile)
    xi_t = dot_x(fwi_hi, fwi_lo, frame)
    # ring push: newest spectra enter lane group 0
    xr = jnp.concatenate([xr_t, xbr[:, :-tile]], axis=1)
    xi = jnp.concatenate([xi_t, xbi[:, :-tile]], axis=1)
    xbr[:] = xr
    xbi[:] = xi

    # predict
    wr_p, wi_p = a * wr[:], a * wi[:]
    p_pred = (
        a2 * p[:] + (1.0 - a2) * (wr[:] * wr[:] + wi[:] * wi[:])
        + kcfg.q_min
    )

    # prior residual
    yr = lsum(wr_p * xr - wi_p * xi)  # (K, tile)
    yi = lsum(wr_p * xi + wi_p * xr)
    y_blk = dot_y(itr_hi, itr_lo, itr_last, yr) + dot_y(
        iti_hi, iti_lo, iti_last, yi
    )
    e_blk = d_b - y_blk  # (block, tile)
    er = dot_e(fr_hi, fr_lo, e_blk)  # (K, tile)
    ei = dot_e(fi_hi, fi_lo, e_blk)

    psi_new = jnp.maximum(obs * psi[:] + (1.0 - obs) * (er * er + ei * ei), floor)
    psi[:] = psi_new

    # gain + constrained update (factored rank-B projection)
    x2 = xr * xr + xi * xi  # (K, L*tile)
    if vpu_opt:
        # round-4 VPU lever (verdict item 5 — docs/ROOFLINE.md names the
        # elementwise state chain as the last un-graded gap term): (a) the
        # (K, L*tile) product x2*p_pred is computed ONCE and reused by the
        # P update (identical numerics — same product); (b) the three
        # per-step divides (two (K,tile), one full-grid) collapse to ONE
        # (K,tile) reciprocal + multiplies. (b) adds one rounding per use
        # (x * (1/den) vs x / den) on a smoothed, well-conditioned power —
        # graded on the 8-scene battery before routing.
        px = x2 * p_pred  # (K, L*tile), reused below
        den = lsum(px) + 2.0 * psi_new  # (K, tile)
        inv_den = 1.0 / den
        er_d, ei_d = lbcast(er * inv_den), lbcast(ei * inv_den)
    else:
        den = lsum(x2 * p_pred) + 2.0 * psi_new  # (K, tile)
        er_d, ei_d = lbcast(er / den), lbcast(ei / den)
    gr = p_pred * (xr * er_d + xi * ei_d)  # (K, L*tile)
    gi = p_pred * (xr * ei_d - xi * er_d)
    if project is True:  # static: the exact per-update projection
        t_blk = dot_c(ihr_hi, ihr_lo, ihr_last, gr) + dot_c(
            ihi_hi, ihi_lo, ihi_last, gi
        )
        wr[:] = wr_p + dot_fb(fbr_hi, fbr_lo, t_blk)
        wi[:] = wi_p + dot_fb(fbi_hi, fbi_lo, t_blk)
    else:  # alternating: raw accumulate, re-project W on schedule
        wr[:] = wr_p + gr
        wi[:] = wi_p + gi

        @pl.when(project)
        def _reproject():
            reproject_w(dots, consts, wr, wi)

    if vpu_opt:
        p[:] = jnp.maximum(p_pred * (1.0 - px * lbcast(inv_den)), floor)
    else:
        p[:] = jnp.maximum(p_pred * (1.0 - p_pred * x2 / lbcast(den)), floor)
    return e_blk


def nlms_block_step(cfg, l, tile, dots, consts, state, far_b, d_b,
                    project=True):
    """One batched NLMS (MDF) block update on batch-in-lanes refs.

    Exact sibling of :func:`kalman_block_step` — same ``dots``/``consts``
    contracts, same state ordering with the Kalman covariance slot holding
    the (K, tile) smoothed far-end power instead:
    ``state`` = (wr, wi, power, xbr, xbi, psi, fprev) scratch refs.
    Mutates the state refs; returns the echo-cancelled block (hop, tile).
    Equations: linear/nlms.nlms_step (incl. the round-3 robustness
    denominator — relative regularization + error-power step control).

    ``project`` as in kalman_block_step: static ``True`` = exact per-update
    constraint; a traced bool = raw accumulate + scheduled whole-filter
    re-projection (NLMS has no transition decay, but each projection
    removes ALL accumulated wraparound, so leakage is bounded by the
    inter-projection update count).
    """
    dot_x, dot_y, dot_e, dot_c, dot_fb = dots
    ps, mu, eps = cfg.power_smooth, cfg.mu, cfg.eps
    es, eps_rel, beta = cfg.err_smooth, cfg.eps_rel, cfg.beta
    (fwr_hi, fwr_lo, fwi_hi, fwi_lo,
     itr_hi, itr_lo, itr_last, iti_hi, iti_lo, iti_last,
     fr_hi, fr_lo, fi_hi, fi_lo,
     ihr_hi, ihr_lo, ihr_last, ihi_hi, ihi_lo, ihi_last,
     fbr_hi, fbr_lo, fbi_hi, fbi_lo) = consts
    wr, wi, power, xbr, xbi, psi, fprev = state
    lsum = make_lsum(l, tile)
    lbcast = make_lbcast(l)

    # in-kernel far-frame analysis STFT [(t-1)B, (t+1)B)
    frame = jnp.concatenate([fprev[:], far_b], axis=0)  # (2B, tile)
    fprev[:] = far_b
    xr_t = dot_x(fwr_hi, fwr_lo, frame)  # (K, tile)
    xi_t = dot_x(fwi_hi, fwi_lo, frame)
    xr = jnp.concatenate([xr_t, xbr[:, :-tile]], axis=1)
    xi = jnp.concatenate([xi_t, xbi[:, :-tile]], axis=1)
    xbr[:] = xr
    xbi[:] = xi

    # smoothed total far-end power (nlms.py:66-67)
    inst = lsum(xr * xr + xi * xi)  # (K, tile)
    p_new = ps * power[:] + (1.0 - ps) * inst
    power[:] = p_new

    # prior output y = sum_l W X; time block via MXU
    yr = lsum(wr[:] * xr - wi[:] * xi)  # (K, tile)
    yi = lsum(wr[:] * xi + wi[:] * xr)
    y_blk = dot_y(itr_hi, itr_lo, itr_last, yr) + dot_y(
        iti_hi, iti_lo, iti_last, yi
    )
    e_blk = d_b - y_blk  # (block, tile)
    er = dot_e(fr_hi, fr_lo, e_blk)  # (K, tile)
    ei = dot_e(fi_hi, fi_lo, e_blk)
    psi_new = es * psi[:] + (1.0 - es) * (er * er + ei * ei)
    psi[:] = psi_new

    # conj(X) E / den, robustness terms incl. the broadband mean
    # (over bins = over sublanes here), constrained (factored)
    inv_p = 1.0 / (
        p_new + eps
        + eps_rel * jnp.mean(p_new, axis=0, keepdims=True)
        + beta * psi_new
    )
    er_p, ei_p = lbcast(er * inv_p), lbcast(ei * inv_p)
    gr = xr * er_p + xi * ei_p  # (K, L*tile)
    gi = xr * ei_p - xi * er_p
    if project is True:  # static: exact per-update projection
        t_blk = dot_c(ihr_hi, ihr_lo, ihr_last, gr) + dot_c(
            ihi_hi, ihi_lo, ihi_last, gi
        )
        wr[:] = wr[:] + mu * dot_fb(fbr_hi, fbr_lo, t_blk)
        wi[:] = wi[:] + mu * dot_fb(fbi_hi, fbi_lo, t_blk)
    else:  # alternating: raw accumulate, re-project W on schedule
        wr[:] = wr[:] + mu * gr
        wi[:] = wi[:] + mu * gi

        @pl.when(project)
        def _reproject():
            reproject_w(dots, consts, wr, wi)

    return e_blk


def stage2_frame_step(e_bands, hop, dots, consts, vecs, state, lin_b, far_b,
                      offsets=None, gain_norm=False):
    """One LittleNet frame step on batch-in-lanes refs.

    ``dots`` = (dot2, dot2_k1); ``consts`` = the 24-tuple from
    :func:`stage2_consts`; ``vecs`` = (bih, bhh, b1, b2, inv_env) refs;
    ``state`` = (h, tail, prev_lin, prev_far) scratch refs. Mutates the
    state; returns (out_block, mask) where out_block completes output
    block t-1 (OLA). Equations: models/little_net & pipeline/streaming.

    ``offsets``: optional (off_lin, off_far) rows (1, tile) subtracted
    from the whole analysis frame — the causal running pseudo-norm scalar
    (pipeline/streaming normalize=True). The prev rings keep the RAW
    blocks so the next step can subtract its own, newer scalar.

    ``gain_norm``: the scale-sane ERB synthesis (see little_net_apply —
    the reference's un-normalized back-projection at ERB.py:306-310 makes
    the waveform scale ill-defined). One extra back-projection dot of the
    UNMASKED magnitudes + a divide turns the gain into a per-bin convex
    combination of the sigmoid mask; required by the preservation-trained
    dtalk checkpoint's deployed semantics (round 4).
    """
    dot2, dot2_k1 = dots
    (ar_hi, ar_lo, ai_hi, ai_lo,
     s2r_hi, s2r_lo, s2r_last, s2i_hi, s2i_lo, s2i_last,
     ef_hi, ef_lo, eb_hi, eb_lo,
     wih_hi, wih_lo, whh_hi, whh_lo,
     w1_hi, w1_lo, w2_hi, w2_lo) = consts
    bih, bhh, b1, b2, inv_env = vecs
    h, tail, prev_lin, prev_far = state
    h_dim = e_bands

    lin_frame = jnp.concatenate([prev_lin[:], lin_b], axis=0)  # (win, tile)
    far_frame = jnp.concatenate([prev_far[:], far_b], axis=0)
    prev_lin[:] = lin_b
    prev_far[:] = far_b
    if offsets is not None:
        lin_frame = lin_frame - offsets[0]
        far_frame = far_frame - offsets[1]

    # windowed analysis DFT (window folded into the bases)
    sr = dot2(ar_hi, ar_lo, lin_frame)  # (K, tile)
    si = dot2(ai_hi, ai_lo, lin_frame)
    fr = dot2(ar_hi, ar_lo, far_frame)
    fi = dot2(ai_hi, ai_lo, far_frame)
    mag = jnp.sqrt(sr * sr + si * si + 1e-9)
    fmag = jnp.sqrt(fr * fr + fi * fi + 1e-9)

    # ERB features + GRU step + mask head (ERB.py:282-301 semantics)
    me = dot2(ef_hi, ef_lo, mag)  # (E, tile)
    fe = dot2(ef_hi, ef_lo, fmag)
    feats = jnp.concatenate([me, jnp.abs(me - fe)], axis=0)  # (2E, tile)
    xp = dot2(wih_hi, wih_lo, feats) + bih[:]  # (3H, tile)
    hp = dot2(whh_hi, whh_lo, h[:]) + bhh[:]
    r = jax.nn.sigmoid(xp[:h_dim] + hp[:h_dim])
    z = jax.nn.sigmoid(xp[h_dim : 2 * h_dim] + hp[h_dim : 2 * h_dim])
    n_ = jnp.tanh(xp[2 * h_dim :] + r * hp[2 * h_dim :])
    h_new = (1.0 - z) * n_ + z * h[:]
    h[:] = h_new
    hid = jnp.concatenate([h_new, me], axis=0)  # (2E, tile)
    l1 = jax.nn.relu(dot2(w1_hi, w1_lo, hid) + b1[:])  # (E, tile)
    mask = jax.nn.sigmoid(dot2(w2_hi, w2_lo, l1) + b2[:])

    # ERB back-projection applied to re & im (ERB.py:304-310);
    # gain_norm divides by the unmasked back-projection (little_net_apply)
    gain = dot2(eb_hi, eb_lo, mask * me)  # (K, tile)
    if gain_norm:
        gain = gain / (dot2(eb_hi, eb_lo, me) + 1e-9)
    syn = dot2_k1(s2r_hi, s2r_lo, s2r_last, gain * sr) + dot2_k1(
        s2i_hi, s2i_lo, s2i_last, gain * si
    )  # (win, tile)
    out_block = (tail[:] + syn[:hop]) * inv_env[:] + 1e-9
    tail[:] = syn[hop:]
    return out_block, mask
