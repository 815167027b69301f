"""Pallas TPU kernel: FullSubNet's joint full+sub-band recurrence.

STATUS: measured DEAD END for routing — kept as the documented attempt.

models/fullsubnet.py already fuses the full-band LSTM -> embedding ->
sub-band LSTM chain into ONE ``lax.scan`` (the two stages are causally
chained per frame), and ``unroll=8`` buys the cheap XLA-side win (4.37 ->
3.32 ms per 8 s utterance at batch 1). This kernel applied the
pallas_lstm.py treatment to the JOINT step and measured **3.85 ms** on
v5e — SLOWER than the unrolled scan, so fullsubnet_masks does NOT route
here. Why it loses where pallas_lstm wins: the hoisted sub-band input is
~395 KB/frame of mandatory streaming either way (the scan amortizes it
through XLA's pipelined loop just as well), the per-frame MXU work is 6x
smaller than DCCRN's bottleneck, and the full-band stage runs at N=1
lanes in this kernel (127/128 of its issue slots wasted) where XLA fuses
it as a fat vector op. Lesson recorded: the fused-recurrence kernel wins
when per-step state round trips dominate (DCCRN: 86% of the model), not
when the scan is already input-streaming-bound.

Design (kept for reference):

- fb hidden/cell live as VMEM columns (Hfb, 1); its gate stack (4Hfb, 1)
  splits on 8-aligned SUBLANES, so it stays one fused dot;
- sb hidden/cell live as (F, Hsb) with bins in sublanes; its four gates
  are kept as SEPARATE (Hsb, Hsb) operands + separate hoisted input
  projections (lane splits at 96 are not 128-aligned — same reason
  pallas_gru.py keeps r/z/n separate);
- the fb embedding enters the sb gates as a rank-1 (F,1)x(1,Hsb)
  broadcast per gate — the re-association the fused scan already uses;
- the kernel emits the sb hidden sequence; the tiny (Hsb, 2) mask head +
  sigmoid run OUTSIDE as one big batched matmul over all frames.

Numerics: single-pass bf16 dots — the same Precision.DEFAULT tier the
scan's matmuls lower to on TPU. A ``jax.custom_vjp`` recomputes the
backward through the scan formulation for transparent training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(unroll: int, h_fb: int, h_sb: int, f_bins: int):
    def kernel(xfb_ref, xi_ref, xf_ref, xg_ref, xo_ref,
               wfb_ref, wout_ref, bout_ref,
               wsi_ref, wsf_ref, wsg_ref, wso_ref,
               ci_ref, cf_ref, cg_ref, co_ref,
               y_ref, hf, cf_s, hs, cs_s):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            for ref in (hf, cf_s, hs, cs_s):
                ref[:] = jnp.zeros_like(ref)

        for u in range(unroll):
            # full-band LSTM step (column orientation, one fused gate dot)
            gf = (
                jnp.dot(wfb_ref[:], hf[:].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                + xfb_ref[0, :, u : u + 1]
            )  # (4Hfb, 1)
            i1 = jax.nn.sigmoid(gf[:h_fb])
            f1 = jax.nn.sigmoid(gf[h_fb : 2 * h_fb])
            g1 = jnp.tanh(gf[2 * h_fb : 3 * h_fb])
            o1 = jax.nn.sigmoid(gf[3 * h_fb :])
            c_new = f1 * cf_s[:] + i1 * g1
            h_new = o1 * jnp.tanh(c_new)
            cf_s[:] = c_new
            hf[:] = h_new

            # embedding -> (F, 1) column
            emb = jax.nn.relu(
                jnp.dot(wout_ref[:], h_new.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                + bout_ref[:]
            )

            # sub-band LSTM step: four separate gate dots + rank-1 emb term
            hsb = hs[:].astype(jnp.bfloat16)
            gi = (jnp.dot(hsb, wsi_ref[:], preferred_element_type=jnp.float32)
                  + xi_ref[0, u] + emb * ci_ref[:])
            gf2 = (jnp.dot(hsb, wsf_ref[:], preferred_element_type=jnp.float32)
                   + xf_ref[0, u] + emb * cf_ref[:])
            gg = (jnp.dot(hsb, wsg_ref[:], preferred_element_type=jnp.float32)
                  + xg_ref[0, u] + emb * cg_ref[:])
            go = (jnp.dot(hsb, wso_ref[:], preferred_element_type=jnp.float32)
                  + xo_ref[0, u] + emb * co_ref[:])
            cs_new = jax.nn.sigmoid(gf2) * cs_s[:] + jax.nn.sigmoid(gi) * jnp.tanh(gg)
            hs_new = jax.nn.sigmoid(go) * jnp.tanh(cs_new)
            cs_s[:] = cs_new
            hs[:] = hs_new
            y_ref[0, u] = hs_new

    return kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "unroll", "vmem_limit_mb")
)
def _fsn_joint_fused_fwd(
    fb_p, fb_out, sb_p,
    xp_fb: jax.Array,  # (T, 4Hfb) — fb input projection incl. BOTH biases
    xp_sb: jax.Array,  # (T, F, 4Hsb) — sb neighborhood proj incl. BOTH biases
    *,
    interpret: bool = False,
    unroll: int = 8,
    vmem_limit_mb: int = 64,
) -> jax.Array:
    """Returns the sb hidden sequence (T, F, Hsb) for batch 1."""
    t_steps, four_hfb = xp_fb.shape
    h_fb = four_hfb // 4
    _, f_bins, four_hsb = xp_sb.shape
    h_sb = four_hsb // 4

    unroll = max(1, min(unroll, t_steps))
    t_pad = (-t_steps) % unroll
    t_total = t_steps + t_pad
    if t_pad:
        xp_fb = jnp.pad(xp_fb, [(0, t_pad), (0, 0)])
        xp_sb = jnp.pad(xp_sb, [(0, t_pad), (0, 0), (0, 0)])
    # fb input as (T/u, 4Hfb, u): the frame index rides lanes so the
    # per-frame column slice is a cheap lane pick
    xfb = xp_fb.astype(jnp.float32).reshape(t_total // unroll, unroll, four_hfb)
    xfb = jnp.swapaxes(xfb, 1, 2)
    # sb inputs split per gate: lane splits at Hsb=96 are not 128-aligned
    xsb = xp_sb.astype(jnp.float32).reshape(
        t_total // unroll, unroll, f_bins, four_hsb
    )
    x_i, x_f, x_g, x_o = [xsb[..., j * h_sb : (j + 1) * h_sb] for j in range(4)]

    w_col = sb_p["w_ih"][:, -1]  # (4Hsb,) — the fb-embedding column
    cols = [w_col[j * h_sb : (j + 1) * h_sb][None, :] for j in range(4)]
    wsb = [
        sb_p["w_hh"][j * h_sb : (j + 1) * h_sb].T for j in range(4)
    ]  # (Hsb, Hsb) each

    fb_step = pl.BlockSpec(
        (1, four_hfb, unroll), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
    )
    sb_step = pl.BlockSpec(
        (1, unroll, f_bins, h_sb), lambda t: (t, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    whole = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda t: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    ys = pl.pallas_call(
        _kernel(unroll, h_fb, h_sb, f_bins),
        grid=(t_total // unroll,),
        in_specs=[fb_step, sb_step, sb_step, sb_step, sb_step,
                  whole((4 * h_fb, h_fb)), whole((f_bins, h_fb)),
                  whole((f_bins, 1))]
        + [whole((h_sb, h_sb))] * 4
        + [whole((1, h_sb))] * 4,
        out_specs=sb_step,
        out_shape=jax.ShapeDtypeStruct(
            (t_total // unroll, unroll, f_bins, h_sb), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((h_fb, 1), jnp.float32),  # hf
            pltpu.VMEM((h_fb, 1), jnp.float32),  # cf
            pltpu.VMEM((f_bins, h_sb), jnp.float32),  # hs
            pltpu.VMEM((f_bins, h_sb), jnp.float32),  # cs
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024
        ),
    )(
        xfb,
        x_i, x_f, x_g, x_o,
        fb_p["w_hh"].astype(jnp.bfloat16),  # (4Hfb, Hfb)
        fb_out["w"].astype(jnp.bfloat16),  # (F, Hfb)
        fb_out["b"].astype(jnp.float32)[:, None],  # (F, 1)
        *[w.astype(jnp.bfloat16) for w in wsb],
        *[c.astype(jnp.float32) for c in cols],
    )
    return ys.reshape(t_total, f_bins, h_sb)[:t_steps]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fsn_joint_fused(params, xp_fb, xp_sb, interpret=False):
    """Fused FullSubNet joint recurrence (batch 1): hoisted projections in
    (with ALL biases folded), sb hidden sequence (T, F, Hsb) out.
    Differentiable via recompute-through-scan."""
    return _fsn_joint_fused_fwd(
        params["fb_lstm"], params["fb_out"], params["sb_lstm"],
        xp_fb, xp_sb, interpret=interpret,
    )


def _fwd(params, xp_fb, xp_sb, interpret):
    return fsn_joint_fused(params, xp_fb, xp_sb, interpret), (
        params, xp_fb, xp_sb,
    )


def _bwd(interpret, res, g):
    from aec_tpu.models import fullsubnet as fsn

    params, xp_fb, xp_sb = res
    # the kernel API is batch-squeezed; the scan core carries a batch axis
    _, vjp = jax.vjp(
        lambda p, a, b: fsn._joint_scan_hs(p, a[None], b[None])[0],
        params, xp_fb, xp_sb,
    )
    return vjp(g)


fsn_joint_fused.defvjp(_fwd, _bwd)
