"""Fused additive attention gate (inference path).

The XLA lowering of the gate (reference op: advanced_models.py:7-40)
materializes the f_int hidden map between the 1×1 convs and re-reads
``x`` for the final multiply — at 512²/bs128 the four gates cost ~11 ms,
nearly all HBM traffic (the matmuls are thin-N and cheap). One Pallas
pass computes

    out = x · σ( relu(g·Ag + x·Ax + b_h) · a_psi + b_psi )

reading g and x once and writing only ``out`` — the traffic floor. The
three inference BatchNorms are affine and folded into (Ag, Ax, b_h,
a_psi, b_psi) by the caller (segtpu/models/attention.py), exactly like
the head-fusion weight-space rewrite (segtpu/models/unet.py).

Layout trick (the measured make-or-break): TPU HBM⇄VMEM copies move
(sublane, 128-lane) tiles, so a (M, C) operand with C < 128 pays a
128/C read amplification at the custom-call boundary (measured 3.4×
traffic, 2.5× slower than XLA at the C=32/64 level-1 shape). Instead we
pack P = 128/min(C) adjacent pixels into the lane dim — a pure bitcast
(M, C) → (M/P, P·C) — and apply BLOCK-DIAGONAL weights diag_P(Ag):
P× more MACs at perfect (K=N=128·k) MXU shapes, which is free because
the op is memory-bound. The per-pixel ψ scalars come out as a (rows, P)
matrix and are expanded back over channels by a kron(I_P, 1_Cx) matmul.

All operands are plain VMEM blocks (no manual DMA, no
program_id-dependent iota) — the Pallas class that compiles cleanly
through this rig's remote Mosaic (see CLAUDE.md).

MEASURED NEGATIVE RESULT (v5e, PERF.md round 3): with operands already
packed the kernel runs 4.1 ms at the level-1 flagship shape vs ~10 ms
for the XLA composition — but in-model the (B,H,W,C<128) → packed
relayouts XLA must insert at the custom-call boundary cost ~8-10 ms
EACH (measured standalone), for an e2e regression 64.3 → 92.4 ms at
512²/bs128. Default off (``UNetWithBackbone.fuse_gate=False``); the
kernel and its parity tests are kept as the evidence base. The general
lesson joins round 2's: on TPU a Pallas fusion must win by more than
the layout conversions its boundary forces, and thin-channel NHWC
boundaries cost ~an entire extra pass over the data.
"""

from __future__ import annotations

from contextlib import nullcontext

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _gate_kernel(g_ref, x_ref, ag_ref, ax_ref, bh_ref, ap_ref, bp_ref,
                 e_ref, o_ref):
    h = jnp.dot(g_ref[...], ag_ref[...],
                preferred_element_type=jnp.float32)
    h = h + jnp.dot(x_ref[...], ax_ref[...],
                    preferred_element_type=jnp.float32)
    h = jnp.maximum(h + bh_ref[...].astype(jnp.float32), 0.0)
    p = jnp.dot(h.astype(ap_ref.dtype), ap_ref[...],
                preferred_element_type=jnp.float32)     # (rows, P)
    alpha = jax.nn.sigmoid(p + bp_ref[...].astype(jnp.float32))
    aexp = jnp.dot(alpha.astype(e_ref.dtype), e_ref[...],
                   preferred_element_type=jnp.float32)  # (rows, P·Cx)
    o_ref[...] = (x_ref[...].astype(jnp.float32) * aexp).astype(o_ref.dtype)


def _pick_block_rows(m: int) -> int:
    for b in (1024, 512, 256, 128, 64, 32, 16, 8):
        if m % b == 0:
            return b
    return 0


def attention_gate_fused(g: jnp.ndarray, x: jnp.ndarray,
                         ag: jnp.ndarray, ax: jnp.ndarray,
                         bh: jnp.ndarray, apsi: jnp.ndarray,
                         bpsi: jnp.ndarray) -> jnp.ndarray:
    """x · σ(relu(g·Ag + x·Ax + bh)·apsi + bpsi), one fused pass.

    g (B,H,W,Cg), x (B,H,W,Cx); ag (Cg,F), ax (Cx,F), bh (F,),
    apsi (F,), bpsi scalar. Returns (B,H,W,Cx) in x.dtype.
    Falls back to the plain jnp composition when B·H·W has no
    suitable row-block divisor (never at model shapes).
    """
    b_, h_, w_, cg = g.shape
    cx = x.shape[-1]
    f = ag.shape[-1]
    m = b_ * h_ * w_

    p_ = max(1, 128 // min(cg, cx))
    while p_ > 1 and m % p_:
        p_ //= 2
    rows = m // p_
    block = _pick_block_rows(rows)
    if block == 0:
        hh = jnp.maximum(g.astype(jnp.float32) @ ag.astype(jnp.float32)
                         + x.astype(jnp.float32) @ ax.astype(jnp.float32)
                         + bh.astype(jnp.float32), 0.0)
        pp = hh @ apsi.astype(jnp.float32)[:, None] + bpsi.astype(jnp.float32)
        return (x.astype(jnp.float32) * jax.nn.sigmoid(pp)).astype(x.dtype)

    # bitcast packs of P adjacent pixels into the lane dim
    g2 = g.reshape(rows, p_ * cg)
    x2 = x.reshape(rows, p_ * cx)
    eye = jnp.eye(p_, dtype=ag.dtype)
    big_ag = jnp.einsum("cf,ij->icjf", ag, eye).reshape(p_ * cg, p_ * f)
    big_ax = jnp.einsum("cf,ij->icjf", ax, eye).reshape(p_ * cx, p_ * f)
    big_bh = jnp.tile(bh, p_).reshape(1, p_ * f)
    big_ap = jnp.einsum("f,ij->ifj", apsi, eye).reshape(p_ * f, p_)
    expand = jnp.kron(jnp.eye(p_, dtype=x.dtype),
                      jnp.ones((1, cx), x.dtype))       # (P, P·Cx)

    ctx = nullcontext()
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu
        ctx = pltpu.force_tpu_interpret_mode()
    with ctx:
        out = pl.pallas_call(
            _gate_kernel,
            grid=(rows // block,),
            in_specs=[
                pl.BlockSpec((block, p_ * cg), lambda i: (i, 0)),
                pl.BlockSpec((block, p_ * cx), lambda i: (i, 0)),
                pl.BlockSpec((p_ * cg, p_ * f), lambda i: (0, 0)),
                pl.BlockSpec((p_ * cx, p_ * f), lambda i: (0, 0)),
                pl.BlockSpec((1, p_ * f), lambda i: (0, 0)),
                pl.BlockSpec((p_ * f, p_), lambda i: (0, 0)),
                pl.BlockSpec((1, 1), lambda i: (0, 0)),
                pl.BlockSpec((p_, p_ * cx), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((block, p_ * cx), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, p_ * cx), x.dtype),
        )(g2, x2, big_ag, big_ax, big_bh, big_ap,
          jnp.reshape(bpsi, (1, 1)), expand)
    return out.reshape(b_, h_, w_, cx)
