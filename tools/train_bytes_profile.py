"""Attribute a compiled train step's HBM bytes to tensors/op classes.

VERDICT r3 #2: the 512²/bs128 flagship train step runs at 276 ms —
exactly its 154 GB of HBM traffic at the achieved 557 GB/s — and the
next move on the training-MFU axis needs to know WHICH tensors carry
those bytes. XLA's ``cost_analysis()`` gives one aggregate number; this
tool parses the optimized HLO module instead and buckets every
instruction's operand+output bytes by op class (conv forward / dgrad /
wgrad, elementwise fusions split fwd/bwd, reduces, copies, ...), by the
model source line that emitted it (``metadata source_file:line``), and
lists the largest individual buffers, so "cut activation traffic"
becomes "cut THESE tensors".

TPU HLO specifics this parser handles (a naive regex does not):
- convolutions are wrapped in kOutput fusions — the conv instruction
  lives in the fusion *body*; attribution follows ``calls=`` into the
  body and reads the conv's ``dim_labels`` to split fwd/dgrad/wgrad;
- tuple types and layouts contain nested parens/braces
  (``(f32[64]{0:T(128)S(1)}, ...)``) — fields are split by balanced
  paren/brace scanning, never by non-greedy regex;
- ``metadata={op_name="jit(...)/transpose(jvp(...))/..."}`` marks
  backward-pass instructions.

Byte model: every instruction is charged output bytes + the bytes of its
(named) operands — the flow traffic a perfectly-fused schedule would
still move, matching XLA's own bytes-accessed convention. Fusion
parameters are resolved through the fusion's operand list (computation
bodies are skipped; internal intermediates of a fusion never touch HBM).

Usage:
    python tools/train_bytes_profile.py [--size 512] [--batch 128]
        [--cpu-smoke]     # tiny shapes on CPU: validates the parser
        [--hlo-file F]    # parse a saved `compiled.as_text()` dump
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The parser itself now lives in the library (segtpu/core/hlo_profile.py,
# round 5) so the collective/scaling tooling can share it; this tool keeps
# the CLI + train-step builder and re-exports the names its tests import.
from segtpu.core.hlo_profile import (  # noqa: F401,E402
    _DTYPE_BYTES, shape_bytes, _balanced_span, parse_instruction,
    _operand_names, _conv_kind, _split_computations, _fusion_body_conv,
    classify, profile_hlo, _SHAPE_RE, _OPNAME_RE, _SOURCE_RE, _CALLS_RE,
    _BRANCHES_RE, _DIMLABELS_RE, _COMP_RE)


def build_train_step(size: int, batch: int, dtype: str = "bfloat16"):
    import jax
    import jax.numpy as jnp
    from segtpu.train.engine import get_engine

    engine = get_engine({"backbone": "resnet34", "use_attention": True,
                         "loss_fn": "combo", "dtype": dtype})
    state = engine.init_state(jax.random.key(0), (1, size, size, 1),
                              1e-3, 1e-5)
    imgs = jnp.zeros((batch, size, size, 1), jnp.float32)
    masks = jnp.zeros((batch, size, size, 1), jnp.float32)
    lowered = jax.jit(engine._train_step_impl).lower(state, imgs, masks)
    return lowered


def report_text(report: dict, header: str) -> str:
    gb = 1e9
    lines = [f"\n{header}"]
    lines.append(f"{'class':<22}{'count':>7}{'GB':>10}{'%':>7}")
    lines.append("-" * 46)
    tot = report["total_bytes"] or 1
    for cls, v in report["per_class"].items():
        lines.append(f"{cls:<22}{v['count']:>7}{v['bytes'] / gb:>10.2f}"
                     f"{100 * v['bytes'] / tot:>6.1f}%")
    lines.append("-" * 46)
    lines.append(f"{'TOTAL (flow bytes)':<22}{'':>7}{tot / gb:>10.2f}")
    if "xla_cost_analysis" in report:
        xca = report["xla_cost_analysis"]
        if "bytes accessed" in xca:
            lines.append(f"{'XLA bytes accessed':<22}{'':>7}"
                         f"{xca['bytes accessed'] / gb:>10.2f}")
        if "flops" in xca:
            lines.append(f"XLA flops: {xca['flops'] / 1e12:.2f} TF")
    lines.append("\nbytes by source line (top 15):")
    for src, v in list(report["per_source"].items())[:15]:
        lines.append(f"  {v['bytes'] / gb:8.2f} GB {v['count']:>5}x  {src}")
    lines.append("\nbytes written per dtype:")
    for dt, b in report["per_dtype_written"].items():
        lines.append(f"  {dt:<6}{b / gb:>10.2f} GB")
    lines.append("\nlargest buffers:")
    for buf in report["top_buffers"][:12]:
        lines.append(f"  {buf['bytes'] / gb:8.3f} GB  {buf['opcode']:<12} "
                     f"{buf['shape']:<30} {buf['name']}")
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cpu-smoke", action="store_true",
                    help="32²/bs2 f32 on CPU — parser validation only")
    ap.add_argument("--hlo-file", default=None,
                    help="parse a saved compiled.as_text() dump instead "
                         "of compiling (offline iteration)")
    ap.add_argument("--out", default=None, help="write JSON report here")
    args = ap.parse_args(argv)

    if args.hlo_file:
        with open(args.hlo_file) as f:
            hlo = f.read()
        report = profile_hlo(hlo)
        header = f"HLO file {args.hlo_file}"
    else:
        if args.cpu_smoke:
            import jax
            jax.config.update("jax_platforms", "cpu")
            args.size, args.batch, args.dtype = 32, 2, "float32"
        lowered = build_train_step(args.size, args.batch, args.dtype)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        report = profile_hlo(hlo)
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        if ca:
            report["xla_cost_analysis"] = {
                k: float(ca[k]) for k in ("flops", "bytes accessed")
                if k in ca}
        import jax
        header = (f"train step {args.size}²/bs{args.batch} {args.dtype} "
                  f"on {jax.default_backend()}")

    print(report_text(report, header))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"\nreport: {args.out}")
    return report


if __name__ == "__main__":
    main()
