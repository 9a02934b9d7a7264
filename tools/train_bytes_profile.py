"""Attribute a compiled train step's HBM bytes to tensors/op classes.

VERDICT r3 #2: the 512²/bs128 flagship train step runs at 276 ms —
exactly its 154 GB of HBM traffic at the achieved 557 GB/s — and the
next move on the training-MFU axis needs to know WHICH tensors carry
those bytes. XLA's ``cost_analysis()`` gives one aggregate number; this
tool parses the optimized HLO module instead and buckets every
instruction's operand+output bytes by op class (conv forward / dgrad /
wgrad, elementwise fusions, reduces, copies, ...) and lists the largest
individual buffers, so "cut activation traffic" becomes "cut THESE
tensors".

Byte model: every instruction is charged output bytes + the bytes of its
(named) operands — the flow traffic a perfectly-fused schedule would
still move, an upper bound that matches XLA's own bytes-accessed
convention. Fusion parameters are resolved through the fusion's operand
list (computation bodies are skipped; internal intermediates of a fusion
never touch HBM).

Usage:
    python tools/train_bytes_profile.py [--size 512] [--batch 128]
        [--cpu-smoke]     # tiny shapes on CPU: validates the parser
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

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

# %name = TYPE opcode(...)  — TYPE may be a tuple (f32[..], f32[..])
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\(.*?\)|[\w\[\],{}:#*\s]+?)\s+"
    r"([\w\-]+)\((.*)\)")
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_OPERAND_RE = re.compile(r"%?([\w.\-]+)")


def shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string (handles tuples)."""
    total = 0
    for m in _SHAPE_RE.finditer(type_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def classify(name: str, opcode: str, body: str) -> str:
    """Bucket an instruction by what it computes."""
    text = f"{name} {body}"
    if opcode in ("parameter", "constant", "iota", "get-tuple-element",
                  "tuple", "bitcast"):
        return "_skip"
    if opcode == "convolution" or "convolution" in body:
        # gradient convs are labeled via metadata op_name in the body
        if re.search(r"conv.*(input|dgrad)|gradients.*conv", text) or \
                "kBackpropInput" in body:
            return "conv_dgrad"
        if re.search(r"conv.*(filter|wgrad|kernel_grad)", text) or \
                "kBackpropFilter" in body:
            return "conv_wgrad"
        if "transpose" in text and "conv" in text:
            return "conv_transpose"
        return "conv_fwd"
    if opcode == "custom-call":
        if "Conv" in body or "conv" in body:
            return "conv_custom"
        return "custom_call"
    if opcode == "dot":
        return "dot"
    if opcode == "fusion":
        if "reduce" in body[:200]:
            return "fusion_reduce"
        return "fusion_elementwise"
    if opcode in ("reduce", "reduce-window"):
        return "reduce"
    if opcode in ("copy", "transpose", "reshape", "reverse", "slice",
                  "dynamic-slice", "dynamic-update-slice", "pad",
                  "concatenate", "broadcast", "gather", "scatter"):
        return "data_movement"
    if opcode in ("all-reduce", "all-gather", "reduce-scatter",
                  "collective-permute"):
        return "collective"
    if opcode == "while":
        return "_skip"  # body accounted at its own instructions
    if opcode in ("convert",):
        return "convert"
    return "other"


# Computation headers may have nested parens in the param list
# (tuple-typed args, e.g. scan carries) — match greedily to '->'.
_COMP_RE = re.compile(r"^(ENTRY\s+)?%?([\w.\-]+)\s*(?:\(.*\))?\s*->.*{")


def _split_computations(hlo_text: str):
    """HLO text → {computation name: [instruction lines]}, entry name."""
    comps, entry = {}, None
    cur = None
    for ln in hlo_text.splitlines():
        m = _COMP_RE.match(ln)
        if m:
            cur = m.group(2)
            comps[cur] = []
            if m.group(1):
                entry = cur
            continue
        if ln.strip() == "}":
            cur = None
            continue
        if cur is not None:
            comps[cur].append(ln)
    return comps, entry


def profile_hlo(hlo_text: str, top_buffers: int = 20) -> dict:
    """Parse optimized HLO text → per-class byte totals + largest defs.

    Only the ENTRY computation (plus computations reached via
    while/call/conditional — e.g. lax.scan bodies) is charged: fusion
    bodies are internal (their intermediates never touch HBM), and
    counting them quadruple-bills the module (observed 7.8 GB parsed vs
    XLA's 1.9 GB accessed on the CPU smoke before this split)."""
    comps, entry = _split_computations(hlo_text)
    include = set()
    frontier = [entry] if entry else list(comps)[-1:]
    callers = re.compile(r"(?:while|call|conditional)\(")
    comp_name = re.compile(r"(?:body|condition|branch_computations|"
                           r"to_apply)=\{?%?([\w.\-]+)")
    while frontier:
        c = frontier.pop()
        if c in include or c not in comps:
            continue
        include.add(c)
        for ln in comps[c]:
            if callers.search(ln) or " while(" in ln or " call(" in ln:
                for cm in comp_name.finditer(ln):
                    frontier.append(cm.group(1))

    out_bytes: dict = {}   # instr name → output bytes
    per_class = defaultdict(lambda: [0, 0])  # class → [count, bytes]
    per_dtype = defaultdict(int)             # dtype → output bytes written
    buffers = []           # (bytes, name, opcode)

    parsed = []
    for c in include:
        for ln in comps[c]:
            m = _INSTR_RE.match(ln)
            if not m:
                continue
            name, type_str, opcode, body = m.groups()
            b = shape_bytes(type_str)
            out_bytes[name] = b
            shapes = " ".join(f"{sm.group(1)}[{sm.group(2)}]"
                              for sm in _SHAPE_RE.finditer(type_str))
            parsed.append((name, opcode, body, b, shapes))

    for name, opcode, body, b, shapes in parsed:
        cls = classify(name, opcode, body)
        if cls == "_skip":
            continue
        # operand bytes: resolve names appearing before any '(' nesting
        ops = 0
        depth = 0
        head = []
        for ch in body:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0:
                head.append(ch)
        for om in _OPERAND_RE.finditer("".join(head)):
            ops += out_bytes.get(om.group(1), 0)
        total = b + ops
        per_class[cls][0] += 1
        per_class[cls][1] += total
        if opcode not in ("parameter", "constant"):
            buffers.append((b, name, opcode, shapes))
            for sm in _SHAPE_RE.finditer(shapes):
                if sm.group(1) in _DTYPE_BYTES:
                    n = 1
                    for d in sm.group(2).split(","):
                        if d:
                            n *= int(d)
                    per_dtype[sm.group(1)] += n * _DTYPE_BYTES[sm.group(1)]

    buffers.sort(reverse=True)
    return {
        "per_class": {k: {"count": v[0], "bytes": v[1]}
                      for k, v in sorted(per_class.items(),
                                         key=lambda kv: -kv[1][1])},
        "per_dtype_written": dict(sorted(per_dtype.items(),
                                         key=lambda kv: -kv[1])),
        "total_bytes": sum(v[1] for v in per_class.values()),
        "top_buffers": [{"bytes": b, "name": n, "opcode": o, "shape": s}
                        for b, n, o, s in buffers[:top_buffers]],
    }


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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--cpu-smoke", action="store_true",
                    help="32²/bs2 f32 on CPU — parser validation only")
    ap.add_argument("--out", default=None, help="write JSON report here")
    args = ap.parse_args(argv)

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

    gb = 1e9
    print(f"\ntrain step {args.size}²/bs{args.batch} {args.dtype} on "
          f"{compiled.as_text()[:0] or ''}{__import__('jax').default_backend()}")
    print(f"{'class':<22}{'count':>7}{'GB':>10}{'%':>7}")
    print("-" * 46)
    tot = report["total_bytes"] or 1
    for cls, v in report["per_class"].items():
        print(f"{cls:<22}{v['count']:>7}{v['bytes'] / gb:>10.2f}"
              f"{100 * v['bytes'] / tot:>6.1f}%")
    print("-" * 46)
    print(f"{'TOTAL (flow bytes)':<22}{'':>7}{tot / gb:>10.2f}")
    if "xla_cost_analysis" in report:
        xca = report["xla_cost_analysis"]
        if "bytes accessed" in xca:
            print(f"{'XLA bytes accessed':<22}{'':>7}"
                  f"{xca['bytes accessed'] / gb:>10.2f}")
        if "flops" in xca:
            print(f"XLA flops: {xca['flops'] / 1e12:.2f} TF")
    print("\nbytes written per dtype:")
    for dt, b in report["per_dtype_written"].items():
        print(f"  {dt:<6}{b / gb:>10.2f} GB")
    print("\nlargest buffers:")
    for buf in report["top_buffers"][:12]:
        print(f"  {buf['bytes'] / gb:8.3f} GB  {buf['opcode']:<12} "
              f"{buf['shape']:<30} {buf['name']}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"\nreport: {args.out}")
    return report


if __name__ == "__main__":
    main()
