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

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')
_SOURCE_RE = re.compile(r'source_file="([^"]*)"\s+source_line=(\d+)')
_CALLS_RE = re.compile(r"(?:calls|body|condition|to_apply)=%?([\w.\-]+)")
_BRANCHES_RE = re.compile(r"branch_computations=\{([^}]*)\}")
_DIMLABELS_RE = re.compile(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)")


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


def _balanced_span(s: str, start: int) -> int:
    """Index one past the matching close paren for the '(' at ``start``."""
    depth = 0
    for i in range(start, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    return len(s)


def parse_instruction(line: str):
    """One HLO instruction line → (name, type_str, opcode, operands, attrs).

    Returns None for non-instruction lines. Handles tuple types whose
    layout annotations contain parens (``{0:T(128)S(1)}``) by balanced
    scanning instead of regex.
    """
    s = line.strip()
    if s.startswith("ROOT "):
        s = s[5:]
    eq = s.find(" = ")
    if eq <= 0 or not (s.startswith("%") or re.match(r"[\w.\-]+ =", s)):
        return None
    name = s[:eq].lstrip("%")
    if not re.fullmatch(r"[\w.\-]+", name):
        return None
    rest = s[eq + 3:]
    # type: tuple → balanced parens; else the next whitespace token
    if rest.startswith("("):
        end = _balanced_span(rest, 0)
        type_str = rest[:end]
        rest = rest[end:].lstrip()
    else:
        sp = rest.find(" ")
        if sp < 0:
            return None
        type_str = rest[:sp]
        rest = rest[sp + 1:].lstrip()
    # opcode up to the operand paren
    par = rest.find("(")
    if par <= 0:
        return None
    opcode = rest[:par]
    if not re.fullmatch(r"[\w\-]+", opcode):
        return None
    end = _balanced_span(rest, par)
    operand_str = rest[par + 1:end - 1]
    attrs = rest[end:]
    return name, type_str, opcode, operand_str, attrs


def _operand_names(operand_str: str):
    """Instruction names referenced in an operand list.

    Operands may be bare (``%fusion.3``) or typed
    (``f32[2,2]{1,0} %p0``); layouts in types contain parens but never
    '%', so every %-token inside the operand parens is an operand.
    """
    return [m.group(1) for m in re.finditer(r"%([\w.\-]+)", operand_str)]


def _conv_kind(dim_labels_attrs: str, opname: str) -> str:
    """fwd / dgrad / wgrad / transpose from a conv's dim_labels + op_name.

    XLA canonical forms (b=batch, f=feature, i=input-, o=output-feature):
      forward: b01f_01io->b01f     wgrad: f01b_i01o->01bf (out is a kernel)
      dgrad:   b01f_01oi->b01f (kernel i/o transposed, window reversed)
    """
    m = _DIMLABELS_RE.search(dim_labels_attrs)
    if m:
        lhs, rhs, out = m.groups()
        if not out.startswith("b"):  # output is kernel-shaped (01bf/01fb/
            return "conv_wgrad"      # f01b): gradient w.r.t. a weight
        if rhs.index("o") < rhs.index("i"):
            # transposed kernel: dgrad, or a ConvTranspose forward
            if "transpose(jvp" in opname:
                return "conv_dgrad"
            return "conv_transpose"
    if "transpose(jvp" in opname:
        return "conv_dgrad"
    return "conv_fwd"


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


def _fusion_body_conv(comp_lines) -> str | None:
    """If a fusion body contains a convolution, return its attrs text."""
    for ln in comp_lines:
        p = parse_instruction(ln)
        if p and p[2] == "convolution":
            return p[4]
    return None


def classify(opcode: str, attrs: str, comps: dict, opname: str) -> str:
    """Bucket an instruction by what it computes."""
    if opcode in ("parameter", "constant", "iota", "get-tuple-element",
                  "tuple", "bitcast", "after-all", "partition-id",
                  "replica-id"):
        return "_skip"
    if opcode in ("while", "call", "conditional"):
        return "_skip"  # bodies accounted at their own instructions
    bwd = "transpose(jvp" in opname
    if opcode == "convolution":
        return _conv_kind(attrs, opname)
    if opcode == "fusion":
        cm = _CALLS_RE.search(attrs)
        body = comps.get(cm.group(1)) if cm else None
        if body is not None:
            conv_attrs = _fusion_body_conv(body)
            if conv_attrs is not None:
                return _conv_kind(conv_attrs, opname)
        if "reduce" in opname.rsplit("/", 1)[-1] or (
                body and any(" reduce(" in ln or " reduce-window(" in ln
                             for ln in body)):
            return "fusion_reduce_bwd" if bwd else "fusion_reduce_fwd"
        return "fusion_elem_bwd" if bwd else "fusion_elem_fwd"
    if opcode == "custom-call":
        return "conv_custom" if "onv" in attrs else "custom_call"
    if opcode == "dot":
        return "dot_bwd" if bwd else "dot_fwd"
    if opcode in ("reduce", "reduce-window"):
        return "reduce"
    if opcode in ("copy", "copy-start", "transpose", "reshape", "reverse",
                  "slice", "dynamic-slice", "dynamic-update-slice", "pad",
                  "concatenate", "broadcast", "gather", "scatter"):
        return "data_movement"
    if opcode == "select-and-scatter":
        return "pool_bwd"
    if opcode == "async-start":
        return "data_movement"  # async copy/collective: charge the start
    if opcode in ("copy-done", "async-done", "async-update"):
        return "_skip"  # bytes charged at the paired start
    if opcode in ("all-reduce", "all-gather", "reduce-scatter",
                  "collective-permute"):
        return "collective"
    if opcode == "convert":
        return "convert"
    return "other"


def profile_hlo(hlo_text: str, top_buffers: int = 20) -> dict:
    """Parse optimized HLO text → per-class/per-source byte totals.

    Only the ENTRY computation (plus computations reached via
    while/call/conditional — e.g. lax.scan bodies) is charged: fusion
    bodies are internal (their intermediates never touch HBM), and
    counting them quadruple-bills the module (observed 7.8 GB parsed vs
    XLA's 1.9 GB accessed on the CPU smoke before this split)."""
    comps, entry = _split_computations(hlo_text)
    include = set()
    frontier = [entry] if entry else list(comps)[-1:]
    while frontier:
        c = frontier.pop()
        if c in include or c not in comps:
            continue
        include.add(c)
        for ln in comps[c]:
            p = parse_instruction(ln)
            if p and p[2] in ("while", "call", "conditional"):
                for cm in _CALLS_RE.finditer(p[4]):
                    frontier.append(cm.group(1))
                bm = _BRANCHES_RE.search(p[4])
                if bm:
                    frontier.extend(
                        n.strip().lstrip("%")
                        for n in bm.group(1).split(",") if n.strip())

    out_bytes: dict = {}   # instr name → output bytes
    per_class = defaultdict(lambda: [0, 0])  # class → [count, bytes]
    per_dtype = defaultdict(int)             # dtype → output bytes written
    per_source = defaultdict(lambda: [0, 0])  # file:line → [count, bytes]
    buffers = []           # (bytes, name, opcode, shapes)

    parsed = []
    for c in include:
        for ln in comps[c]:
            p = parse_instruction(ln)
            if p is None:
                continue
            name, type_str, opcode, operand_str, attrs = p
            b = shape_bytes(type_str)
            out_bytes[name] = b
            shapes = " ".join(f"{sm.group(1)}[{sm.group(2)}]"
                              for sm in _SHAPE_RE.finditer(type_str))
            parsed.append((name, opcode, operand_str, attrs, b, shapes))

    for name, opcode, operand_str, attrs, b, shapes in parsed:
        om = _OPNAME_RE.search(attrs)
        opname = om.group(1) if om else ""
        cls = classify(opcode, attrs, comps, opname)
        if cls == "_skip":
            continue
        ops = sum(out_bytes.get(o, 0) for o in _operand_names(operand_str))
        total = b + ops
        per_class[cls][0] += 1
        per_class[cls][1] += total
        sm = _SOURCE_RE.search(attrs)
        if sm:
            src = f"{os.path.basename(sm.group(1))}:{sm.group(2)}"
            tag = " bwd" if "transpose(jvp" in opname else ""
            per_source[src + tag][0] += 1
            per_source[src + tag][1] += total
        if opcode not in ("parameter", "constant"):
            buffers.append((b, name, opcode, shapes))
            for s2 in _SHAPE_RE.finditer(shapes):
                if s2.group(1) in _DTYPE_BYTES:
                    n = 1
                    for d in s2.group(2).split(","):
                        if d:
                            n *= int(d)
                    per_dtype[s2.group(1)] += n * _DTYPE_BYTES[s2.group(1)]

    buffers.sort(reverse=True)
    return {
        "per_class": {k: {"count": v[0], "bytes": v[1]}
                      for k, v in sorted(per_class.items(),
                                         key=lambda kv: -kv[1][1])},
        "per_source": {k: {"count": v[0], "bytes": v[1]}
                       for k, v in sorted(per_source.items(),
                                          key=lambda kv: -kv[1][1])[:30]},
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
