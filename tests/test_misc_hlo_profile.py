"""Unit tests for the HLO byte-attribution parser
(tools/train_bytes_profile.py) on a synthetic module — the TPU run of the
real profile depends on the relay; the parser must not."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from train_bytes_profile import profile_hlo, shape_bytes  # noqa: E402

HLO = """\
HloModule jit_step

%fused_computation.1 (p0: f32[8,16,16,4]) -> f32[8,16,16,4] {
  %p0 = f32[8,16,16,4]{3,2,1,0} parameter(0)
  %c = f32[] constant(0)
  %b = f32[8,16,16,4]{3,2,1,0} broadcast(%c), dimensions={}
  ROOT %max = f32[8,16,16,4]{3,2,1,0} maximum(%p0, %b)
}

%scan_body (arg: (f32[8,16,16,4], s32[])) -> (f32[8,16,16,4], s32[]) {
  %arg = (f32[8,16,16,4]{3,2,1,0}, s32[]) parameter(0)
  %x = f32[8,16,16,4]{3,2,1,0} get-tuple-element(%arg), index=0
  %i = s32[] get-tuple-element(%arg), index=1
  %relu = f32[8,16,16,4]{3,2,1,0} fusion(%x), kind=kLoop, calls=%fused_computation.1
  ROOT %out = (f32[8,16,16,4]{3,2,1,0}, s32[]) tuple(%relu, %i)
}

%scan_cond (arg: (f32[8,16,16,4], s32[])) -> pred[] {
  %arg = (f32[8,16,16,4]{3,2,1,0}, s32[]) parameter(0)
  ROOT %lt = pred[] constant(true)
}

ENTRY %main (p0: f32[8,16,16,4], w: f32[3,3,4,8]) -> f32[8,16,16,8] {
  %p0 = f32[8,16,16,4]{3,2,1,0} parameter(0)
  %w = f32[3,3,4,8]{3,2,1,0} parameter(1)
  %zero = s32[] constant(0)
  %t = (f32[8,16,16,4]{3,2,1,0}, s32[]) tuple(%p0, %zero)
  %loop = (f32[8,16,16,4]{3,2,1,0}, s32[]) while(%t), condition=%scan_cond, body=%scan_body
  %xx = f32[8,16,16,4]{3,2,1,0} get-tuple-element(%loop), index=0
  ROOT %conv = f32[8,16,16,8]{3,2,1,0} convolution(%xx, %w), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
}
"""

ACT4 = 8 * 16 * 16 * 4 * 4      # f32[8,16,16,4] bytes
ACT8 = 8 * 16 * 16 * 8 * 4
W = 3 * 3 * 4 * 8 * 4


def test_shape_bytes():
    assert shape_bytes("f32[8,16,16,4]{3,2,1,0}") == ACT4
    assert shape_bytes("bf16[10,10]") == 200
    assert shape_bytes("(f32[2,2]{1,0}, s32[])") == 16 + 4
    assert shape_bytes("pred[]") == 1


def test_profile_entry_and_while_body_only():
    rep = profile_hlo(HLO)
    cls = rep["per_class"]
    # conv charged output + input + weights
    assert cls["conv_fwd"]["bytes"] == ACT8 + ACT4 + W
    assert cls["conv_fwd"]["count"] == 1
    # the fusion inside the while body is charged (in+out), ONCE —
    # its internal broadcast/max never appear
    assert cls["fusion_elementwise"]["bytes"] == 2 * ACT4
    assert cls["fusion_elementwise"]["count"] == 1
    # scan_cond's constant and fusion internals contribute nothing else
    assert "other" not in cls or cls["other"]["bytes"] == 0
    # top buffer is the conv output
    assert rep["top_buffers"][0]["opcode"] == "convolution"
    assert rep["top_buffers"][0]["bytes"] == ACT8
    # dtype write accounting sees f32 only (pred/s32 scalars negligible)
    assert rep["per_dtype_written"]["f32"] >= ACT8 + ACT4
