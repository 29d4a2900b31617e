"""Unit tests for tools/standalone_floor.py HLO parsing + conv replay.

The floor audit's claim rests on replaying convs *exactly* as the HLO
specifies them; these pin the window/dim-label parsing and verify a
replayed conv matches the HLO's output shape for every signature class
the flagship step contains (fwd 1x1/3x3, dgrad with rhs_reversal,
wgrad f01b_i01o, strided root conv, dilated block4).
"""

import sys
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from standalone_floor import parse_dim_numbers, parse_hlo_convs, parse_window


HLO = """\
HloModule jit_train_step

ENTRY %main {
  %p0 = bf16[16,256,512,64]{3,0,2,1:T(8,128)(2,1)} parameter(0)
  %fusion.1 = bf16[16,512,1024,3]{3,0,2,1:T(8,128)(2,1)} fusion(%p0)
  %fusion.2 = bf16[7,7,3,64]{3,2,1,0:T(8,128)(2,1)} fusion(%p0)
  ROOT %conv_general_dilated.589 = bf16[16,256,512,64]{3,0,2,1:T(8,128)(2,1)} convolution(%fusion.1, %fusion.2), window={size=7x7 stride=2x2 pad=3_3x3_3}, dim_labels=b01f_01io->b01f, metadata={op_name="jit(train_step)/root/conv_general_dilated"}
  %f3 = bf16[16,64,128,1024]{3,0,2,1:T(8,128)(2,1)} fusion(%p0)
  %f4 = bf16[1,1,256,1024]{3,2,1,0:T(8,128)(2,1)} fusion(%p0)
  %conv.dgrad = bf16[16,64,128,256]{3,0,2,1:T(8,128)(2,1)} convolution(%f3, %f4), window={size=1x1 rhs_reversal=1x1}, dim_labels=b01f_01oi->b01f, metadata={op_name="jit(train_step)/dgrad/conv_general_dilated"}
  %f5 = bf16[16,64,128,256]{3,0,2,1:T(8,128)(2,1)} fusion(%p0)
  %f6 = bf16[16,64,128,1024]{3,0,2,1:T(8,128)(2,1)} fusion(%p0)
  %conv.wgrad = f32[1,1,256,1024]{3,2,1,0:T(8,128)(2,1)} convolution(%f5, %f6), window={size=64x128}, dim_labels=f01b_i01o->01bf, metadata={op_name="jit(train_step)/wgrad/conv_general_dilated"}
  %f7 = bf16[16,64,128,256]{3,0,2,1:T(8,128)(2,1)} fusion(%p0)
  %f8 = bf16[3,3,256,256]{3,2,1,0:T(8,128)(2,1)} fusion(%p0)
  %conv.dil = bf16[16,64,128,256]{3,0,2,1:T(8,128)(2,1)} convolution(%f7, %f8), window={size=3x3 pad=2_2x2_2 rhs_dilate=2x2}, dim_labels=b01f_01io->b01f, metadata={op_name="jit(train_step)/block4dil/conv_general_dilated"}
}
"""


@pytest.fixture(scope="module")
def parsed(tmp_path_factory):
    p = tmp_path_factory.mktemp("hlo") / "hlo.txt"
    p.write_text(HLO)
    return parse_hlo_convs(str(p))


def test_parses_all_convs_with_ops(parsed):
    shapes, convs = parsed
    assert set(convs) == {
        "conv_general_dilated.589", "conv.dgrad", "conv.wgrad", "conv.dil"}
    assert convs["conv_general_dilated.589"]["op_name"].endswith(
        "root/conv_general_dilated")
    assert convs["conv.wgrad"]["out_dt"] == "f32"
    assert shapes["f5"] == ("bf16", [16, 64, 128, 256])


def test_window_parsing():
    w = parse_window("size=7x7 stride=2x2 pad=3_3x3_3", 2)
    assert w["stride"] == (2, 2) and w["pad"] == ((3, 3), (3, 3))
    w = parse_window("size=3x3 pad=2_2x2_2 rhs_dilate=2x2", 2)
    assert w["rhs_dilate"] == (2, 2) and w["lhs_dilate"] == (1, 1)
    w = parse_window("size=1x1 rhs_reversal=1x1", 2)  # reversal ignored
    assert w["stride"] == (1, 1)


@pytest.mark.parametrize("name", [
    "conv_general_dilated.589", "conv.dgrad", "conv.wgrad", "conv.dil"])
def test_replay_matches_hlo_output_shape(parsed, name):
    import jax
    import jax.numpy as jnp

    shapes, convs = parsed
    rec = convs[name]
    dn, rank = parse_dim_numbers(rec["dim_labels"])
    win = parse_window(rec["window"], rank)
    lhs = jnp.zeros(shapes[rec["lhs"]][1], jnp.bfloat16)
    rhs = jnp.zeros(shapes[rec["rhs"]][1], jnp.bfloat16)
    out = jax.eval_shape(
        lambda a, b: jax.lax.conv_general_dilated(
            a, b, window_strides=win["stride"], padding=win["pad"],
            lhs_dilation=win["lhs_dilate"], rhs_dilation=win["rhs_dilate"],
            dimension_numbers=dn,
            preferred_element_type=jnp.float32
            if rec["out_dt"] == "f32" else jnp.bfloat16,
        ), lhs, rhs)
    assert list(out.shape) == rec["out_shape"], name
    assert out.dtype == (np.float32 if rec["out_dt"] == "f32" else
                         np.dtype("bfloat16").type or out.dtype)


def test_object_rate_thins_scenes():
    from synthetic_scenes import make_scene

    full = sum(len(make_scene(s, 128, 256)[2]) for s in range(40))
    thin = sum(len(make_scene(s, 128, 256, object_rate=0.2)[2])
               for s in range(40))
    assert thin < full * 0.55
    # rate=1.0 stays byte-identical to the default (no extra RNG draws)
    img0, lbl0, obj0 = make_scene(7, 64, 128)
    img1, lbl1, obj1 = make_scene(7, 64, 128, object_rate=1.0)
    assert np.array_equal(img0, img1) and np.array_equal(lbl0, lbl1)
    assert obj0 == obj1
