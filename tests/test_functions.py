"""PDF functions (§7.10): all four types through core/functions.py —
the machinery behind the raster tier's /Separation tint transforms."""

from __future__ import annotations

import math

import pytest

from pdfparser_spark.core.functions import (
    build_function,
    parse_ps_calculator,
    run_ps_calculator,
)


class _S:
    def __init__(self, attrs, data):
        self.attrs, self.data = attrs, data


def test_type2_exponential():
    f, n = build_function(
        {"FunctionType": 2, "Domain": [0, 1], "C0": [0.1, 0.2], "C1": [0.9, 0.4], "N": 2}
    )
    assert n == 2
    assert f([0.0]) == [0.1, 0.2]
    assert f([1.0]) == [0.9, 0.4]
    x = 0.5
    assert f([x]) == [0.1 + x ** 2.0 * 0.8, 0.2 + x ** 2.0 * 0.2]
    assert f([2.0]) == f([1.0])  # domain clip


def test_type3_stitching_boundaries():
    f, n = build_function(
        {
            "FunctionType": 3, "Domain": [0, 1],
            "Functions": [
                {"FunctionType": 2, "Domain": [0, 1], "C0": [0.0], "C1": [0.5], "N": 1},
                {"FunctionType": 2, "Domain": [0, 1], "C0": [0.5], "C1": [1.0], "N": 1},
            ],
            "Bounds": [0.5], "Encode": [0, 1, 0, 1],
        }
    )
    assert f([0.25]) == [0.25] and f([0.75]) == [0.75]
    assert f([0.5]) == [0.5]  # bound belongs to the RIGHT subdomain
    with pytest.raises(ValueError):
        build_function({"FunctionType": 3, "Domain": [0, 1], "Functions": [],
                        "Bounds": [], "Encode": []})


def test_type4_calculator_operator_set():
    cases = [
        ("{ 7 3 idiv }", [], [2.0]),
        ("{ -7 3 idiv }", [], [-2.0]),  # truncates toward zero
        ("{ 7 3 mod }", [], [1.0]),
        ("{ 2 10 exp }", [], [1024.0]),
        ("{ 90 sin }", [], [1.0]),
        ("{ 0 cos }", [], [1.0]),
        ("{ 1 1 atan }", [], [45.0]),
        ("{ -1 1 atan 315 sub }", [], [0.0]),  # atan quadrant (315 deg)
        ("{ 100 ln 100 log div }", [], [math.log(100) / 2.0]),
        ("{ 2.7 truncate 2.7 round 2.5 round }", [], [2.0, 3.0, 3.0]),  # PS half-up
        ("{ 3 1 roll }", [1, 2, 3], [3.0, 1.0, 2.0]),
        ("{ 2 copy }", [4, 5], [4.0, 5.0, 4.0, 5.0]),
        ("{ 1 index }", [8, 9], [8.0, 9.0, 8.0]),
        ("{ dup 0.5 lt { pop 0 } { pop 1 } ifelse }", [0.3], [0.0]),
        ("{ dup 0.5 lt { pop 0 } { pop 1 } ifelse }", [0.7], [1.0]),
        ("{ true { 42 } if }", [], [42.0]),
        ("{ 12 3 and 12 3 or 12 3 xor }", [], [0.0, 15.0, 15.0]),
        ("{ 1 3 bitshift 16 -2 bitshift }", [], [8.0, 4.0]),
        ("{ 5 not }", [], [-6.0]),  # integer not = bitwise complement
    ]
    for src, inputs, want in cases:
        got = run_ps_calculator(parse_ps_calculator(src), inputs)
        assert got == pytest.approx(want, abs=1e-12), src


def test_type4_errors_contained():
    for bad in ("{ add }", "{ 1 0 div }", "{ -1 sqrt }", "{ 1 {", "{ frobnicate }",
                "{ 1 2 3"):
        with pytest.raises(ValueError):
            run_ps_calculator(parse_ps_calculator(bad), [])
    with pytest.raises(ValueError):  # non-numeric result left on stack
        run_ps_calculator(parse_ps_calculator("{ true }"), [])


def test_type4_via_build_function_range_clip():
    f, n = build_function(
        _S({"FunctionType": 4, "Domain": [0, 1], "Range": [0, 0.5]},
           b"{ 1 exch sub dup mul }")
    )
    assert n == 1
    assert f([0.0]) == [0.5]  # (1-0)^2 = 1 clipped to range max
    assert f([1.0]) == [0.0]


def test_type0_sampled_1d_and_2d():
    f, n = build_function(
        _S({"FunctionType": 0, "Domain": [0, 1], "Range": [0, 1], "Size": [5],
            "BitsPerSample": 8}, bytes([0, 64, 128, 192, 255]))
    )
    assert f([0.0]) == [0.0] and f([1.0]) == [1.0]
    # midway between grid points 1 and 2: linear interpolation
    got = f([0.375])[0]
    assert got == pytest.approx((64 + 128) / 2 / 255, abs=1e-12)
    # 2D: first input dimension varies fastest in sample order (§7.10.3)
    f2, _ = build_function(
        _S({"FunctionType": 0, "Domain": [0, 1, 0, 1], "Range": [0, 1],
            "Size": [2, 2], "BitsPerSample": 8}, bytes([0, 100, 200, 255]))
    )
    assert f2([1, 0]) == pytest.approx([100 / 255], abs=1e-12)
    assert f2([0, 1]) == pytest.approx([200 / 255], abs=1e-12)


def test_type0_subbyte_and_16bit_samples():
    # 4-bit samples: values 0..15 over a 4-point grid
    f, _ = build_function(
        _S({"FunctionType": 0, "Domain": [0, 1], "Range": [0, 1], "Size": [4],
            "BitsPerSample": 4}, bytes([0x0F, 0x78]))  # samples 0,15,7,8
    )
    assert f([1 / 3])[0] == pytest.approx(1.0, abs=1e-12)
    f16, _ = build_function(
        _S({"FunctionType": 0, "Domain": [0, 1], "Range": [0, 1], "Size": [2],
            "BitsPerSample": 16}, (0).to_bytes(2, "big") + (65535).to_bytes(2, "big"))
    )
    assert f16([1.0]) == [1.0]


def test_separation_colorspace_resolution():
    """The kernel resolves [/Separation name alt fn] into an evaluator
    (unit-level: dict function, no document needed)."""
    from pdfparser_spark.core.extract import _image_colorspace

    attrs = {
        "ColorSpace": [
            "Separation", "Spot1", "DeviceRGB",
            {"FunctionType": 2, "Domain": [0, 1], "C0": [0, 0, 0],
             "C1": [1, 0.5, 0.25], "N": 1},
        ]
    }
    cs = _image_colorspace(attrs, {})
    assert cs[0] == "separation" and cs[1] == "rgb" and cs[3] == 3
    assert cs[2]([1.0]) == [1.0, 0.5, 0.25]
