"""Float sugar over the string/mesh kernels (reference float API breadth:
float/clip.rs, float/slice.rs, float Stroke trait) — exact-grid roundtrips."""

import numpy as np

from ioverlay_spark.functions.float_shell import (
    NumpyFloatAdapter,
    float_clip_path,
    float_slice_shape,
    float_stroke,
)


def test_float_clip_fixed_scale_matches_int_kernel():
    from ioverlay_spark.kernel.string_ops import clip_path

    a = NumpyFloatAdapter.fixed_scale(1 / 64.0)
    body_f = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0]])]
    path_f = np.array([[-1.0, 1.5], [5.0, 1.5]])
    got = float_clip_path(body_f, path_f, adapter=a)
    # same clip on the integer grid (x64), mapped back
    body_i = [np.array([[0, 0], [256, 0], [256, 192], [0, 192]], np.int64)]
    path_i = np.array([[-64, 96], [320, 96]], np.int64)
    want = [p.astype(np.float64) / 64.0 for p in clip_path(body_i, path_i)]
    assert len(got) == len(want) == 1
    assert np.array_equal(got[0], want[0])
    assert got[0][0].tolist() == [0.0, 1.5] and got[0][-1].tolist() == [4.0, 1.5]


def test_float_clip_fitted_adapter_roundtrip():
    # fitted adapter: power-of-two scale keeps 2^-k-grid floats exact
    body = [np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])]
    path = np.array([[-2.0, 5.0], [12.0, 5.0]])
    got = float_clip_path(body, path)
    assert len(got) == 1
    assert got[0][0].tolist() == [0.0, 5.0] and got[0][-1].tolist() == [10.0, 5.0]


def test_float_slice_two_pieces_exact_areas():
    body = [np.array([[0.0, 0.0], [8.0, 0.0], [8.0, 4.0], [0.0, 4.0]])]
    cut = [np.array([[2.0, -1.0], [2.0, 5.0]])]
    a = NumpyFloatAdapter.fixed_scale(1 / 64.0)
    shapes = float_slice_shape(body, cut, adapter=a)
    assert len(shapes) == 2

    def area(shape):
        s = 0.0
        for ring in shape:
            x, y = ring[:, 0], ring[:, 1]
            s += 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
        return s

    assert sorted(round(area(s), 6) for s in shapes) == [8.0, 24.0]


def test_float_stroke_butt_exact_rect():
    # horizontal segment, butt caps: stroke is an exact width x length rectangle
    path = np.array([[0.0, 0.0], [10.0, 0.0]])
    a = NumpyFloatAdapter.fixed_scale(1 / 64.0)
    shapes = float_stroke(path, 2.0, adapter=a)
    assert len(shapes) == 1

    ring = shapes[0][0]
    x, y = ring[:, 0], ring[:, 1]
    area = 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
    assert abs(area) == 20.0
    assert x.min() == 0.0 and x.max() == 10.0 and y.min() == -1.0 and y.max() == 1.0


def test_float_stroke_custom_cap_template_beyond_pad():
    # a spear cap reaching 5 half-widths past the endpoint: the fitted adapter
    # must pad by the template magnitude, or cap points quantize outside the
    # fitted extent (ADVICE r02 float_shell.py:130)
    from ioverlay_spark.kernel.buffering import LineCap

    path = np.array([[0.0, 0.0], [10.0, 0.0]])
    tpl = np.array([[1.0, -1.0], [5.0, 0.0], [1.0, 1.0]])
    shapes = float_stroke(path, 2.0, cap=LineCap.CUSTOM, custom_cap=tpl)
    assert len(shapes) == 1
    ring = shapes[0][0]
    x = ring[:, 0]
    # spear tips sit ~5 half-widths = 5.0 beyond each endpoint
    assert x.max() > 14.0 and x.min() < -4.0
    assert np.isfinite(ring).all()
