"""Apps conformance: every app's pipeline output must match its numpy
reference implementation — the analog of the reference's apps/*/filter.cpp
correctness checks (bit-exact for integer pipelines, tolerance for float)."""
import numpy as np
import pytest

import halide_tpu as hl
from halide_tpu.apps import get, load_all

# small sizes for CI; bench.py uses canonical sizes
SMALL = dict(width=96, height=64)


def run_app(name, **kw):
    app = get(name)(**kw)
    data = app.make_inputs()
    app.bind(data)
    out = app.realize()
    ref = app.reference(**data)
    return out, ref, app


def check(name, **kw):
    out, ref, app = run_app(name, **kw)
    outs = out if isinstance(out, (list, tuple)) else [out]
    refs = ref if isinstance(ref, (list, tuple)) else [ref]
    for o, r in zip(outs, refs):
        o = o.to_numpy()
        if app.tolerance == 0.0 and app.atol == 0.0:
            np.testing.assert_array_equal(o, r)
        elif app.mismatch_frac > 0:
            of = o.astype(np.float64)
            rf = np.asarray(r, dtype=np.float64)
            bad = np.abs(of - rf) > app.atol + app.tolerance * np.abs(rf)
            frac = bad.mean()
            assert frac <= app.mismatch_frac, (
                f"{frac:.4%} of pixels mismatch (> {app.mismatch_frac:.4%})")
        else:
            np.testing.assert_allclose(
                o.astype(np.float64), np.asarray(r, dtype=np.float64),
                rtol=app.tolerance, atol=app.atol)


def test_blur():
    check("blur", **SMALL)


def test_unsharp():
    check("unsharp", **SMALL)


def test_harris():
    check("harris", **SMALL)


def test_hist():
    check("hist", **SMALL)


def test_iir_blur():
    check("iir_blur", **SMALL)


def test_gaussian_blur():
    check("gaussian_blur", **SMALL)


def test_stencil_chain():
    check("stencil_chain", width=64, height=48, stencils=5)


def test_max_filter():
    check("max_filter", width=48, height=40, radius=6)


def test_bilateral_grid():
    check("bilateral_grid", width=64, height=48)


def test_interpolate():
    check("interpolate", width=96, height=64, levels=5)


def test_local_laplacian():
    check("local_laplacian", width=96, height=64, pyramid_levels=4)


def test_conv_layer():
    # sizes chosen to cross the einsum-contraction threshold
    check("conv_layer", N=2, CI=32, CO=32, W=32, H=16)


def test_depthwise_separable_conv():
    check("depthwise_separable_conv", N=2, CI=16, CO=8, CM=1, W=32, H=24)


def test_camera_pipe():
    check("camera_pipe", out_width=128, out_height=96)


def test_nl_means():
    check("nl_means", width=48, height=40, patch_size=5, search_area=5)


def test_wavelet():
    check("wavelet", width=64, height=48)


def test_resize_cubic_down():
    check("resize", width=96, height=64, scale_factor=0.5)


def test_resize_linear_up():
    check("resize", width=48, height=32, scale_factor=2.0,
          interpolation="linear", upsample=True)


def test_lens_blur_zero_radius_exact():
    check("lens_blur", width=48, height=40, slices=8, focus_depth=4,
          blur_radius_scale=0.0, aperture_samples=4, levels=4)


def test_lens_blur_stochastic_structural():
    app = get("lens_blur")(width=48, height=40, slices=8, focus_depth=4,
                           blur_radius_scale=0.5, aperture_samples=4,
                           levels=4)
    data = app.make_inputs()
    app.bind(data)
    out = app.realize().to_numpy()
    assert out.shape == (3, 40, 48)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_resnet_tiny():
    check("resnet_50", layers=(1, 1, 1, 1), width=8, classes=10,
          image=32, batch=2)


def test_compositing():
    check("compositing", width=64, height=48)


def test_linear_blur():
    check("linear_blur", width=64, height=48)


def test_sgemm():
    check("sgemm", M=128, N=96, K=64)


def test_hgemm():
    # bf16 single-pass MXU GEMM with f32 accumulate/epilogue
    check("hgemm", M=128, N=96, K=64)


def test_hgemm_flops_accounting():
    app = get("hgemm")(M=128, N=96, K=64)
    assert app.flops == 2.0 * 128 * 96 * 64 + 3.0 * 128 * 96
    assert app.flops_dtype == "bf16"
    from halide_tpu.target import mxu_peak_tflops
    assert mxu_peak_tflops("bf16", "v5e") == 197.0
    assert mxu_peak_tflops("f32", "v5e") == pytest.approx(197.0 / 6)


def test_sgemv():
    check("sgemv", M=64, N=128)


def test_saxpy():
    check("saxpy", N=1000)


def test_sdot():
    check("sdot", N=4096)


def test_sscal_scopy():
    check("sscal_scopy", N=1000)


def test_sasum():
    check("sasum", N=4096)


def test_sger():
    check("sger", M=64, N=96)


def test_bgu():
    check("bgu", width=128, height=96)


def test_fft():
    check("fft", width=64, height=32)


def test_sgemm_transpose_variants():
    check("sgemm_tn", M=96, N=80, K=64)
    check("sgemm_nt", M=96, N=80, K=64)
    check("sgemm", M=64, N=64, K=48, transpose_A=True, transpose_B=True)


def test_dgemm_f64():
    check("dgemm", M=64, N=96, K=48)
