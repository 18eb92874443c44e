"""Golden tests for the long-tail op batch: signal ops (windows/DFT/STFT/
MelWeightMatrix), misc ops (EyeLike..Col2Im/RMSNormalization), RoiAlign.
References: numpy FFT, torch functional ops (F.fold for Col2Im), and a
scalar from-the-spec implementation for RoiAlign (torchvision absent)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from test_ops_golden import run_op, t2n

RTOL, ATOL = 1e-4, 1e-4


class TestWindows:
    @pytest.mark.parametrize("size", [8, 16, 400])
    def test_hann_periodic(self, size):
        got = run_op("HannWindow", [], opset=17,
                     initializers=[np.array(size, np.int64)])
        want = t2n(torch.hann_window(size, periodic=True))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_hann_symmetric(self):
        got = run_op("HannWindow", [], dict(periodic=0), opset=17,
                     initializers=[np.array(9, np.int64)])
        want = t2n(torch.hann_window(9, periodic=False))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_hamming(self):
        # ONNX Hamming uses a0=25/46 (not torch's 0.54); check formula.
        size = 16
        got = run_op("HammingWindow", [], opset=17,
                     initializers=[np.array(size, np.int64)])
        n = np.arange(size)
        a0 = 25.0 / 46.0
        want = a0 - (1 - a0) * np.cos(2 * np.pi * n / size)
        np.testing.assert_allclose(got, want.astype(np.float32), rtol=RTOL, atol=ATOL)

    def test_blackman(self):
        size = 32
        got = run_op("BlackmanWindow", [], opset=17,
                     initializers=[np.array(size, np.int64)])
        want = t2n(torch.blackman_window(size, periodic=True))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


class TestDFT:
    def test_real_forward(self, rng):
        x = rng.standard_normal((2, 32, 1)).astype(np.float32)
        got = run_op("DFT", [x], opset=17)
        want = np.fft.fft(x[..., 0], axis=1)
        np.testing.assert_allclose(got[..., 0], want.real, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(got[..., 1], want.imag, rtol=1e-3, atol=1e-3)

    def test_onesided(self, rng):
        x = rng.standard_normal((1, 16, 1)).astype(np.float32)
        got = run_op("DFT", [x], dict(onesided=1), opset=17)
        want = np.fft.rfft(x[..., 0], axis=1)
        assert got.shape == (1, 9, 2)
        np.testing.assert_allclose(got[..., 0], want.real, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(got[..., 1], want.imag, rtol=1e-3, atol=1e-3)

    def test_complex_inverse_roundtrip(self, rng):
        x = rng.standard_normal((1, 24, 2)).astype(np.float32)
        fwd = run_op("DFT", [x], opset=17)
        back = run_op("DFT", [fwd.astype(np.float32)], dict(inverse=1), opset=17)
        np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-3)

    def test_dft_length_pad(self, rng):
        x = rng.standard_normal((1, 10, 1)).astype(np.float32)
        got = run_op("DFT", [x], opset=17,
                     initializers=[np.array(16, np.int64)])
        want = np.fft.fft(x[..., 0], n=16, axis=1)
        assert got.shape == (1, 16, 2)
        np.testing.assert_allclose(got[..., 0], want.real, rtol=1e-3, atol=1e-3)


class TestSTFT:
    def test_vs_torch(self, rng):
        b, length, fl, step = 2, 256, 64, 32
        x = rng.standard_normal((b, length)).astype(np.float32)
        win = t2n(torch.hann_window(fl, periodic=True))
        got = run_op("STFT", [x[..., None]], opset=17,
                     initializers=[np.array(step, np.int64), win])
        want = torch.stft(torch.from_numpy(x), n_fft=fl, hop_length=step,
                          window=torch.from_numpy(win), center=False,
                          return_complex=True, onesided=True)
        want = want.numpy().transpose(0, 2, 1)  # (B, frames, bins)
        assert got.shape == want.shape + (2,)
        np.testing.assert_allclose(got[..., 0], want.real, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(got[..., 1], want.imag, rtol=1e-3, atol=1e-3)

    def test_no_window_twosided(self, rng):
        x = rng.standard_normal((1, 128)).astype(np.float32)
        got = run_op("STFT", [x[..., None]], dict(onesided=0), opset=17,
                     initializers=[np.array(32, np.int64), np.array([], np.float32),
                                   np.array(64, np.int64)])
        frames = (128 - 64) // 32 + 1
        assert got.shape == (1, frames, 64, 2)
        want = np.fft.fft(x[0, :64])
        np.testing.assert_allclose(got[0, 0, :, 0], want.real, rtol=1e-3, atol=1e-3)


class TestMelWeightMatrix:
    def test_properties(self):
        got = run_op("MelWeightMatrix", [], opset=17, initializers=[
            np.array(40, np.int64), np.array(512, np.int64),
            np.array(16000, np.int64), np.array(20.0, np.float32),
            np.array(8000.0, np.float32)])
        assert got.shape == (257, 40)
        assert got.min() >= 0.0 and got.max() <= 1.0
        # every mel filter has some support, triangles overlap neighbours
        assert (got.sum(axis=0) > 0).all()
        # each filter peaks once and decays on both sides (unimodal)
        peak = got.argmax(axis=0)
        assert (np.diff(peak) >= 0).all()  # centers increase with mel bin


class TestMisc:
    def test_eye_like(self, rng):
        x = rng.standard_normal((4, 6)).astype(np.float32)
        got = run_op("EyeLike", [x], dict(k=1))
        np.testing.assert_array_equal(got, np.eye(4, 6, k=1, dtype=np.float32))

    def test_hardmax(self, rng):
        x = rng.standard_normal((3, 7)).astype(np.float32)
        got = run_op("Hardmax", [x], opset=13)
        want = np.zeros_like(x)
        want[np.arange(3), x.argmax(1)] = 1
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("p", [1, 2])
    def test_lp_normalization(self, rng, p):
        x = rng.standard_normal((5, 8)).astype(np.float32)
        got = run_op("LpNormalization", [x], dict(axis=1, p=p))
        want = t2n(F.normalize(torch.from_numpy(x), p=p, dim=1))
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_mvn(self, rng):
        x = rng.standard_normal((2, 3, 5, 5)).astype(np.float32)
        got = run_op("MeanVarianceNormalization", [x])
        mean = x.mean(axis=(0, 2, 3), keepdims=True)
        std = x.std(axis=(0, 2, 3), keepdims=True)
        np.testing.assert_allclose(got, (x - mean) / std, rtol=1e-3, atol=1e-3)

    def test_bit_shift(self):
        x = np.array([1, 2, 4, 8], np.uint32)
        got = run_op("BitShift", [x, np.array([1, 1, 2, 2], np.uint32)],
                     dict(direction="LEFT"))
        np.testing.assert_array_equal(got, np.array([2, 4, 16, 32], np.uint32))
        got = run_op("BitShift", [x, np.array([1, 1, 2, 2], np.uint32)],
                     dict(direction="RIGHT"))
        np.testing.assert_array_equal(got, np.array([0, 1, 1, 2], np.uint32))

    def test_det(self, rng):
        x = rng.standard_normal((3, 4, 4)).astype(np.float32)
        got = run_op("Det", [x])
        np.testing.assert_allclose(got, np.linalg.det(x), rtol=1e-3, atol=1e-3)

    def test_reverse_sequence(self, rng):
        x = rng.standard_normal((6, 3, 2)).astype(np.float32)  # (T, B, F)
        lens = np.array([4, 6, 1], np.int64)
        got = run_op("ReverseSequence", [x, lens],
                     dict(time_axis=0, batch_axis=1), opset=13)
        want = x.copy()
        for b_ in range(3):
            want[:lens[b_], b_] = x[:lens[b_], b_][::-1]
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_reverse_sequence_batch_first(self, rng):
        x = rng.standard_normal((3, 6)).astype(np.float32)  # (B, T)
        lens = np.array([2, 5, 6], np.int64)
        got = run_op("ReverseSequence", [x, lens],
                     dict(time_axis=1, batch_axis=0), opset=13)
        want = x.copy()
        for b_ in range(3):
            want[b_, :lens[b_]] = x[b_, :lens[b_]][::-1]
        np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)

    def test_center_crop_pad(self, rng):
        x = rng.standard_normal((2, 10, 8)).astype(np.float32)
        got = run_op("CenterCropPad", [x], dict(axes=[1, 2]), opset=18,
                     initializers=[np.array([6, 12], np.int64)])
        assert got.shape == (2, 6, 12)
        np.testing.assert_allclose(got[:, :, 2:10], x[:, 2:8, :], rtol=RTOL)
        assert (got[:, :, :2] == 0).all() and (got[:, :, 10:] == 0).all()

    @pytest.mark.parametrize("stride,pad,dil", [(1, 0, 1), (2, 1, 1), (1, 1, 2)])
    def test_col2im_vs_fold(self, rng, stride, pad, dil):
        img_h = img_w = 8
        k = 3
        out_sz = (img_h + 2 * pad - dil * (k - 1) - 1) // stride + 1
        x = rng.standard_normal((2, 4 * k * k, out_sz * out_sz)).astype(np.float32)
        got = run_op("Col2Im", [x], dict(
            strides=[stride, stride], pads=[pad, pad, pad, pad],
            dilations=[dil, dil]), opset=18,
            initializers=[np.array([img_h, img_w], np.int64),
                          np.array([k, k], np.int64)])
        want = t2n(F.fold(torch.from_numpy(x), (img_h, img_w), (k, k),
                          dilation=dil, padding=pad, stride=stride))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_rms_normalization(self, rng):
        x = rng.standard_normal((2, 5, 16)).astype(np.float32)
        scale = rng.standard_normal(16).astype(np.float32)
        got = run_op("RMSNormalization", [x], dict(epsilon=1e-5), opset=23,
                     initializers=[scale])
        want = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-5) * scale
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_bernoulli_deterministic(self):
        p = np.full((1000,), 0.3, np.float32)
        got1 = run_op("Bernoulli", [p], dict(seed=7.0), opset=15)
        got2 = run_op("Bernoulli", [p], dict(seed=7.0), opset=15)
        np.testing.assert_array_equal(got1, got2)
        assert set(np.unique(got1)) <= {0.0, 1.0}
        assert 0.2 < got1.mean() < 0.4

    def test_multinomial(self):
        logits = np.log(np.array([[0.01, 0.98, 0.01]], np.float32))
        got = run_op("Multinomial", [logits], dict(sample_size=64), opset=13)
        assert got.shape == (1, 64) and got.dtype == np.int32
        assert (got == 1).mean() > 0.8


def _roi_align_ref(x, rois, bidx, out_h, out_w, scale, grid, half_pixel, mode):
    """Scalar from-the-spec RoiAlign (ONNX Operators.md) — independent of
    the vectorized lowering."""
    r = rois.shape[0]
    c, h, w = x.shape[1:]
    out = np.zeros((r, c, out_h, out_w), np.float32)
    off = 0.5 if half_pixel else 0.0
    for ri in range(r):
        img = x[bidx[ri]]
        sw, sh = rois[ri, 0] * scale - off, rois[ri, 1] * scale - off
        ew, eh = rois[ri, 2] * scale - off, rois[ri, 3] * scale - off
        rw, rh = ew - sw, eh - sh
        if not half_pixel:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bh, bw = rh / out_h, rw / out_w
        for ph in range(out_h):
            for pw in range(out_w):
                vals = []
                for iy in range(grid):
                    for ix in range(grid):
                        y = sh + ph * bh + (iy + 0.5) * bh / grid
                        xx = sw + pw * bw + (ix + 0.5) * bw / grid
                        if y < -1.0 or y > h or xx < -1.0 or xx > w:
                            vals.append(np.zeros(c, np.float32))
                            continue
                        y = min(max(y, 0.0), h - 1)
                        xx = min(max(xx, 0.0), w - 1)
                        y0, x0 = int(np.floor(y)), int(np.floor(xx))
                        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                        ly, lx = y - y0, xx - x0
                        vals.append((1 - ly) * (1 - lx) * img[:, y0, x0]
                                    + (1 - ly) * lx * img[:, y0, x1]
                                    + ly * (1 - lx) * img[:, y1, x0]
                                    + ly * lx * img[:, y1, x1])
                v = np.stack(vals)
                out[ri, :, ph, pw] = v.max(0) if mode == "max" else v.mean(0)
    return out


class TestRoiAlign:
    @pytest.mark.parametrize("mode", ["avg", "max"])
    def test_half_pixel(self, rng, mode):
        x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
        rois = np.array([[1.0, 1.0, 10.0, 12.0], [0.0, 0.0, 15.0, 15.0],
                         [4.5, 3.25, 7.75, 9.5]], np.float32)
        bidx = np.array([0, 1, 0], np.int64)
        got = run_op("RoiAlign", [x, rois, bidx], dict(
            output_height=4, output_width=4, sampling_ratio=2,
            spatial_scale=1.0, mode=mode,
            coordinate_transformation_mode="half_pixel"), opset=16)
        want = _roi_align_ref(x, rois, bidx, 4, 4, 1.0, 2, True, mode)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    def test_output_half_pixel_scaled(self, rng):
        x = rng.standard_normal((1, 2, 12, 12)).astype(np.float32)
        rois = np.array([[2.0, 2.0, 20.0, 22.0]], np.float32)
        bidx = np.array([0], np.int64)
        got = run_op("RoiAlign", [x, rois, bidx], dict(
            output_height=3, output_width=5, sampling_ratio=1,
            spatial_scale=0.5, mode="avg",
            coordinate_transformation_mode="output_half_pixel"), opset=16)
        want = _roi_align_ref(x, rois, bidx, 3, 5, 0.5, 1, False, "avg")
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


class TestDFTOpset20:
    def test_axis_as_input(self, rng):
        """Opset 20 moved axis from attribute to input 3."""
        x = rng.standard_normal((2, 4, 16, 1)).astype(np.float32)
        got = run_op("DFT", [x], opset=20,
                     initializers=[np.array([], np.int64),  # dft_length absent
                                   np.array(2, np.int64)])  # axis input
        want = np.fft.fft(x[..., 0], axis=2)
        np.testing.assert_allclose(got[..., 0], want.real, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(got[..., 1], want.imag, rtol=1e-3, atol=1e-3)

    def test_complex_stft_signal(self, rng):
        """STFT over a complex (trailing-dim-2) signal."""
        x = rng.standard_normal((1, 64, 2)).astype(np.float32)
        got = run_op("STFT", [x], dict(onesided=0), opset=17,
                     initializers=[np.array(16, np.int64),
                                   np.array([], np.float32),
                                   np.array(32, np.int64)])
        want = np.fft.fft(x[0, :32, 0] + 1j * x[0, :32, 1])
        np.testing.assert_allclose(got[0, 0, :, 0], want.real, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(got[0, 0, :, 1], want.imag, rtol=1e-3, atol=1e-3)


class TestSplitNumOutputs:
    def test_uneven_split_opset18(self, rng):
        """num_outputs with non-divisible dim: ceil chunks, smaller last."""
        x = np.arange(10, dtype=np.float32)
        got = run_op("Split", [x], dict(num_outputs=3, axis=0), opset=18,
                     n_outputs=3)
        np.testing.assert_array_equal(got[0], [0, 1, 2, 3])
        np.testing.assert_array_equal(got[1], [4, 5, 6, 7])
        np.testing.assert_array_equal(got[2], [8, 9])

    def test_even_split_unchanged(self, rng):
        x = rng.standard_normal((6, 4)).astype(np.float32)
        got = run_op("Split", [x], dict(axis=0), opset=13, n_outputs=3)
        np.testing.assert_allclose(got[1], x[2:4])


class TestIndexingOps:
    """Golden coverage for registered-but-previously-untested tensor ops."""

    def test_einsum_matmul(self, rng):
        a = rng.standard_normal((2, 3, 4)).astype(np.float32)
        b_ = rng.standard_normal((2, 4, 5)).astype(np.float32)
        got = run_op("Einsum", [a, b_], dict(equation="bij,bjk->bik"), opset=12)
        np.testing.assert_allclose(got, np.einsum("bij,bjk->bik", a, b_),
                                   rtol=1e-4, atol=1e-5)

    def test_einsum_transpose_sum(self, rng):
        a = rng.standard_normal((3, 5)).astype(np.float32)
        got = run_op("Einsum", [a], dict(equation="ij->ji"), opset=12)
        np.testing.assert_allclose(got, a.T, rtol=1e-6)

    def test_scatter_nd(self, rng):
        data = rng.standard_normal((4, 4)).astype(np.float32)
        indices = np.array([[0], [2]], np.int64)
        updates = rng.standard_normal((2, 4)).astype(np.float32)
        got = run_op("ScatterND", [data, indices, updates], opset=13)
        want = data.copy()
        want[0] = updates[0]
        want[2] = updates[1]
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_gather_nd(self, rng):
        data = rng.standard_normal((2, 3, 4)).astype(np.float32)
        indices = np.array([[0, 1], [1, 2]], np.int64)
        got = run_op("GatherND", [data, indices], opset=13)
        np.testing.assert_allclose(got, np.stack([data[0, 1], data[1, 2]]),
                                   rtol=1e-6)

    def test_one_hot(self):
        idx = np.array([0, 2, -1], np.int64)  # negative wraps per spec
        got = run_op("OneHot", [idx], dict(axis=-1), opset=11,
                     initializers=[np.array(4, np.int64),
                                   np.array([0.0, 1.0], np.float32)])
        want = np.zeros((3, 4), np.float32)
        want[0, 0] = want[1, 2] = want[2, 3] = 1
        np.testing.assert_allclose(got, want)

    @pytest.mark.parametrize("upper,k", [(1, 0), (0, 0), (1, 1), (0, -1)])
    def test_trilu(self, rng, upper, k):
        x = rng.standard_normal((4, 5)).astype(np.float32)
        got = run_op("Trilu", [x], dict(upper=upper), opset=14,
                     initializers=[np.array(k, np.int64)])
        want = np.triu(x, k) if upper else np.tril(x, k)
        np.testing.assert_allclose(got, want)

    def test_scatter_elements_add(self, rng):
        data = np.zeros((3, 4), np.float32)
        idx = np.array([[1, 0], [0, 2]], np.int64)
        upd = np.array([[1.0, 2.0], [3.0, 4.0]], np.float32)
        got = run_op("ScatterElements", [data, idx, upd],
                     dict(axis=1, reduction="add"), opset=16)
        want = data.copy()
        for i in range(2):
            for j in range(2):
                want[i, idx[i, j]] += upd[i, j]
        np.testing.assert_allclose(got, want)


class TestAuditedOps:
    """Regression tests from the registered-but-untested op audit (these
    four were real bugs: CumSum exclusive+reverse, Mod fmod, logsumexp
    overflow, ArgMin select_last_index)."""

    @pytest.mark.parametrize("ex,rev", [(0, 0), (0, 1), (1, 0), (1, 1)])
    def test_cumsum_modes(self, ex, rev):
        x = np.arange(1, 7, dtype=np.float32)
        ref = x[::-1] if rev else x
        y = np.cumsum(ref)
        if ex:
            y = np.concatenate([[0], y[:-1]])
        if rev:
            y = y[::-1]
        got = run_op("CumSum", [x], dict(exclusive=ex, reverse=rev), opset=14,
                     initializers=[np.array(0, np.int64)])
        np.testing.assert_allclose(got, y, rtol=1e-6)

    def test_mod_integer_and_fmod(self):
        got = run_op("Mod", [np.array([-7, 7], np.int32),
                             np.array([3, -3], np.int32)], opset=13)
        np.testing.assert_array_equal(got, [2, -2])  # divisor sign
        got = run_op("Mod", [np.array([-7.5, 7.5], np.float32),
                             np.array([3.0, -3.0], np.float32)],
                     dict(fmod=1), opset=13)
        np.testing.assert_allclose(got, [-1.5, 1.5])  # dividend sign

    def test_reduce_logsumexp_stable(self):
        got = run_op("ReduceLogSumExp",
                     [np.array([1000.0, 1000.0], np.float32)], dict(axes=[0]))
        np.testing.assert_allclose(got, [1000.0 + np.log(2.0)], rtol=1e-5)

    def test_argmin_select_last(self):
        got = run_op("ArgMin", [np.array([3.0, 1.0, 1.0], np.float32)],
                     dict(axis=0, keepdims=0, select_last_index=1), opset=13)
        assert got == 2


class TestTrivialOpSpotChecks:
    """Audit sweep leftovers: one-line ops checked against numpy/torch so
    every registered op has at least one direct test."""

    def test_elementwise_batch(self):
        np.testing.assert_allclose(
            run_op("Round", [np.array([0.5, 1.5, 2.5, -0.5], np.float32)],
                   opset=11), [0.0, 2.0, 2.0, -0.0])  # half-to-even
        np.testing.assert_allclose(
            run_op("Sign", [np.array([-3.0, 0.0, 7.0], np.float32)], opset=9),
            [-1, 0, 1])
        np.testing.assert_allclose(
            run_op("Reciprocal", [np.array([2.0, -4.0], np.float32)]),
            [0.5, -0.25])
        np.testing.assert_array_equal(
            run_op("Not", [np.array([True, False])]), [False, True])
        np.testing.assert_array_equal(
            run_op("Equal", [np.array([1, 2], np.int32),
                             np.array([1, 3], np.int32)], opset=11),
            [True, False])

    def test_variadic_and_norms(self):
        np.testing.assert_allclose(
            run_op("Sum", [np.ones(2, np.float32)] * 3), [3.0, 3.0])
        np.testing.assert_allclose(
            run_op("Min", [np.array([3.0, 1.0], np.float32),
                           np.array([2.0, 5.0], np.float32)]), [2.0, 1.0])
        np.testing.assert_allclose(
            run_op("ReduceL2", [np.array([3.0, 4.0], np.float32)],
                   dict(axes=[0])), [5.0])
        np.testing.assert_allclose(
            run_op("ReduceSumSquare", [np.array([2.0, 3.0], np.float32)],
                   dict(axes=[0])), [13.0])
        np.testing.assert_allclose(
            run_op("ReduceL1", [np.array([-2.0, 3.0], np.float32)],
                   dict(axes=[0])), [5.0])

    def test_group_norm_vs_torch(self, rng):
        x = rng.standard_normal((2, 4, 3, 3)).astype(np.float32)
        got = run_op("GroupNormalization", [x],
                     dict(num_groups=2, epsilon=1e-5),
                     initializers=[np.ones(4, np.float32),
                                   np.zeros(4, np.float32)], opset=18)
        want = F.group_norm(torch.from_numpy(x), 2).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
