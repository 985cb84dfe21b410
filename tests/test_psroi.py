"""Deformable PSRoI pooling vs an independent scalar-loop numpy oracle.

The oracle below is written directly from the kernel semantics
(``dcn_v2_psroi_pooling_cuda.cu:58-146``); the reference ships no CPU
implementation (``src/cpu/dcn_v2_cpu.cpp:43-56`` raises), so the CUDA
code's documented algorithm is transcribed here as the test oracle.
Property tests mirror ``external/DCNv2/test.py:100-175``
(check_pooling_zero_offset / check_gradient_dpooling).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolact_tpu.kernels.psroi import DeformRoIPooling, deform_psroi_pool


def oracle_psroi(x_nhwc, rois, trans, spatial_scale, pooled_size,
                 output_dim, no_trans, group_size=1, part_size=None,
                 sample_per_part=4, trans_std=0.0):
    B, H, W, C = x_nhwc.shape
    N = rois.shape[0]
    P, S, G = pooled_size, sample_per_part, group_size
    part = P if part_size is None else part_size
    num_classes = 1 if no_trans else trans.shape[1] // 2
    cec = output_dim // num_classes
    out = np.zeros((N, output_dim, P, P), np.float64)
    tr = None if no_trans else trans.reshape(N, num_classes, 2, part, part)

    def bilin(img2d, y, x):
        x1, x2 = int(np.floor(x)), int(np.ceil(x))
        y1, y2 = int(np.floor(y)), int(np.ceil(y))
        dx, dy = x - x1, y - y1
        return ((1 - dx) * (1 - dy) * img2d[y1, x1]
                + (1 - dx) * dy * img2d[y2, x1]
                + dx * (1 - dy) * img2d[y1, x2]
                + dx * dy * img2d[y2, x2])

    for n in range(N):
        b = int(rois[n, 0])
        sw = round(float(rois[n, 1])) * spatial_scale - 0.5
        sh = round(float(rois[n, 2])) * spatial_scale - 0.5
        ew = (round(float(rois[n, 3])) + 1.0) * spatial_scale - 0.5
        eh = (round(float(rois[n, 4])) + 1.0) * spatial_scale - 0.5
        rw, rh = max(ew - sw, 0.1), max(eh - sh, 0.1)
        bw, bh = rw / P, rh / P
        sbw, sbh = bw / S, bh / S
        for ctop in range(output_dim):
            cls = ctop // cec
            for ph in range(P):
                for pw in range(P):
                    part_h = int(np.floor(ph / P * part))
                    part_w = int(np.floor(pw / P * part))
                    tx = 0.0 if no_trans else \
                        tr[n, cls, 0, part_h, part_w] * trans_std
                    ty = 0.0 if no_trans else \
                        tr[n, cls, 1, part_h, part_w] * trans_std
                    wst = pw * bw + sw + tx * rw
                    hst = ph * bh + sh + ty * rh
                    gw = min(max(int(np.floor(pw * G / P)), 0), G - 1)
                    gh = min(max(int(np.floor(ph * G / P)), 0), G - 1)
                    c = (ctop * G + gh) * G + gw
                    s, cnt = 0.0, 0
                    for ih in range(S):
                        for iw in range(S):
                            w = wst + iw * sbw
                            h = hst + ih * sbh
                            if w < -0.5 or w > W - 0.5 or \
                               h < -0.5 or h > H - 0.5:
                                continue
                            w = min(max(w, 0.0), W - 1.0)
                            h = min(max(h, 0.0), H - 1.0)
                            s += bilin(x_nhwc[b, :, :, c], h, w)
                            cnt += 1
                    out[n, ctop, ph, pw] = 0.0 if cnt == 0 else s / cnt
    return out


def _random_case(rng, B=2, H=13, W=11, output_dim=3, G=1, N=5,
                 num_classes=1, P=3):
    C = output_dim * G * G
    x = rng.randn(B, H, W, C).astype(np.float64)
    bi = rng.randint(0, B, (N, 1)).astype(np.float64)
    x1 = rng.rand(N, 1) * (W * 4 * 0.8)
    y1 = rng.rand(N, 1) * (H * 4 * 0.8)
    w = rng.rand(N, 1) * 20
    h = rng.rand(N, 1) * 20
    rois = np.concatenate([bi, x1, y1, x1 + w, y1 + h], 1)
    trans = rng.randn(N, 2 * num_classes, P, P).astype(np.float64)
    return x, rois, trans


@pytest.mark.parametrize('no_trans,G,trans_std',
                         [(True, 1, 0.0), (False, 1, 0.1),
                          (False, 2, 0.2), (True, 3, 0.0)])
def test_psroi_matches_oracle(rng, no_trans, G, trans_std):
    P = 3
    x, rois, trans = _random_case(rng, output_dim=4, G=G, P=P,
                                  num_classes=2 if not no_trans else 1)
    kw = dict(spatial_scale=0.25, pooled_size=P, output_dim=4,
              no_trans=no_trans, group_size=G, sample_per_part=4,
              trans_std=trans_std)
    want = oracle_psroi(x, rois, None if no_trans else trans, **kw)
    got = np.asarray(deform_psroi_pool(
        jnp.asarray(x), jnp.asarray(rois),
        None if no_trans else jnp.asarray(trans), **kw))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_psroi_zero_offset_constant_channels(rng):
    """test.py:100-131 semantics: pooling a channelwise-constant region
    returns those constants; zeroed trans equals no_trans."""
    x = np.zeros((2, 64, 64, 16), np.float32)
    x[0, 16:26, 16:26, :] = 1.0
    x[1, 10:20, 20:30, :] = 2.0
    rois = np.array([[0, 65, 65, 103, 103],
                     [1, 81, 41, 119, 79]], np.float32)
    kw = dict(spatial_scale=0.25, pooled_size=7, output_dim=16,
              group_size=1, trans_std=0.0)
    out = np.asarray(deform_psroi_pool(
        jnp.asarray(x), jnp.asarray(rois), None, no_trans=True, **kw))
    # interior bins sample entirely inside the constant square; boundary
    # bins bilinearly mix with the surrounding zeros (the reference test
    # only prints the means, test.py:117-120)
    np.testing.assert_allclose(out[0][:, 1:6, 1:6], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[1][:, 1:6, 1:6], 2.0, atol=1e-6)
    assert out[0].mean() > 0.9 and out[1].mean() > 1.8
    trans0 = jnp.zeros((2, 2, 7, 7), jnp.float32)
    out2 = np.asarray(deform_psroi_pool(
        jnp.asarray(x), jnp.asarray(rois), trans0, no_trans=False, **kw))
    np.testing.assert_allclose(out2, out, atol=0)


def test_psroi_gradients_match_numerical(rng):
    """check_gradient_dpooling (test.py:134-175) equivalent: autodiff
    grads for input and trans match central differences."""
    x, rois, trans = _random_case(rng, B=2, H=5, W=5, output_dim=3, N=4)
    x *= 0.01
    kw = dict(spatial_scale=0.25, pooled_size=3, output_dim=3,
              no_trans=False, group_size=1, sample_per_part=4,
              trans_std=0.3)

    def f(xa, ta):
        return jnp.sum(deform_psroi_pool(xa, jnp.asarray(rois), ta, **kw)
                       * jnp.asarray(cotan))

    cotan = rng.randn(4, 3, 3, 3)
    gx, gt = jax.grad(f, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(trans))
    eps = 1e-3  # f32 central differences; rtol below absorbs the noise
    for arr, g, ix in ((x, gx, (1, 2, 3, 1)), (x, gx, (0, 4, 0, 2)),
                       (trans, gt, (2, 1, 1, 0)), (trans, gt, (0, 0, 2, 2))):
        ap, am = arr.copy(), arr.copy()
        ap[ix] += eps
        am[ix] -= eps
        if arr is x:
            num = (f(jnp.asarray(ap), jnp.asarray(trans))
                   - f(jnp.asarray(am), jnp.asarray(trans))) / (2 * eps)
        else:
            num = (f(jnp.asarray(x), jnp.asarray(ap))
                   - f(jnp.asarray(x), jnp.asarray(am))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[ix]), float(num),
                                   rtol=5e-3, atol=1e-4)


def test_deform_roi_pooling_module(rng):
    """Zero-init final FC => offset 0, mask sigmoid(0)=0.5: the module's
    initial output is exactly 0.5 * plain PSRoI pooling
    (dcn_v2.py:256-257, 280-293)."""
    x, rois, _ = _random_case(rng, output_dim=4, P=3)
    x = x.astype(np.float32)
    mod = DeformRoIPooling(spatial_scale=0.25, pooled_size=3, output_dim=4,
                           no_trans=False, trans_std=0.1, deform_fc_dim=32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(rois))
    out = np.asarray(mod.apply(variables, jnp.asarray(x),
                               jnp.asarray(rois)))
    plain = np.asarray(deform_psroi_pool(
        jnp.asarray(x), jnp.asarray(rois), None, spatial_scale=0.25,
        pooled_size=3, output_dim=4, no_trans=True, trans_std=0.1))
    np.testing.assert_allclose(out, 0.5 * plain, rtol=1e-5, atol=1e-6)
