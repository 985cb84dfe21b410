import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolact_tpu.kernels.dcn import deform_conv2d


def ref_conv(x, w, b, stride=1, padding=1, dilation=1):
    """Plain conv via lax for comparison (NHWC/HWIO)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return out + b


def test_zero_offset_is_half_conv(rng):
    """DCN with zero offsets and zero mask logits == 0.5 * standard conv.

    The YOLACT++ init zeroes conv_offset_mask so sigmoid(mask)=0.5 and all
    taps sample on-grid (reference test: external/DCNv2/test.py:32-67
    check_zero_offset, adapted for the modulated form).
    """
    B, H, W, Cin, Cout, K = 2, 9, 9, 4, 6, 3
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)
    w = jnp.asarray(rng.randn(K, K, Cin, Cout) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(Cout), jnp.float32)
    offset = jnp.zeros((B, H, W, 2 * K * K))
    mask = jnp.full((B, H, W, K * K), 0.5)

    got = deform_conv2d(x, offset, mask, w, b, stride=1, padding=1)
    want = 0.5 * (ref_conv(x, w, jnp.zeros_like(b))) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_zero_offset_full_mask_is_conv(rng):
    B, H, W, Cin, Cout, K = 1, 7, 7, 3, 5, 3
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)
    w = jnp.asarray(rng.randn(K, K, Cin, Cout) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(Cout), jnp.float32)
    offset = jnp.zeros((B, H, W, 2 * K * K))
    mask = jnp.ones((B, H, W, K * K))
    got = deform_conv2d(x, offset, mask, w, b)
    want = ref_conv(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_integer_offset_shifts_sampling(rng):
    """A (+1, 0) offset on every tap equals sampling the row below."""
    B, H, W, Cin, Cout, K = 1, 8, 8, 2, 3, 3
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)
    w = jnp.asarray(rng.randn(K, K, Cin, Cout) * 0.2, jnp.float32)
    b = jnp.zeros(Cout, jnp.float32)
    offset = np.zeros((B, H, W, 2 * K * K), np.float32)
    offset[..., 0::2] = 1.0  # dy = +1 for every tap
    mask = jnp.ones((B, H, W, K * K))
    got = deform_conv2d(x, jnp.asarray(offset), mask, w, b)

    # shifting the input up one row gives the same result except at the TOP
    # output row, where the deform version samples real row 0 but the plain
    # conv sees zero padding
    x_shift = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
    want = ref_conv(x_shift, w, b)
    np.testing.assert_allclose(np.asarray(got)[:, 1:], np.asarray(want)[:, 1:],
                               atol=1e-4)


def test_stride_2(rng):
    B, H, W, Cin, Cout, K = 1, 10, 10, 3, 4, 3
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)
    w = jnp.asarray(rng.randn(K, K, Cin, Cout) * 0.2, jnp.float32)
    b = jnp.asarray(rng.randn(Cout), jnp.float32)
    Ho = Wo = (10 + 2 - 3) // 2 + 1
    offset = jnp.zeros((B, Ho, Wo, 2 * K * K))
    mask = jnp.ones((B, Ho, Wo, K * K))
    got = deform_conv2d(x, offset, mask, w, b, stride=2, padding=1)
    want = ref_conv(x, w, b, stride=2)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize('stride,padding,dilation',
                         [(1, 1, 1),   # plain DCN block
                          (2, 1, 1),   # stride-2 downsample block
                          (1, 2, 2)])  # atrous block (Bottleneck passes
                                       # padding == dilation, resnet.py)
def test_far_oob_offsets_exact(rng, stride, padding, dilation):
    """Offsets far outside the image (|off| >> H) must contribute exactly
    zero: the slice-gather formulation clips gather starts, which shifts
    the fetched 2x2 block — every corner a shifted block could misread
    must be zero-weighted.  Brute-force numpy bilinear reference
    (dcn_v2_im2col_cuda.cu:25-54 semantics: OOB corners contribute 0),
    covering every (stride, padding, dilation) combination the backbone
    instantiates."""
    B, H, W, Cin, Cout, K = 1, 6, 7, 3, 2, 3
    Ho = (H + 2 * padding - dilation * (K - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (K - 1) - 1) // stride + 1
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    w = (rng.randn(K, K, Cin, Cout) * 0.2).astype(np.float32)
    # mix of tiny, fractional, near-edge and far-OOB offsets
    offset = (rng.randn(B, Ho, Wo, 2 * K * K) *
              rng.choice([0.3, 2.0, 50.0],
                         size=(B, Ho, Wo, 2 * K * K))).astype(np.float32)
    mask = rng.rand(B, Ho, Wo, K * K).astype(np.float32)

    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(w), None, stride=stride, padding=padding,
        dilation=dilation))

    def sample(b, y, xq, c):
        y0, x0 = int(np.floor(y)), int(np.floor(xq))
        v = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                yi, xi = y0 + dy, x0 + dx
                if 0 <= yi < H and 0 <= xi < W:
                    wy = (1 - abs(y - yi))
                    wx = (1 - abs(xq - xi))
                    v += x[b, yi, xi, c] * wy * wx
        return v

    want = np.zeros((B, Ho, Wo, Cout), np.float32)
    for b in range(B):
        for ho in range(Ho):
            for wo in range(Wo):
                for t in range(K * K):
                    kh, kw = divmod(t, K)
                    y = (ho * stride - padding + kh * dilation
                         + offset[b, ho, wo, 2 * t])
                    xq = (wo * stride - padding + kw * dilation
                          + offset[b, ho, wo, 2 * t + 1])
                    m = mask[b, ho, wo, t]
                    for c in range(Cin):
                        v = sample(b, y, xq, c) * m
                        want[b, ho, wo] += v * w[kh, kw, c]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_dcn_differentiable(rng):
    """Gradients flow through offsets/mask/weights (needed to train
    YOLACT++; reference: external/DCNv2 backward kernels)."""
    B, H, W, Cin, Cout, K = 1, 6, 6, 2, 2, 3
    x = jnp.asarray(rng.randn(B, H, W, Cin), jnp.float32)
    w = jnp.asarray(rng.randn(K, K, Cin, Cout) * 0.2, jnp.float32)
    offset = jnp.asarray(rng.randn(B, H, W, 2 * K * K) * 0.3, jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, K * K), jnp.float32)

    def f(off, m, wt):
        return jnp.sum(deform_conv2d(x, off, m, wt, None) ** 2)

    g_off, g_m, g_w = jax.grad(f, argnums=(0, 1, 2))(offset, mask, w)
    assert np.isfinite(np.asarray(g_off)).all()
    assert np.abs(np.asarray(g_off)).max() > 0
    assert np.abs(np.asarray(g_m)).max() > 0
    assert np.abs(np.asarray(g_w)).max() > 0


def test_yolact_plus_tiny_forward(rng):
    """yolact_plus topology (DCN backbone + maskiou) builds and runs."""
    from yolact_tpu.config import get_config
    from yolact_tpu.models.yolact import Yolact
    cfg = get_config('yolact_plus_resnet50')
    cfg = cfg.copy(
        max_size=128, num_classes=5,
        backbone=cfg.backbone.copy(args=((1, 1, 1, 1), (0, 1, 1, 1))),
        mask_proto_net=((8, 3, (('padding', 1),)), (None, -2, ()),
                        (8, 1, ())),
        extra_head_net=((16, 3, (('padding', 1),)),),
        maskiou_net=((8, 3, (('stride', 2),)),),
        fpn=cfg.fpn.copy(num_features=16))
    model = Yolact(cfg)
    x = jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert np.isfinite(np.asarray(out['loc'])).all()
    # 9 anchors/pos for plus configs (3 ars x 3 scales)
    from yolact_tpu.ops.anchors import num_priors
    assert out['loc'].shape[1] == num_priors(cfg)


def test_dcn_offset_conv_zero_initialized(rng):
    """conv_offset_mask must start at zero (weight AND bias) so the DCN
    begins life as a plain conv — dcn_v2.py:114-116 init_offset.  With
    xavier-random offsets, from-scratch yolact_plus training explodes
    within two steps at 550^2 b8 (measured on-chip 2026-08-17)."""
    import jax
    from yolact_tpu.models.resnet import DCNLayer

    layer = DCNLayer(features=8)
    v = layer.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 6, 4)))
    om = v['params']['conv_offset_mask']['conv']
    assert float(jnp.abs(om['kernel']).max()) == 0.0
    assert float(jnp.abs(om['bias']).max()) == 0.0
    # the deformable weight itself must NOT be zero (kaiming)
    assert float(jnp.abs(v['params']['weight']).max()) > 0.0



def test_dcn_backward_oracle_vs_reference(rng):
    """grad wrt EVERY input (x, offset, mask, weight) matches torch
    autograd through the reference-semantics transcription
    (_refutil.ref_dcn_v2_conv) — pins the custom VJP (block-gather
    forward + row-formulation backward, kernels/dcn.py) to the reference
    backward (external/DCNv2/src/cuda/dcn_v2_cuda.cu backward kernels)."""
    import torch
    from _refutil import ref_dcn_v2_conv

    B, H, W, Cin, Cout, K = 2, 7, 7, 4, 6, 3
    x = rng.randn(B, H, W, Cin).astype(np.float32)
    # offsets wide enough to exercise OOB corners (zero-weight path)
    off = (rng.randn(B, H, W, 2 * K * K) * 2.5).astype(np.float32)
    m = rng.rand(B, H, W, K * K).astype(np.float32)
    w = (rng.randn(K, K, Cin, Cout) * 0.2).astype(np.float32)

    from yolact_tpu.kernels.dcn import deform_conv2d

    def loss_jax(x_, off_, m_, w_):
        out = deform_conv2d(jnp.asarray(x_), jnp.asarray(off_),
                            jnp.asarray(m_), jnp.asarray(w_), None)
        return 0.5 * jnp.sum(out.astype(jnp.float32) ** 2)

    gx, goff, gm, gw = jax.grad(
        lambda a, b, c, d: loss_jax(a, b, c, d),
        argnums=(0, 1, 2, 3))(x, off, m, w)

    # torch side: NCHW / [B,2K²,Ho,Wo] / [B,K²,Ho,Wo] / OIHW layouts
    tx = torch.tensor(x.transpose(0, 3, 1, 2), requires_grad=True)
    toff = torch.tensor(off.transpose(0, 3, 1, 2), requires_grad=True)
    tm = torch.tensor(m.transpose(0, 3, 1, 2), requires_grad=True)
    tw = torch.tensor(w.transpose(3, 2, 0, 1), requires_grad=True)
    tb = torch.zeros(Cout)
    out = ref_dcn_v2_conv(tx, toff, tm, tw, tb, stride=1, padding=1)
    (0.5 * (out ** 2).sum()).backward()

    for got, want, name, tol in (
            (gx, tx.grad.numpy().transpose(0, 2, 3, 1), 'x', 2e-4),
            (goff, toff.grad.numpy().transpose(0, 2, 3, 1), 'offset', 2e-3),
            (gm, tm.grad.numpy().transpose(0, 2, 3, 1), 'mask', 2e-4),
            (gw, tw.grad.numpy().transpose(2, 3, 1, 0), 'weight', 2e-3)):
        got = np.asarray(got)
        scale = max(np.abs(want).max(), 1e-6)
        np.testing.assert_allclose(
            got, want, atol=tol * scale, rtol=0,
            err_msg=f'grad wrt {name} diverges from the reference backward')


def test_dcn_backward_avoids_block_scatter(rng):
    """Regression guard for the round-5 25x fix: the production
    _bilinear_gather's grad must lower through the row-formulation
    transpose (per-batch row scatters), NOT the raw block gather's
    duplicate-index [2,2,C]-block scatter-add, which XLA:TPU executes
    serially (~1.37 s for ONE 69² layer — NOTES.md round-5 table)."""
    import re
    from yolact_tpu.kernels.dcn import (_bilinear_gather,
                                        _bilinear_gather_block)
    B, H, W, C, N = 1, 6, 6, 8, 10
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    ys = jnp.asarray(rng.rand(B, N) * H, jnp.float32)
    xs = jnp.asarray(rng.rand(B, N) * W, jnp.float32)

    def lowered(fn):
        g = jax.grad(lambda x: jnp.sum(fn(x, ys, xs).astype(jnp.float32)
                                       ** 2))
        return jax.jit(g).lower(x).as_text()

    # the block transpose scatters [2,2,C] windows per flat sample:
    # update_window_dims = [1, 2, 3] with inserted_window_dims = [0];
    # the row transpose is a batch-windowed ROW scatter:
    # update_window_dims = [0, 2] (verified on both lowerings)
    pat = re.compile(r'scatter.*update_window_dims = \[1, 2, 3\]')

    def block_scatter_lines(text):
        return [ln for ln in text.splitlines() if pat.search(ln)]

    assert block_scatter_lines(lowered(_bilinear_gather_block)), \
        'control failed: the raw block grad no longer lowers to a block scatter'
    assert not block_scatter_lines(lowered(_bilinear_gather)), \
        'custom VJP regressed: production grad lowers to the serial block scatter'


def test_dcn_custom_vjp_matches_rows_autodiff(rng):
    """The hand-written custom VJP must agree with plain autodiff of the
    row formulation for EVERY cotangent path (x, ys, xs) — the in-repo
    cross-check next to the torch reference oracle."""
    from yolact_tpu.kernels.dcn import (_bilinear_gather,
                                        _bilinear_gather_rows)
    B, H, W, C, N = 2, 7, 5, 8, 20
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    # coordinates spanning in-bounds, fractional, and far-OOB
    ys = jnp.asarray(rng.randn(B, N) * 4.0 + 2.0, jnp.float32)
    xs = jnp.asarray(rng.randn(B, N) * 4.0 + 2.0, jnp.float32)
    g = jnp.asarray(rng.randn(B, N, C), jnp.float32)

    out_c, vjp_c = jax.vjp(_bilinear_gather, x, ys, xs)
    out_r, vjp_r = jax.vjp(_bilinear_gather_rows, x, ys, xs)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_r),
                               atol=1e-5)
    for got, want, name in zip(vjp_c(g), vjp_r(g), ('x', 'ys', 'xs')):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4,
            err_msg=f'custom VJP grad wrt {name} diverges from rows autodiff')
