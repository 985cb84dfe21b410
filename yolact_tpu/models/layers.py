"""Building-block layers shared by all YOLACT backbones and heads.

flax.linen modules in NHWC layout (the TPU-friendly layout: the channel dim
lands on the 128-lane axis so XLA tiles convs straight onto the MXU).

Semantics notes for checkpoint parity with the PyTorch reference:
  * Conv uses explicit symmetric integer padding like ``nn.Conv2d(padding=p)``.
  * BatchNorm keeps separate running statistics ("batch_stats" collection);
    inference always uses running stats, matching ``module.eval()``.
  * ``resize_bilinear`` reproduces ``F.interpolate(mode='bilinear',
    align_corners=False)`` (half-pixel centers) via ``jax.image.resize``.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC) to `size`, half-pixel centers.

    Matches torch ``F.interpolate(..., mode='bilinear', align_corners=False)``
    which is what the reference uses everywhere (yolact.py:333, FPN; proto
    upsample via InterpolateModule; output_utils.py:91).
    """
    if x.ndim == 4:
        shape = (x.shape[0], size[0], size[1], x.shape[3])
    elif x.ndim == 3:
        shape = (size[0], size[1], x.shape[2])
    else:
        raise ValueError(x.shape)
    return jax.image.resize(x, shape, method='linear')


class _KernelParam(nn.Module):
    """Bare kernel parameter at the same path nn.Conv would use
    (``<parent>/conv/kernel``), for alternate application schemes."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param('kernel', nn.initializers.xavier_uniform(),
                          self.shape)


def s2d_stem_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Rewrite a 7x7/s2/p3 kernel [7,7,Cin,Cout] (RGB input order) as the
    equivalent 4x4/s1 kernel [4,4,4*Cin,Cout] over a 2x2 space-to-depth
    input in RAW (BGR) channel order, channel layout ``(p*2+q)*Cin + c``.
    Derivation: output tap a = 2m + p - 1 (a in [-1,6] covers the 7 taps
    for m in [0,4), p in {0,1}); out-of-range taps are zero."""
    K, _, cin, cout = w.shape
    if K != 7:
        raise NotImplementedError('s2d stem assumes a 7x7/s2/p3 conv')
    w = w[:, :, ::-1, :]                      # fold BGR->RGB into weights
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))  # index a+1, a>=-1
    wp = wp.reshape(4, 2, 4, 2, cin, cout)    # [m, p, n, q, cin, cout]
    wp = wp.transpose(0, 2, 1, 3, 4, 5)       # [m, n, p, q, cin, cout]
    return wp.reshape(4, 4, 4 * cin, cout)


def s2d_eye_kernel(cin: int = 3, from_rgb: bool = False) -> np.ndarray:
    """[2,2,cin,4*cin] one-hot kernel implementing 2x2 space-to-depth with
    output channel layout ``(p*2+q)*cin + c`` — THE s2d contract shared by
    :func:`s2d_input`, :func:`s2d_stem_kernel` and the fused device
    preprocess (infer.preprocess_device_s2d).  ``from_rgb`` permutes the
    channel column so an RGB input lands in raw (BGR) order for free."""
    eye = np.zeros((2, 2, cin, 4 * cin), np.float32)
    for p in (0, 1):
        for q in (0, 1):
            for c in range(cin):
                out_c = (cin - 1 - c) if from_rgb else c
                eye[p, q, c, (p * 2 + q) * cin + out_c] = 1.0
    return eye


def s2d_input(img: jnp.ndarray, from_rgb: bool = False) -> jnp.ndarray:
    """[B,H,W,3] -> 2x2 space-to-depth [B,H/2,W/2,12] in RAW (BGR) channel
    order (the stem conv's contract), via a one-hot stride-2 conv — the
    MXU does the shuffle; a reshape+transpose materializes a slow 6-D
    copy.  ``from_rgb`` reorders an already-RGB input back to raw order
    for free (kernel column permutation)."""
    if img.shape[1] % 2 or img.shape[2] % 2:
        raise ValueError('s2d input needs even H and W')
    eye = s2d_eye_kernel(3, from_rgb=from_rgb)
    return jax.lax.conv_general_dilated(
        img, jnp.asarray(eye, img.dtype), (2, 2), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class Conv(nn.Module):
    """2D conv with torch-style integer padding, NHWC/HWIO.

    ``stem_s2d``: inference-only alternate application for the ResNet
    7x7/s2/p3 stem — the input is a 2x2 space-to-depth of the raw-order
    (BGR) image and the conv runs as 4x4/s1 with asymmetric padding
    (2,1); mathematically identical taps (see :func:`s2d_stem_kernel`),
    identical parameter shape/path, so checkpoints are unaffected.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    stem_s2d: bool = False
    kernel_init: Optional[Any] = None  # default: xavier_uniform

    @nn.compact
    def __call__(self, x):
        if self.stem_s2d:
            if (self.kernel_size, self.stride, self.padding,
                    self.dilation, self.use_bias) != (7, 2, 3, 1, False):
                raise NotImplementedError('stem_s2d supports 7x7/s2/p3')
            cin = x.shape[-1] // 4
            w = _KernelParam((7, 7, cin, self.features), name='conv')()
            w2 = s2d_stem_kernel(w)
            dt = self.dtype or x.dtype
            if os.environ.get('YOLACT_TPU_PALLAS_STEM'):
                # opt-in: 3x faster than the XLA conv at the op level, but
                # in-graph the custom-call's layout boundaries cost more
                # than the kernel saves — see kernels/stem.py docstring
                from yolact_tpu.kernels.stem import stem_conv_s2d
                return stem_conv_s2d(x.astype(dt), w2.astype(dt))
            # must stay identical to kernels/stem.py:_conv_xla — the
            # Pallas path's custom_vjp differentiates THAT formulation,
            # so an edit here must be mirrored there
            return jax.lax.conv_general_dilated(
                x.astype(dt), w2.astype(dt), (1, 1), ((2, 1), (2, 1)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        p = self.padding
        # xavier_uniform + zero bias matches the reference's init_weights
        # (yolact.py:492-547) for every non-backbone conv; backbone convs
        # are overwritten by pretrained weights anyway.
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=self.kernel_init or nn.initializers.xavier_uniform(),
            dtype=self.dtype,
            name='conv')(x)


class ConvTranspose(nn.Module):
    """Transposed conv mirroring ``nn.ConvTranspose2d`` shape semantics."""
    features: int
    kernel_size: int = 2
    stride: int = 2
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        # torch out = (in-1)*s - 2p + k ; flax transpose with padding
        # ((k-1-p, k-1-p),...) over dilated input reproduces it for the
        # configurations YOLACT uses (k=s=2, p=0).
        p = self.kernel_size - 1 - self.padding
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            dtype=self.dtype,
            transpose_kernel=True,
            name='conv')(x)


class BatchNorm(nn.Module):
    """BatchNorm2d equivalent. `train=True` uses batch statistics and updates
    running stats (torch momentum 0.1); `train=False` uses running stats."""
    momentum: float = 0.9  # flax convention: ra = momentum*ra + (1-m)*batch
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            name='bn')(x)


class GroupNorm(nn.Module):
    num_groups: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                            dtype=self.dtype, name='gn')(x)


def max_pool(x: jnp.ndarray, kernel: int, stride: int, padding: int = 0,
             ceil_mode: bool = False) -> jnp.ndarray:
    """torch-style max pool (pads with -inf; floor or ceil output size)."""
    pads = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    if ceil_mode:
        # add extra right/bottom padding so the window count rounds up
        h, w = x.shape[1], x.shape[2]
        def extra(size):
            num = size + 2 * padding - kernel
            return (-num) % stride if num % stride else 0
        pads[1] = (padding, padding + extra(h))
        pads[2] = (padding, padding + extra(w))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads)


class InterpolateModule(nn.Module):
    """Bilinear scale-by-factor layer (reference ``layers/interpolate.py``)."""
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1] * self.scale_factor, x.shape[2] * self.scale_factor
        return resize_bilinear(x, (h, w))


class SpecNet(nn.Module):
    """Interpreter for make_net-style layer specs.

    Builds the conv / deconv / upsample / ReLU chain described by a tuple of
    ``(channels, kernel, kwargs)`` entries — the same mini-language the
    reference's ``make_net`` (``utils/functions.py:163-213``) interprets —
    with a ReLU after every layer, optionally excluding the last.
    Sub-layer names are `layers_{i}` where i is the index in the *expanded*
    (layer, relu) sequence, matching torch's nn.Sequential numbering so the
    checkpoint converter can map names 1:1.
    """
    spec: Tuple[Tuple[Any, ...], ...]
    include_last_relu: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        seq_idx = 0
        layers = []  # (name_idx, kind, module/None)
        for entry in self.spec:
            num, k = entry[0], entry[1]
            kw = dict(entry[2]) if len(entry) > 2 else {}
            if isinstance(num, str):
                if num != 'cat':
                    raise NotImplementedError(num)
                # parallel sub-networks concatenated on channels
                # (utils/functions.py:179-183 'cat' token)
                layers.append((seq_idx, 'cat', tuple(k)))
                seq_idx += 1
                layers.append((seq_idx, 'relu', None))
                seq_idx += 1
                continue
            if k > 0:
                layers.append((seq_idx, 'conv', dict(
                    features=num, kernel_size=k,
                    stride=kw.get('stride', 1),
                    padding=kw.get('padding', 0),
                    dilation=kw.get('dilation', 1))))
            elif num is None:
                layers.append((seq_idx, 'interp', dict(scale_factor=-k)))
            else:
                layers.append((seq_idx, 'deconv', dict(
                    features=num, kernel_size=-k,
                    # torch ConvTranspose2d defaults stride to 1
                    # (reference make_net, utils/functions.py:196)
                    stride=kw.get('stride', 1),
                    padding=kw.get('padding', 0))))
            seq_idx += 1
            layers.append((seq_idx, 'relu', None))
            seq_idx += 1

        if not self.include_last_relu and layers and layers[-1][1] == 'relu':
            layers = layers[:-1]

        for idx, kind, kw in layers:
            if kind == 'conv':
                x = Conv(dtype=self.dtype, name=f'layers_{idx}', **kw)(x)
            elif kind == 'deconv':
                x = ConvTranspose(dtype=self.dtype, name=f'layers_{idx}', **kw)(x)
            elif kind == 'interp':
                x = InterpolateModule(name=f'layers_{idx}', **kw)(x)
            elif kind == 'cat':
                outs = [SpecNet(sub, include_last_relu=True, dtype=self.dtype,
                                name=f'layers_{idx}_cat_{i}')(x)
                        for i, sub in enumerate(kw)]
                x = jnp.concatenate(outs, axis=-1)
            else:
                x = jax.nn.relu(x)
        return x
