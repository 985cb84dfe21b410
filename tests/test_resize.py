import numpy as np
import pytest

from yolact_tpu.ops.resize import resize_bilinear_torch

torch = pytest.importorskip('torch')


@pytest.mark.parametrize('in_size,out_size', [
    (128, 24), (138, 550), (69, 33), (17, 64), (55, 55)])
def test_matches_torch_bilinear(rng, in_size, out_size):
    x = rng.rand(3, in_size, in_size).astype(np.float32)
    import torch.nn.functional as F
    want = F.interpolate(torch.from_numpy(x)[None], (out_size, out_size),
                         mode='bilinear', align_corners=False)[0].numpy()
    got = np.asarray(resize_bilinear_torch(x, (out_size, out_size)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_jax_image_upsample_matches_torch(rng):
    """Upsampling (no antialias effect): jax.image.resize == torch bilinear.
    This is the path used by FPN top-down and protonet upsample."""
    import jax.image
    import torch.nn.functional as F
    x = rng.rand(1, 18, 18, 4).astype(np.float32)
    want = F.interpolate(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                         (35, 35), mode='bilinear',
                         align_corners=False).numpy()
    got = np.asarray(jax.image.resize(x, (1, 35, 35, 4), method='linear'))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                               atol=1e-5)
