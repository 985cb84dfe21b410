"""Convert darknet53 weights (h5 or .weights binary) into a torch-style
state dict compatible with our converter (equivalent of the reference
``scripts/convert_darknet.py``, which converts an h5 dump to .pth).

Usage: python scripts/convert_darknet.py <darknet53.h5|.weights> <out.pth>
"""

import sys

import numpy as np

sys.path.insert(0, '.')

# (stage, blocks) layout of darknet53 (backbone.py:252-283)
LAYERS = (1, 2, 8, 8, 4)
CHANNELS = (32, 64, 128, 256, 512)


def conv_names():
    """Yields (torch_key_prefix, out_ch, in_ch, k) in darknet file order."""
    yield '_preconv', 32, 3, 3
    in_ch = 32
    for si, (ch, n) in enumerate(zip(CHANNELS, LAYERS)):
        yield f'layers.{si}.0', ch * 2, in_ch, 3
        in_ch = ch * 2
        for bi in range(n):
            yield f'layers.{si}.{bi + 1}.conv1', ch, in_ch, 1
            yield f'layers.{si}.{bi + 1}.conv2', in_ch, ch, 3


def load_weights_binary(path):
    """Official .weights format: int32 header (5), then per conv:
    bn_bias, bn_weight, bn_mean, bn_var, conv_weight."""
    with open(path, 'rb') as f:
        np.fromfile(f, np.int32, 5)
        data = np.fromfile(f, np.float32)
    pos = 0
    sd = {}
    for prefix, out_ch, in_ch, k in conv_names():
        def take(n):
            nonlocal pos
            v = data[pos:pos + n]
            if len(v) < n:
                raise ValueError(
                    f'weight file too short at {prefix} '
                    f'(need {n} floats, have {len(v)})')
            pos += n
            return v
        sd[f'{prefix}.1.bias'] = take(out_ch)
        sd[f'{prefix}.1.weight'] = take(out_ch)
        sd[f'{prefix}.1.running_mean'] = take(out_ch)
        sd[f'{prefix}.1.running_var'] = take(out_ch)
        w = take(out_ch * in_ch * k * k).reshape(out_ch, in_ch, k, k)
        sd[f'{prefix}.0.weight'] = w
    if pos != len(data):
        # a yolov3.weights (backbone + heads) parses the backbone cleanly
        # but leaves trailing tensors — refuse instead of silently
        # writing a .pth from the wrong file
        raise ValueError(
            f'{len(data) - pos} trailing floats after the darknet53 '
            'backbone — this is not a bare darknet53.weights file')
    return sd


def load_h5(path):
    """Keras h5 (the reference's input): conv2d_%d / batch_normalization_%d
    groups, enumerated against our torch key prefixes sorted
    lexicographically — the exact pairing the reference converter uses
    (scripts/convert_darknet.py; safe because darknet53 stages have <10
    blocks, as its own comment notes).  Kernels permute HWIO -> OIHW."""
    import h5py  # gated: not in the base image
    prefixes = sorted(p for p, _, _, _ in conv_names())
    sd = {}
    with h5py.File(path, 'r') as f:
        m = f['model_weights'] if 'model_weights' in f else f
        for i, prefix in enumerate(prefixes, 1):
            ck, bk = f'conv2d_{i}', f'batch_normalization_{i}'
            conv = m[ck][ck] if ck in m[ck] else m[ck]
            bn = m[bk][bk] if bk in m[bk] else m[bk]
            sd[f'{prefix}.0.weight'] = np.array(
                conv['kernel:0']).transpose(3, 2, 0, 1)
            sd[f'{prefix}.1.bias'] = np.array(bn['beta:0'])
            sd[f'{prefix}.1.weight'] = np.array(bn['gamma:0'])
            sd[f'{prefix}.1.running_mean'] = np.array(bn['moving_mean:0'])
            sd[f'{prefix}.1.running_var'] = np.array(
                bn['moving_variance:0'])
    return sd


def main():
    src, out = sys.argv[1], sys.argv[2]
    if src.endswith('.h5'):
        sd = load_h5(src)
    else:
        sd = load_weights_binary(src)
    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, out)
    print(f'wrote {len(sd)} tensors -> {out}')


if __name__ == '__main__':
    main()
