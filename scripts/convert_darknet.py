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
        sub = prefix if prefix == '_preconv' else prefix
        def take(n):
            nonlocal pos
            v = data[pos:pos + n]
            pos += n
            return v
        sd[f'{sub}.1.bias'] = take(out_ch)
        sd[f'{sub}.1.weight'] = take(out_ch)
        sd[f'{sub}.1.running_mean'] = take(out_ch)
        sd[f'{sub}.1.running_var'] = take(out_ch)
        w = take(out_ch * in_ch * k * k).reshape(out_ch, in_ch, k, k)
        sd[f'{sub}.0.weight'] = w
    assert pos <= len(data), 'weight file too short'
    return sd


def main():
    src, out = sys.argv[1], sys.argv[2]
    if src.endswith('.h5'):
        import h5py  # gated: not in the base image
        with h5py.File(src, 'r') as f:
            sd = {k: np.array(v) for k, v in f.items()}
    else:
        sd = load_weights_binary(src)
    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, out)
    print(f'wrote {len(sd)} tensors -> {out}')


if __name__ == '__main__':
    main()
