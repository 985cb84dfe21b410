"""Unpack a checkpoint (.pth or .ckpt) into a directory of .npy arrays for
inspection (equivalent of the reference ``scripts/unpack_statedict.py``).

Usage: python scripts/unpack_statedict.py <ckpt> <out_dir>
"""

import os
import sys

import numpy as np

sys.path.insert(0, '.')


def flatten(tree, prefix=''):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from flatten(v, f'{prefix}{k}.' if prefix or k else k)
        return
    yield prefix.rstrip('.'), tree


def main():
    path, out_dir = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    if path.endswith('.pth'):
        from yolact_tpu.convert.torch_import import load_pth
        items = load_pth(path).items()
    else:
        from flax import serialization
        with open(path, 'rb') as f:
            tree = serialization.msgpack_restore(f.read())
        items = flatten(tree)
    n = 0
    for k, v in items:
        np.save(os.path.join(out_dir, k.replace('/', '.') + '.npy'),
                np.asarray(v))
        n += 1
    print(f'unpacked {n} arrays -> {out_dir}')


if __name__ == '__main__':
    main()
