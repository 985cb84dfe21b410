"""AOT export of the inference program (StableHLO via ``jax.export``).

The reference freezes its FPN with TorchScript for speed (``yolact.py:25-30``)
and has no whole-model deployment artifact.  The TPU-native equivalent is
stronger: the ENTIRE inference pipeline — device preprocess, backbone, FPN,
protonet, heads, softmax, NMS, mask assembly, (optional) maskiou rescoring —
is one jitted program, so it exports as one serialized StableHLO artifact
with the weights baked in as constants.  The artifact is self-contained:
loading it needs jax but none of this package's Python, and it can be lowered
for platforms the exporting host doesn't have (e.g. export for TPU from a
CPU box).

Artifact layout (one file, msgpack):
    {'meta': {config name, batch, height, width, platforms, version,
              preprocess, score_threshold},
     'blob': <jax.export serialization>}

Usage:
    from yolact_tpu.convert.export import export_inference, load_exported
    export_inference(cfg, variables, 'model.ystablehlo', batch_size=1)
    runner = load_exported('model.ystablehlo')
    out = runner(images)          # InferenceOutput-ordered tuple
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

EXPORT_VERSION = 1


def export_inference(cfg, variables: Dict, path: str,
                     batch_size: int = 1,
                     height: Optional[int] = None,
                     width: Optional[int] = None,
                     maskiou_variables: Optional[Dict] = None,
                     platforms: Optional[Sequence[str]] = None,
                     preprocess: bool = True,
                     score_threshold: float = 0.0) -> None:
    """Serialize the full inference pipeline for `batch_size` raw BGR
    frames of (height, width) — defaults to the config's square size.

    `platforms` defaults to the current backend; pass e.g. ('tpu', 'cpu')
    to produce an artifact runnable on both.
    """
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from jax import export as jax_export

    from yolact_tpu.infer import forward_and_detect, maybe_enable_stem_s2d
    from yolact_tpu.models.yolact import Yolact

    if preprocess:
        cfg = maybe_enable_stem_s2d(cfg)
    model = Yolact(cfg)
    h = height or cfg.max_size
    w = width or cfg.max_size

    def fn(images):
        out = forward_and_detect(cfg, model, variables, images,
                                 preprocess=preprocess,
                                 maskiou_variables=maskiou_variables,
                                 score_threshold=score_threshold)
        # NamedTuples don't round-trip through deserialized artifacts;
        # emit a plain tuple in InferenceOutput field order
        return tuple(x for x in out if x is not None)

    kwargs = {}
    if platforms is not None:
        kwargs['platforms'] = tuple(platforms)
    exp = jax_export.export(jax.jit(fn), **kwargs)(
        jnp.zeros((batch_size, h, w, 3), jnp.float32))

    meta = dict(config=cfg.name, batch=batch_size, height=h, width=w,
                platforms=list(exp.platforms), version=EXPORT_VERSION,
                preprocess=preprocess, score_threshold=score_threshold,
                has_mask_scores=bool(cfg.use_maskiou
                                     and maskiou_variables is not None),
                fields=['boxes', 'classes', 'scores', 'masks', 'valid'] +
                       (['mask_scores'] if cfg.use_maskiou
                        and maskiou_variables is not None else []))
    blob = serialization.msgpack_serialize(
        {'meta': meta, 'blob': np.frombuffer(exp.serialize(), np.uint8)})
    with open(path, 'wb') as f:
        f.write(blob)


class ExportedRunner:
    """Callable wrapper around a deserialized artifact."""

    def __init__(self, meta: dict, exported):
        self.meta = meta
        self._exported = exported

    def __call__(self, images) -> Tuple:
        import jax.numpy as jnp
        return self._exported.call(jnp.asarray(images, jnp.float32))


def load_exported(path: str) -> ExportedRunner:
    from flax import serialization
    from jax import export as jax_export

    with open(path, 'rb') as f:
        data = serialization.msgpack_restore(f.read())
    meta = {k: (v.item() if hasattr(v, 'item') else
                v.tolist() if hasattr(v, 'tolist') else v)
            for k, v in data['meta'].items()}
    exported = jax_export.deserialize(bytearray(data['blob'].tobytes()))
    return ExportedRunner(meta, exported)
