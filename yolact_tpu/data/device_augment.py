"""Device-side SSD augmentation — the training-time FastBaseTransform.

The reference augments on the host in numpy/cv2 (``utils/augmentations.py``);
on this class of host that costs ~130 ms/image while the chip trains at
~12 ms/image, so the loader can never keep up.  This module runs the whole
geometric + photometric pipeline inside the jitted train step:

  photometric distort -> expand -> random-sample-crop -> resize -> mirror
  -> vertical flip -> rot90 (the last two gated by augment_random_flip,
  like the reference's flip-gates-rot90 quirk)

The geometric stages compose into ONE axis-aligned affine map per image
(scale+translate per axis, negative scale = mirror/flip), applied as a
single separable bilinear gather to the image and all gt masks — so the
device cost is two cheap gather passes regardless of how many stages
fired; rot90 is an exact post-warp axis swap (commutes with the resize
on a square canvas).
The host loader only decodes + resizes to the canonical S x S (~6 ms).

Semantics follow the reference's distributions:
  * brightness U(-32,32), contrast x U(0.5,1.5), saturation x U(0.5,1.5),
    hue +- 18 deg, each with p=1/2, contrast before-or-after HSV with p=1/2
    (``augmentations.py:504-525``);
  * expand: p=1/2, canvas ratio U(1,4), uniform placement (``:408-440``);
  * random-sample-crop: one of 6 modes (5/6 crop), 50 candidate windows of
    size U(0.3,1) x current canvas with aspect in [0.5,2], first candidate
    containing at least one non-crowd gt center wins, else no crop
    (``:279-405`` — including the upstream IoU-constraint bug, which makes
    the IoU thresholds no-ops, so they are omitted entirely);
  * gt whose centers leave the crop are dropped (marked as padding);
    degenerate boxes are dropped like the reference's discard step.

Deviation: the reference crops the ORIGINAL-resolution image and resizes
once at the end; here images are pre-resized to S x S, so crops resample an
S x S source (slightly softer for small crops).  The host pipeline
(`data/augmentations.py`) remains available as the bit-faithful path.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from yolact_tpu.config import MEANS, STD, MaskType, YolactConfig


# ---------------------------------------------------------------------------
# color: BGR [0,255] <-> HSV (cv2 full-range float convention: H in [0,360))
# ---------------------------------------------------------------------------

def bgr_to_hsv(img):
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        v == r, (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c))
    h = jnp.where(c > 0, h * 60.0, 0.0)
    h = jnp.where(h < 0, h + 360.0, h)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_bgr(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h = jnp.clip(h, 0.0, 360.0 - 1e-4) / 60.0
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([b, g, r], axis=-1)


def photometric_distort(rng, img):
    """img: [S, S, 3] BGR float [0,255].  augmentations.py:504-525."""
    ks = jax.random.split(rng, 10)

    def maybe(k, x, fn):
        return jnp.where(jax.random.bernoulli(k), fn(x), x)

    img = maybe(ks[0], img, lambda x: x + jax.random.uniform(
        ks[1], (), minval=-32.0, maxval=32.0))

    def contrast(k_flag, k_val, x):
        return maybe(k_flag, x, lambda y: y * jax.random.uniform(
            k_val, (), minval=0.5, maxval=1.5))

    def hsv_jitter(x):
        hsv = bgr_to_hsv(x)
        s_mul = jnp.where(jax.random.bernoulli(ks[4]),
                          jax.random.uniform(ks[5], (), minval=0.5,
                                             maxval=1.5), 1.0)
        h_add = jnp.where(jax.random.bernoulli(ks[6]),
                          jax.random.uniform(ks[7], (), minval=-18.0,
                                             maxval=18.0), 0.0)
        h = jnp.mod(hsv[..., 0] + h_add, 360.0)
        return hsv_to_bgr(jnp.stack([h, hsv[..., 1] * s_mul, hsv[..., 2]],
                                    axis=-1))

    first = jax.random.bernoulli(ks[8])
    img_a = hsv_jitter(contrast(ks[2], ks[3], img))     # contrast first
    img_b = contrast(ks[2], ks[3], hsv_jitter(img))     # contrast last
    return jnp.where(first, img_a, img_b)


# ---------------------------------------------------------------------------
# geometry: one affine (scale, translate) per axis, bilinear gather
# ---------------------------------------------------------------------------

def _axis_warp(x, scale, shift, size, axis, fill):
    """Sample x along `axis` at src = scale*i + shift (bilinear, `fill`
    outside)."""
    idx = jnp.arange(size, dtype=jnp.float32)
    src = scale * idx + shift
    x0 = jnp.floor(src)
    f = (src - x0)
    x0i = x0.astype(jnp.int32)
    valid0 = (x0i >= 0) & (x0i < size)
    valid1 = (x0i + 1 >= 0) & (x0i + 1 < size)
    c0 = jnp.clip(x0i, 0, size - 1)
    c1 = jnp.clip(x0i + 1, 0, size - 1)
    g0 = jnp.take(x, c0, axis=axis)
    g1 = jnp.take(x, c1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = size
    f = f.reshape(shape)
    v0 = valid0.reshape(shape)
    v1 = valid1.reshape(shape)
    out = (jnp.where(v0, g0, fill) * (1 - f) + jnp.where(v1, g1, fill) * f)
    return out


def affine_warp_image(img, sx, tx, sy, ty, fill):
    """img [S, S, C]; fill [C] (the channel means)."""
    S = img.shape[0]
    out = _axis_warp(img, sy, ty, S, 0, fill)
    return _axis_warp(out, sx, tx, S, 1, fill)


def affine_warp_masks(masks, sx, tx, sy, ty):
    """masks [G, S, S] float; zero fill; binarized by the caller/loss."""
    S = masks.shape[-1]
    out = _axis_warp(masks, sy, ty, S, 1, 0.0)
    return _axis_warp(out, sx, tx, S, 2, 0.0)


def device_augment(cfg: YolactConfig, batch: Dict, rng) -> Dict:
    """Augment a padded batch (see data.coco.pad_batch) on device.

    batch['image'] must be RAW BGR float [0,255] at [B, S, S, 3] (loader
    resize only); returns the batch with image normalized to the backbone's
    input space and gt adjusted, same shapes.
    """
    B, S = batch['image'].shape[0], batch['image'].shape[1]
    mean = jnp.asarray(MEANS, jnp.float32)

    # For lincomb+binarize configs the loss only consumes the gt masks
    # downsampled to proto (and seg) resolution; emit those directly from
    # the SOFT warped masks — the reference's exact order of operations
    # (soft downsample, then threshold: multibox_loss.py:515-523, 225-228).
    # Binarizing the full-res warp first (the old behavior) flips boundary
    # pixels, and the full-res [G, S, S] tensor never needs to materialize.
    emit_multires = (cfg.mask_type == MaskType.LINCOMB
                     and cfg.mask_proto_binarize_downsampled_gt)
    if emit_multires:
        from yolact_tpu.ops.anchors import proto_size, seg_size
        proto_hw = proto_size(cfg, S)
        seg_hw = seg_size(cfg, S) if cfg.use_semantic_segmentation_loss \
            else None

    def per_image(k, img, boxes, labels, masks):
        ks = jax.random.split(k, 13)
        if cfg.augment_photometric_distort:
            img = photometric_distort(ks[0], img)

        # ---- expand (augmentations.py:408-440) -----------------------
        if cfg.augment_expand:
            do_exp = jax.random.bernoulli(ks[1])
            ratio = jnp.where(do_exp,
                              jax.random.uniform(ks[2], (), minval=1.0,
                                                 maxval=4.0), 1.0)
            E = ratio * S
            left = jax.random.uniform(ks[3], (), maxval=1.0) * (E - S)
            top = jax.random.uniform(ks[4], (), maxval=1.0) * (E - S)
        else:
            ratio = jnp.float32(1.0)
            E = jnp.float32(S)
            left = jnp.float32(0.0)
            top = jnp.float32(0.0)

        # gt in canvas pixels
        bx = boxes * S
        bx = bx.at[:, 0::2].add(left)
        bx = bx.at[:, 1::2].add(top)

        # ---- random sample crop (augmentations.py:279-405) -----------
        if cfg.augment_random_sample_crop:
            N = 50
            do_crop = jax.random.uniform(ks[5], ()) < (5.0 / 6.0)
            cw = jax.random.uniform(ks[6], (N,), minval=0.3, maxval=1.0) * E
            ch = jax.random.uniform(ks[7], (N,), minval=0.3, maxval=1.0) * E
            cl = jax.random.uniform(ks[8], (N,), maxval=1.0) * (E - cw)
            ct = jax.random.uniform(ks[9], (N,), maxval=1.0) * (E - ch)
            # reference truncates the rect to ints
            cl, ct = jnp.floor(cl), jnp.floor(ct)
            cr = jnp.floor(cl + cw)
            cb = jnp.floor(ct + ch)
            ar_ok = (ch / jnp.maximum(cw, 1e-6) >= 0.5) & \
                    (ch / jnp.maximum(cw, 1e-6) <= 2.0)

            centers = (bx[:, :2] + bx[:, 2:]) / 2.0
            real = labels >= 0  # non-crowd, non-padding
            inside = ((cl[:, None] < centers[None, :, 0]) &
                      (ct[:, None] < centers[None, :, 1]) &
                      (cr[:, None] > centers[None, :, 0]) &
                      (cb[:, None] > centers[None, :, 1]))
            has_gt = jnp.any(inside & real[None, :], axis=1)
            cand_ok = ar_ok & has_gt
            any_ok = jnp.any(cand_ok) & do_crop
            pick = jnp.argmax(cand_ok)  # first valid candidate

            wl = jnp.where(any_ok, cl[pick], 0.0)
            wt = jnp.where(any_ok, ct[pick], 0.0)
            ww = jnp.where(any_ok, cr[pick] - cl[pick], E)
            wh = jnp.where(any_ok, cb[pick] - ct[pick], E)

            # crowd-or-real gt kept iff center inside the window
            keep_center = ((wl < centers[:, 0]) & (wt < centers[:, 1]) &
                           (wl + ww > centers[:, 0]) &
                           (wt + wh > centers[:, 1]))
            keep = jnp.where(any_ok, keep_center, labels > -2)
        else:
            wl = jnp.float32(0.0)
            wt = jnp.float32(0.0)
            ww = E
            wh = E
            keep = labels > -2

        # clamp gt to the window, then into window-relative coords
        bx = bx.at[:, 0::2].set(jnp.clip(bx[:, 0::2], wl, wl + ww) - wl)
        bx = bx.at[:, 1::2].set(jnp.clip(bx[:, 1::2], wt, wt + wh) - wt)

        # ---- mirror / vertical flip ------------------------------------
        if cfg.augment_random_mirror:
            do_mirror = jax.random.bernoulli(ks[10])
        else:
            do_mirror = jnp.bool_(False)
        # RandomFlip + flip-gated RandomRot90 (augmentations.py:454-475;
        # the reference gates BOTH on augment_random_flip — kept quirk)
        if cfg.augment_random_flip:
            do_flip = jax.random.bernoulli(ks[11])
            rot_k = jax.random.randint(ks[12], (), 0, 4)
        else:
            do_flip = jnp.bool_(False)
            rot_k = jnp.int32(0)

        # ---- compose dst->src affine (half-pixel resize convention) --
        sx = ww / S
        sy = wh / S
        # window coord -> original-image coord: subtract the expand offset
        tx = 0.5 * sx - 0.5 + (wl - left)
        ty = 0.5 * sy - 0.5 + (wt - top)
        # mirror/flip reverse the dst index before the map
        sx_m = jnp.where(do_mirror, -sx, sx)
        tx_m = jnp.where(do_mirror, tx + sx * (S - 1), tx)
        sy_m = jnp.where(do_flip, -sy, sy)
        ty_m = jnp.where(do_flip, ty + sy * (S - 1), ty)

        out_img = affine_warp_image(img, sx_m, tx_m, sy_m, ty_m, mean)
        out_masks = affine_warp_masks(masks.astype(jnp.float32),
                                      sx_m, tx_m, sy_m, ty_m)

        # boxes: window pixels -> output pixels -> normalized
        ob = bx / jnp.stack([ww, wh, ww, wh]) # relative in window == output
        ob = jnp.where(do_mirror,
                       jnp.stack([1 - ob[:, 2], ob[:, 1],
                                  1 - ob[:, 0], ob[:, 3]], axis=1), ob)
        ob = jnp.where(do_flip,
                       jnp.stack([ob[:, 0], 1 - ob[:, 3],
                                  ob[:, 2], 1 - ob[:, 1]], axis=1), ob)

        # rot90 applied to the warped square output — mathematically the
        # reference's rotate-before-resize (per-axis scales commute with
        # the axis swap on a square canvas)
        def _rot_once(args):
            im, ms, b = args
            im = jnp.rot90(im, 1, axes=(0, 1))
            ms = jnp.rot90(ms, 1, axes=(1, 2))
            b = jnp.stack([b[:, 1], 1 - b[:, 2], b[:, 3], 1 - b[:, 0]],
                          axis=1)
            return im, ms, b

        def _rot_n(n):
            def f(args):
                for _ in range(n):
                    args = _rot_once(args)
                return args
            return f

        if cfg.augment_random_flip:
            out_img, out_masks, ob = jax.lax.switch(
                rot_k, [_rot_n(0), _rot_n(1), _rot_n(2), _rot_n(3)],
                (out_img, out_masks, ob))

        # discard degenerate boxes (augmentations.py:170-178 semantics:
        # absolute width/height at S must exceed cfg.discard_box_width)
        wpx = (ob[:, 2] - ob[:, 0]) * S
        hpx = (ob[:, 3] - ob[:, 1]) * S
        keep = keep & (wpx > cfg.discard_box_width) & \
            (hpx > cfg.discard_box_height)
        new_labels = jnp.where(keep, labels, -2)

        # normalize image for the backbone (BackboneTransform)
        t = cfg.backbone.transform
        x = out_img
        if t.normalize:
            x = (x - jnp.asarray(MEANS, jnp.float32)) / \
                jnp.asarray(STD, jnp.float32)
        elif t.subtract_means:
            x = x - jnp.asarray(MEANS, jnp.float32)
        elif t.to_float:
            x = x / 255.0
        # permute from BGR source to the backbone's channel order, like
        # the host backbone_transform (augmentations.py:584-588) — NOT a
        # hardcoded flip, so channel_order='BGR' backbones train on the
        # same channels the host path feeds them
        channel_map = {c: i for i, c in enumerate('BGR')}
        perm = [channel_map[c] for c in t.channel_order]
        x = x[..., jnp.asarray(perm)]

        if emit_multires:
            from yolact_tpu.ops.resize import resize_bilinear_torch
            proto_t = (resize_bilinear_torch(out_masks, proto_hw) > 0.5)
            seg_t = None if seg_hw is None else \
                (resize_bilinear_torch(out_masks, seg_hw) > 0.5)
            return x, ob, new_labels, proto_t, seg_t
        return x, ob, new_labels, (out_masks > 0.5).astype(jnp.uint8), None

    keys = jax.random.split(rng, B)
    outs = jax.vmap(per_image)(
        keys, batch['image'].astype(jnp.float32),
        batch['gt_boxes'].astype(jnp.float32), batch['gt_labels'],
        batch['gt_masks'])
    img, boxes, labels = outs[:3]
    out = dict(batch, image=img, gt_boxes=boxes, gt_labels=labels)
    if emit_multires:
        out.pop('gt_masks', None)
        out['gt_masks_proto'] = outs[3]
        if outs[4] is not None:
            out['gt_masks_seg'] = outs[4]
    else:
        out['gt_masks'] = outs[3]
    return out
