"""YOLACT multi-task loss, fully vectorised for TPU.

Functional equivalent of the reference ``MultiBoxLoss``
(``layers/modules/multibox_loss.py:10-694``) with every per-image Python loop
replaced by fixed-shape batched ops:

  * matching is `yolact_tpu.train.matcher` (vmapped greedy matcher);
  * OHEM hard-negative mining (``:242-296``) uses a double-argsort rank;
  * the lincomb mask loss (``:499-674``) samples ``masks_to_train`` positives
    per image into fixed slots via random-priority top-k — the same "random
    subset when over budget" distribution as the reference's randperm — and
    assembles all sampled masks with one MXU matmul per image;
  * gt masks come in full-res uint8 ``[B, G, S, S]`` and are bilinearly
    downsampled on device (matches ``F.interpolate`` + 0.5 binarise).

Loss letters match the reference: B box, C conf, M mask, S semantic seg,
E class existence, D coeff diversity, I maskiou, P proto reg.
Normalisation: all but P/E/S divide by the total positive count; P/E/S
divide by batch size (``multibox_loss.py:196-203``).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from yolact_tpu.config import MaskType, YolactConfig
from yolact_tpu.ops.boxes import center_size, crop, decode, elemwise_box_iou
from yolact_tpu.train.matcher import MatchResult, match


def smooth_l1(pred, target):
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


@jax.custom_vjp
def _torch_bce(p, t):
    """binary_cross_entropy with torch's exact forward (-100 log clamp) AND
    backward ((p-t)/max(p(1-p), 1e-12)) semantics.

    The custom backward matters: for p in the f32 subnormal range
    (sigmoid of logits around -90..-103) the naive autodiff chain computes
    1/p -> inf before multiplying by sigmoid' ~ 0, permanently poisoning
    training with inf gradients; torch's eps-clamped quotient stays finite.
    """
    logp = jnp.maximum(jnp.log(jnp.maximum(p, 1e-45)), -100.0)
    log1mp = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, 1e-45)), -100.0)
    return -(t * logp + (1.0 - t) * log1mp)


def _torch_bce_fwd(p, t):
    return _torch_bce(p, t), (p, t)


def _torch_bce_bwd(res, g):
    p, t = res
    denom = jnp.maximum(p * (1.0 - p), 1e-12)
    dp = g * (p - t) / denom
    logp = jnp.maximum(jnp.log(jnp.maximum(p, 1e-45)), -100.0)
    log1mp = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, 1e-45)), -100.0)
    dt = g * (log1mp - logp)
    return dp, dt


_torch_bce.defvjp(_torch_bce_fwd, _torch_bce_bwd)


def _bce_with_logits(x, t):
    return jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _log_softmax(x):
    m = jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True))
    s = x - m
    return s - jnp.log(jnp.sum(jnp.exp(s), axis=-1, keepdims=True))


def _resize_masks(masks, size):
    """[G, S, S] float -> [G, h, w], exact torch bilinear (no antialias) —
    matches F.interpolate in multibox_loss.py:518-523, 225-228."""
    from yolact_tpu.ops.resize import resize_bilinear_torch
    return resize_bilinear_torch(masks, size)


def ohem_conf_loss(cfg: YolactConfig, conf_data, conf_t, pos,
                   conf_state=None):
    """OHEM with 3:1 hard negative mining (multibox_loss.py:242-296).

    With ``use_class_balanced_conf``, `conf_state` is a dict
    {'class_counts': [C], 'total': []} of running selected-example counts
    (the reference keeps these as module state, :275-295); the updated
    state is returned alongside the loss.
    """
    B, P, C = conf_data.shape
    batch_conf = conf_data.reshape(-1, C)
    if cfg.ohem_use_most_confident:
        sm = jax.nn.softmax(batch_conf, axis=-1)
        loss_c = jnp.max(sm[:, 1:], axis=-1)
    else:
        # log_sum_exp with the reference's *global* max (box_utils.py:316-325)
        x_max = jax.lax.stop_gradient(jnp.max(batch_conf))
        lse = jnp.log(jnp.sum(jnp.exp(batch_conf - x_max), axis=-1)) + x_max
        loss_c = lse - batch_conf[:, 0]
    loss_c = loss_c.reshape(B, P)
    loss_c = jnp.where(pos | (conf_t < 0), 0.0, loss_c)

    # rank of each prior when sorted by descending mining score
    order = jnp.argsort(-loss_c, axis=1, stable=True)
    idx_rank = jnp.argsort(order, axis=1, stable=True)
    num_pos = pos.sum(axis=1, keepdims=True)
    num_neg = jnp.clip(cfg.ohem_negpos_ratio * num_pos, max=P - 1)
    neg = idx_rank < num_neg
    neg = neg & ~pos & (conf_t >= 0)

    selected = pos | neg
    logp = _log_softmax(conf_data)
    tgt = jnp.clip(conf_t, 0, C - 1)
    # one-hot reduction instead of take_along_axis: the row gather (and
    # its scatter backward) is slow on TPU for [B*P] short rows; the
    # selection is exact (log_softmax of finite logits is finite)
    ce = -(logp * jax.nn.one_hot(tgt, C, dtype=logp.dtype)).sum(-1)

    if cfg.use_class_balanced_conf and conf_state is not None:
        sel_f = selected.reshape(-1).astype(jnp.float32)
        onehot = jax.nn.one_hot(tgt.reshape(-1), C, dtype=jnp.float32)
        new_counts = conf_state['class_counts'] + (onehot * sel_f[:, None]).sum(0)
        new_total = conf_state['total'] + sel_f.sum()
        weighting = 1.0 - new_counts[tgt] / jnp.maximum(new_total, 1.0)
        weighting = jnp.maximum(weighting, 1.0 / C)
        avg_weight = (C - 1) / C
        loss = jnp.sum(ce * selected * weighting) / avg_weight
        return cfg.conf_alpha * loss, \
            {'class_counts': new_counts, 'total': new_total}
    return cfg.conf_alpha * jnp.sum(ce * selected), conf_state


def focal_conf_loss(cfg: YolactConfig, conf_data, conf_t):
    """Softmax focal loss (multibox_loss.py:298-327)."""
    C = conf_data.shape[-1]
    conf_t = conf_t.reshape(-1)
    conf_data = conf_data.reshape(-1, C)
    keep = (conf_t >= 0).astype(conf_data.dtype)
    t = jnp.clip(conf_t, 0, C - 1)
    logpt = jnp.take_along_axis(_log_softmax(conf_data), t[:, None], axis=1)[:, 0]
    pt = jnp.exp(logpt)
    background = (t == 0).astype(conf_data.dtype)
    at = (1 - cfg.focal_loss_alpha) * background + \
        cfg.focal_loss_alpha * (1 - background)
    loss = -at * (1 - pt) ** cfg.focal_loss_gamma * logpt
    return cfg.conf_alpha * jnp.sum(loss * keep)


def focal_conf_sigmoid_loss(cfg: YolactConfig, conf_data, conf_t):
    """Sigmoid focal loss (multibox_loss.py:329-357)."""
    C = conf_data.shape[-1]
    conf_t = conf_t.reshape(-1)
    conf_data = conf_data.reshape(-1, C)
    keep = (conf_t >= 0).astype(conf_data.dtype)
    t = jnp.clip(conf_t, 0, C - 1)
    one_t = jax.nn.one_hot(t, C, dtype=conf_data.dtype)
    pm_t = one_t * 2 - 1
    logpt = jax.nn.log_sigmoid(conf_data * pm_t)
    pt = jnp.exp(logpt)
    at = cfg.focal_loss_alpha * one_t + (1 - cfg.focal_loss_alpha) * (1 - one_t)
    at = at.at[:, 0].set(0)
    loss = -at * (1 - pt) ** cfg.focal_loss_gamma * logpt
    return cfg.conf_alpha * jnp.sum(keep * loss.sum(axis=-1))


def focal_conf_objectness_loss(cfg: YolactConfig, conf_data, conf_t):
    """Objectness focal + positive-class CE (multibox_loss.py:359-390)."""
    C = conf_data.shape[-1]
    conf_t = conf_t.reshape(-1)
    conf_data = conf_data.reshape(-1, C)
    keep = (conf_t >= 0).astype(conf_data.dtype)
    t = jnp.clip(conf_t, 0, C - 1)
    background = (t == 0).astype(conf_data.dtype)
    at = (1 - cfg.focal_loss_alpha) * background + \
        cfg.focal_loss_alpha * (1 - background)
    logpt = jax.nn.log_sigmoid(conf_data[:, 0]) * (1 - background) + \
        jax.nn.log_sigmoid(-conf_data[:, 0]) * background
    pt = jnp.exp(logpt)
    obj_loss = -at * (1 - pt) ** cfg.focal_loss_gamma * logpt

    pos_mask = (conf_t > 0).astype(conf_data.dtype)
    logp_cls = _log_softmax(conf_data[:, 1:])
    t_pos = jnp.clip(conf_t - 1, 0, C - 2)
    ce = -jnp.take_along_axis(logp_cls, t_pos[:, None], axis=1)[:, 0]
    class_loss = jnp.sum(ce * pos_mask)
    return cfg.conf_alpha * (class_loss + jnp.sum(obj_loss * keep))


def conf_objectness_loss(cfg: YolactConfig, conf_data, conf_t, loc_data,
                         loc_t, priors):
    """YOLO-style p(obj)*p(IoU) objectness (multibox_loss.py:392-428)."""
    B, P, C = conf_data.shape
    conf_tf = conf_t.reshape(-1)
    conf_df = conf_data.reshape(-1, C)
    pos_mask = (conf_tf > 0).astype(conf_df.dtype)
    neg_mask = (conf_tf == 0).astype(conf_df.dtype)

    obj = conf_df[:, 0]
    obj_neg_loss = -jnp.sum(jax.nn.log_sigmoid(-obj) * neg_mask)

    priors_b = jnp.broadcast_to(priors[None], (B, P, 4)).reshape(-1, 4)
    boxes_pred = decode(loc_data.reshape(-1, 4), priors_b, cfg.use_yolo_regressors)
    boxes_targ = decode(loc_t.reshape(-1, 4), priors_b, cfg.use_yolo_regressors)
    iou = jax.lax.stop_gradient(elemwise_box_iou(boxes_pred, boxes_targ))
    obj_pos = -(iou * jax.nn.log_sigmoid(obj) +
                (1 - iou) * jax.nn.log_sigmoid(-obj))
    obj_pos_loss = jnp.sum(obj_pos * pos_mask)

    logp_cls = _log_softmax(conf_df[:, 1:])
    t_pos = jnp.clip(conf_tf - 1, 0, C - 2)
    ce = -jnp.take_along_axis(logp_cls, t_pos[:, None], axis=1)[:, 0]
    class_loss = jnp.sum(ce * pos_mask)
    return cfg.conf_alpha * (class_loss + obj_pos_loss + obj_neg_loss)


def semantic_segmentation_loss(cfg: YolactConfig, segm, gt_masks, gt_labels,
                               ds_pre=None):
    """Aux semantic-seg BCE (multibox_loss.py:218-239).  segm is NHWC
    [B, Hs, Ws, C-1]; gt_masks [B, G, S, S] float; crowds/padding excluded.
    ``ds_pre``: optional pre-downsampled binarized targets [B, G, Hs, Ws]
    (host-computed with the same torch-bilinear + 0.5 math)."""
    B, Hs, Ws, Cm1 = segm.shape
    if ds_pre is not None:
        dm_all = ds_pre
    else:
        if gt_masks is None:
            raise ValueError('semantic seg loss needs gt_masks or '
                             'precomputed gt_masks_seg targets')
        dm_all = (_resize_masks(gt_masks, (Hs, Ws)) > 0.5)
    dm_all = dm_all.astype(segm.dtype)

    def per_image(seg, dm, labels):
        valid = labels >= 0
        dm = dm * valid[:, None, None]
        cls = jnp.clip(labels, 0, Cm1 - 1)
        seg_t = jnp.zeros((Cm1, Hs, Ws), seg.dtype).at[cls].max(dm)
        seg_t = jax.lax.stop_gradient(seg_t)
        return jnp.sum(_bce_with_logits(
            jnp.transpose(seg, (2, 0, 1)), seg_t))

    loss = jax.vmap(per_image)(segm, dm_all, gt_labels).sum()
    return loss / Hs / Ws * cfg.semantic_segmentation_alpha


def class_existence_loss(cfg: YolactConfig, class_data, gt_labels):
    """Aux class-existence BCE (multibox_loss.py:104-108,215).  Unlike the
    reference we exclude crowd (-1) and padding rows from the one-hot target
    (the reference's eye()[-1] wraps to the last class — a latent bug in a
    path no released config enables)."""
    Cm1 = class_data.shape[-1]
    valid = (gt_labels >= 0)
    onehot = jax.nn.one_hot(jnp.clip(gt_labels, 0, Cm1 - 1), Cm1,
                            dtype=class_data.dtype)
    target = jnp.max(onehot * valid[..., None], axis=1)
    return cfg.class_existence_alpha * jnp.sum(
        _bce_with_logits(class_data, target))


class MaskIoUTargets(NamedTuple):
    net_input: jnp.ndarray  # [B, M, Hp, Wp, 1]
    iou_t: jnp.ndarray      # [B, M]
    label_t: jnp.ndarray    # [B, M]
    valid: jnp.ndarray      # [B, M] bool


def lincomb_mask_loss(cfg: YolactConfig, rng, m: MatchResult, loc_data,
                      mask_data, priors, proto_data, gt_masks, gt_labels,
                      dm_pre=None):
    """Prototype-coefficient mask loss (multibox_loss.py:499-674).

    ``dm_pre``: optional pre-downsampled gt at proto resolution
    [B, G, Hp, Wp] (binarized, host-computed with the reference's exact
    soft-downsample-then-threshold order — data/coco.py:pad_batch).  When
    absent, ``gt_masks`` [B, G, S, S] are downsampled here."""
    B, P = m.pos.shape
    Hp, Wp = proto_data.shape[1], proto_data.shape[2]
    M = cfg.masks_to_train

    if dm_pre is not None:
        assert cfg.mask_proto_binarize_downsampled_gt, \
            'precomputed proto targets are binarized; this config wants soft'
        dm_all = dm_pre.astype(proto_data.dtype)      # [B, G, Hp, Wp]
    else:
        if gt_masks is None:
            raise ValueError('lincomb mask loss needs gt_masks or '
                             'precomputed gt_masks_proto targets')
        dm_all = _resize_masks(gt_masks, (Hp, Wp))
        if cfg.mask_proto_binarize_downsampled_gt:
            dm_all = (dm_all > 0.5).astype(proto_data.dtype)

    def per_image(rng_i, pos, idx_t, gt_box_t, coeffs, proto, dm, labels,
                  loc_i):
        # dm: downsampled, (optionally) binarised gt at proto resolution
        if cfg.mask_proto_remove_empty_masks:
            # drop positives whose gt downsampled away (:525-531)
            nonempty = dm.sum(axis=(1, 2)) > 0.0001   # [G]
            pos = pos & nonempty[idx_t]

        if cfg.mask_proto_reweight_mask_loss:
            # per-pixel fg/bg balance weights (:533-544)
            bin_gt = dm if cfg.mask_proto_binarize_downsampled_gt \
                else (dm > 0.5).astype(proto.dtype)
            fg_norm = bin_gt / (bin_gt.sum(axis=(1, 2), keepdims=True) + 1e-4)
            bg_norm = (1 - bin_gt) / ((1 - bin_gt).sum(axis=(1, 2),
                                                       keepdims=True) + 1e-4)
            reweight = (fg_norm * cfg.mask_proto_reweight_coeff + bg_norm) \
                * (Hp * Wp)                            # [G, Hp, Wp]

        # --- fixed-slot random sampling of positives -------------------
        # random priority per prior; positives sorted first. Top-M slots
        # reproduce "randperm subset" when num_pos > M.
        pri = jax.random.uniform(rng_i, (P,))
        pri = jnp.where(pos, pri + 1.0, 0.0)          # positives in (1, 2)
        _, slots = jax.lax.top_k(pri, M)              # [M] prior indices
        slot_valid = pos[slots]                       # [M]

        sel_idx_t = idx_t[slots]                      # gt index per slot
        sel_coef = coeffs[slots]                      # [M, mask_dim]
        if cfg.mask_proto_crop_with_pred_box:
            boxes_all = decode(loc_i, priors, cfg.use_yolo_regressors)
            sel_box = boxes_all[slots]
        else:
            sel_box = gt_box_t[slots]                 # [M, 4]
        mask_t = dm[sel_idx_t]                        # [M, Hp, Wp]
        mask_t = jnp.transpose(mask_t, (1, 2, 0))     # [Hp, Wp, M]
        label_t = labels[sel_idx_t]

        # --- assemble predicted masks (one matmul) ---------------------
        pred = jnp.einsum('hwc,mc->hwm', proto, sel_coef,
                          preferred_element_type=jnp.float32)
        if cfg.mask_proto_mask_activation == 'sigmoid':
            pred = jax.nn.sigmoid(pred)

        loss_double = 0.0
        if cfg.mask_proto_double_loss:
            # pre-crop loss added on top (:594-600)
            if cfg.mask_proto_mask_activation == 'sigmoid':
                dbl = _torch_bce(jnp.clip(pred, 0.0, 1.0), mask_t)
            else:
                dbl = smooth_l1(pred, mask_t)
            loss_double = cfg.mask_proto_double_loss_alpha * \
                (dbl.sum(axis=(0, 1)) * slot_valid).sum()

        if cfg.mask_proto_crop:
            pred = crop(pred, sel_box)

        if cfg.mask_proto_mask_activation == 'sigmoid':
            pre_loss = _torch_bce(jnp.clip(pred, 0.0, 1.0), mask_t)
        else:
            pre_loss = smooth_l1(pred, mask_t)

        if cfg.mask_proto_normalize_mask_loss_by_sqrt_area:
            gt_area = jnp.sum(mask_t, axis=(0, 1), keepdims=True)
            pre_loss = pre_loss / (jnp.sqrt(gt_area) + 0.0001)

        if cfg.mask_proto_reweight_mask_loss:
            pre_loss = pre_loss * jnp.transpose(reweight[sel_idx_t],
                                                (1, 2, 0))

        if cfg.mask_proto_normalize_emulate_roi_pooling:
            weight = Hp * Wp if cfg.mask_proto_crop else 1
            csize = center_size(sel_box)
            gt_w = csize[:, 2] * Wp
            gt_h = csize[:, 3] * Hp
            denom = jnp.where(slot_valid, gt_w * gt_h, 1.0)
            per_slot = pre_loss.sum(axis=(0, 1)) / denom * weight
        else:
            per_slot = pre_loss.sum(axis=(0, 1))

        per_slot = per_slot * slot_valid

        # scale when we sub-sampled (multibox_loss.py:622-624)
        old_num_pos = pos.sum()
        num_sel = slot_valid.sum()
        scale = jnp.where(num_sel > 0, old_num_pos / jnp.maximum(num_sel, 1), 1.0)
        scale = jnp.where(old_num_pos > num_sel, scale, 1.0)
        loss_m = per_slot.sum() * scale + loss_double

        out = dict(loss_m=loss_m)
        if cfg.use_maskiou:
            bin_pred = (pred > 0.5).astype(pred.dtype)
            inter = jnp.sum(bin_pred * mask_t, axis=(0, 1))
            a1 = jnp.sum(bin_pred, axis=(0, 1))
            a2 = jnp.sum(mask_t, axis=(0, 1))
            union = a1 + a2 - inter
            iou_t = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1), 0.0)
            sel_ok = slot_valid
            if cfg.discard_mask_area > 0:
                sel_ok = sel_ok & (a2 > cfg.discard_mask_area)
            out.update(net_input=jnp.transpose(pred, (2, 0, 1))[..., None],
                       iou_t=iou_t,
                       label_t=jnp.clip(label_t, 0, None).astype(jnp.int32),
                       miou_valid=sel_ok)

        if cfg.mask_proto_coeff_diversity_loss:
            cn = sel_coef / jnp.maximum(
                jnp.linalg.norm(sel_coef, axis=1, keepdims=True), 1e-12)
            cos = (cn @ cn.T + 1) / 2
            inst_eq = (sel_idx_t[:, None] == sel_idx_t[None, :])
            vv = slot_valid[:, None] & slot_valid[None, :]
            d = jnp.where(inst_eq, 1 - cos, cos) * vv
            out['loss_d'] = cfg.mask_proto_coeff_diversity_alpha * \
                d.sum() / jnp.maximum(num_sel, 1)
        return out

    rng_images, rng_miou = jax.random.split(rng)
    rngs = jax.random.split(rng_images, B)
    res = jax.vmap(per_image)(rngs, m.pos, m.idx_t, m.gt_box_t, mask_data,
                              proto_data, dm_all, gt_labels, loc_data)

    losses = {'M': res['loss_m'].sum() * cfg.mask_alpha / Hp / Wp}
    if cfg.mask_proto_coeff_diversity_loss:
        losses['D'] = res['loss_d'].sum()

    miou_targets = None
    if cfg.use_maskiou:
        miou_valid = res['miou_valid']
        if cfg.maskious_to_train > 0:
            # global random subsample cap across the whole batch
            # (multibox_loss.py:663-669).  The reference checks
            # num_samples > maskious_to_train but then slices
            # perm[:cfg.masks_to_train] — a kept quirk, so the cap
            # size is masks_to_train.
            flat_ok = miou_valid.reshape(-1)               # [B*M]
            cap = min(cfg.masks_to_train, flat_ok.shape[0])
            mpri = jnp.where(flat_ok,
                             jax.random.uniform(rng_miou, flat_ok.shape),
                             -1.0)
            kth = jnp.sort(mpri)[-cap]
            capped = flat_ok & (mpri >= kth)
            flat_ok = jnp.where(flat_ok.sum() > cfg.maskious_to_train,
                                capped, flat_ok)
            miou_valid = flat_ok.reshape(miou_valid.shape)
        miou_targets = MaskIoUTargets(res['net_input'], res['iou_t'],
                                      res['label_t'], miou_valid)
    return losses, miou_targets


def direct_mask_loss(cfg: YolactConfig, rng, m: MatchResult, mask_data,
                     gt_masks):
    """Direct (fc-mask) loss: BCE between per-anchor mask_size^2 predictions
    and the matched gt mask cropped by the GT box and resized to mask_size
    (multibox_loss.py:152-161 use_gt_bboxes path, vectorised).

    Deviation from the reference's no-gt-bbox path (:431-472, which crops by
    the *predicted* box with per-positive dynamic-size adaptive pooling — a
    host-bound loop by construction): we crop by the gt box via the
    differentiable crop + fixed-grid resize.  use_gt_bboxes=True semantics
    are exact; the pred-box variant differs only in the crop window source.

    The reference trains on ALL positives (no cap); fixed shapes force a
    ``masks_to_train``-slot budget here, so when an image has more
    positives than slots we sample a random subset and rescale by
    old_num_pos / num_sel (the lincomb convention, multibox_loss.py:622)
    so the expected loss matches the uncapped sum.
    """
    B, P = m.pos.shape
    S = gt_masks.shape[-1]
    ms = cfg.mask_size
    M = cfg.masks_to_train

    def per_image(rng_i, pos, idx_t, gt_box_t, preds, masks):
        pri = jax.random.uniform(rng_i, (P,))
        pri = jnp.where(pos, pri + 1.0, 0.0)      # positives in (1, 2)
        _, slots = jax.lax.top_k(pri, M)
        slot_valid = pos[slots]
        sel_gt = idx_t[slots]
        sel_box = gt_box_t[slots]                    # [M, 4] point form
        sel_pred = preds[slots]                      # [M, ms*ms]

        # crop each gt mask by its box and resample to ms x ms with a
        # fixed bilinear grid (replaces adaptive_avg_pool on dynamic crops)
        gm = masks[sel_gt]                           # [M, S, S]
        x1, y1 = sel_box[:, 0] * S, sel_box[:, 1] * S
        x2, y2 = sel_box[:, 2] * S, sel_box[:, 3] * S
        ty = (jnp.arange(ms) + 0.5) / ms
        tx = (jnp.arange(ms) + 0.5) / ms
        ys = y1[:, None] + (y2 - y1)[:, None] * ty[None, :] - 0.5  # [M, ms]
        xs = x1[:, None] + (x2 - x1)[:, None] * tx[None, :] - 0.5

        def sample(img, ys_i, xs_i):
            y0 = jnp.clip(jnp.floor(ys_i).astype(jnp.int32), 0, S - 1)
            x0 = jnp.clip(jnp.floor(xs_i).astype(jnp.int32), 0, S - 1)
            y1i = jnp.clip(y0 + 1, 0, S - 1)
            x1i = jnp.clip(x0 + 1, 0, S - 1)
            wy = jnp.clip(ys_i - y0, 0, 1)[:, None]
            wx = jnp.clip(xs_i - x0, 0, 1)[None, :]
            v00 = img[y0][:, x0]
            v01 = img[y0][:, x1i]
            v10 = img[y1i][:, x0]
            v11 = img[y1i][:, x1i]
            return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                    v10 * wy * (1 - wx) + v11 * wy * wx)

        mask_t = jax.vmap(sample)(gm, ys, xs)        # [M, ms, ms]
        mask_t = (mask_t > 0.5).astype(jnp.float32).reshape(M, -1)
        bce = _torch_bce(jnp.clip(sel_pred, 0.0, 1.0), mask_t)
        per_slot = (bce.sum(axis=1) * slot_valid).sum()
        # unbiased-estimator rescale when positives exceeded the slots
        old_num_pos = pos.sum()
        num_sel = slot_valid.sum()
        scale = jnp.where(old_num_pos > num_sel,
                          old_num_pos / jnp.maximum(num_sel, 1), 1.0)
        return per_slot * scale

    rngs = jax.random.split(rng, B)
    loss = jax.vmap(per_image)(rngs, m.pos, m.idx_t, m.gt_box_t,
                               mask_data.astype(jnp.float32),
                               gt_masks)
    return loss.sum() * cfg.mask_alpha


def mask_iou_loss(cfg: YolactConfig, maskiou_apply, t: MaskIoUTargets):
    """Mask re-scoring training loss (multibox_loss.py:684-694)."""
    B, M = t.iou_t.shape
    flat = t.net_input.reshape((B * M,) + t.net_input.shape[2:])
    p = maskiou_apply(flat)                            # [B*M, C-1]
    p = jnp.take_along_axis(p, t.label_t.reshape(-1)[:, None], axis=1)[:, 0]
    loss = smooth_l1(p, t.iou_t.reshape(-1)) * t.valid.reshape(-1)
    return cfg.maskiou_alpha * loss.sum()


def multibox_loss(cfg: YolactConfig, rng, predictions: Dict,
                  batch: Dict, maskiou_apply=None, conf_state=None
                  ) -> Tuple[Dict[str, jnp.ndarray], MatchResult]:
    """Full training loss.  `batch` is the padded dict from data.coco.pad_batch
    (gt_masks may be uint8).  Returns ({letter: scalar}, match_result) —
    with use_class_balanced_conf the updated conf_state rides back in
    losses['_conf_state'] (popped by the train step, never summed)."""
    loc_data = predictions['loc'].astype(jnp.float32)
    conf_data = predictions['conf'].astype(jnp.float32)
    mask_data = predictions['mask'].astype(jnp.float32)
    priors = predictions['priors'].astype(jnp.float32)

    gt_boxes = batch['gt_boxes']
    gt_labels = batch['gt_labels']
    gt_masks = batch.get('gt_masks')
    if gt_masks is not None:
        gt_masks = gt_masks.astype(jnp.float32)

    def _pre_target(name, hw):
        """Pre-downsampled gt mask targets (data/coco.py:pad_batch multires
        or device_augment), unpacked here where the target (h, w) is
        known from the prediction shapes."""
        if name in batch:
            return batch[name].astype(jnp.float32)
        packed = batch.get(name + '_packed')
        if packed is None:
            return None
        from yolact_tpu.ops.bits import packed_width, unpack_bits_last
        H, W = hw
        assert packed.shape[-2] == H and \
            packed.shape[-1] == packed_width(W), (
                f'{name}_packed shape {packed.shape[-2:]} does not match '
                f'the model target ({H}, {packed_width(W)})')
        return unpack_bits_last(packed, W).astype(jnp.float32)

    m = match(cfg, gt_boxes, gt_labels, priors,
              loc_pred=loc_data if cfg.use_prediction_matching else None)

    losses: Dict[str, jnp.ndarray] = {}
    total_num_pos = jnp.maximum(m.pos.sum(), 1).astype(jnp.float32)

    if cfg.train_boxes:
        l1 = smooth_l1(loc_data, m.loc_t).sum(-1) * m.pos
        losses['B'] = l1.sum() * cfg.bbox_alpha

    maskiou_targets = None
    if cfg.train_masks and cfg.mask_type == MaskType.DIRECT:
        if gt_masks is None:
            raise ValueError('direct mask loss needs full-res gt_masks; '
                             'disable multires targets for DIRECT configs')
        losses['M'] = direct_mask_loss(cfg, rng, m, mask_data, gt_masks)
    if cfg.train_masks and cfg.mask_type == MaskType.LINCOMB:
        proto_data = predictions['proto'].astype(jnp.float32)
        dm_pre = _pre_target('gt_masks_proto', proto_data.shape[1:3])
        mask_losses, maskiou_targets = lincomb_mask_loss(
            cfg, rng, m, loc_data, mask_data, priors, proto_data,
            gt_masks, gt_labels, dm_pre=dm_pre)
        losses.update(mask_losses)
        if cfg.mask_proto_loss == 'l1':
            # l1_expected_area/l1_alpha from multibox_loss.py:37-39
            losses['P'] = jnp.mean(jnp.abs(predictions['proto'])) / \
                (20 * 20 / 70 / 70) * 0.1
        elif cfg.mask_proto_loss == 'disj':
            losses['P'] = -jnp.mean(jnp.max(
                jax.nn.log_softmax(predictions['proto'], axis=-1), axis=-1))

    if cfg.use_focal_loss:
        if cfg.use_sigmoid_focal_loss:
            losses['C'] = focal_conf_sigmoid_loss(cfg, conf_data, m.conf_t)
        elif cfg.use_objectness_score:
            losses['C'] = focal_conf_objectness_loss(cfg, conf_data, m.conf_t)
        else:
            losses['C'] = focal_conf_loss(cfg, conf_data, m.conf_t)
    else:
        if cfg.use_objectness_score:
            losses['C'] = conf_objectness_loss(cfg, conf_data, m.conf_t,
                                               loc_data, m.loc_t, priors)
        else:
            losses['C'], new_conf_state = ohem_conf_loss(
                cfg, conf_data, m.conf_t, m.pos, conf_state)
            if cfg.use_class_balanced_conf and new_conf_state is not None:
                losses['_conf_state'] = new_conf_state

    if cfg.use_maskiou and maskiou_targets is not None and \
            maskiou_apply is not None:
        losses['I'] = mask_iou_loss(cfg, maskiou_apply, maskiou_targets)

    if cfg.use_class_existence_loss:
        losses['E'] = class_existence_loss(cfg, predictions['classes'],
                                           gt_labels)
    if cfg.use_semantic_segmentation_loss:
        ds_pre = _pre_target('gt_masks_seg',
                             predictions['segm'].shape[1:3])
        losses['S'] = semantic_segmentation_loss(cfg, predictions['segm'],
                                                 gt_masks, gt_labels,
                                                 ds_pre=ds_pre)

    B = loc_data.shape[0]
    for k in losses:
        if k == '_conf_state':
            continue
        if k in ('P', 'E', 'S'):
            losses[k] = losses[k] / B
        else:
            losses[k] = losses[k] / total_num_pos
    return losses, m
