"""Anchor-GT matching, vectorised for TPU.

Semantics of the reference ``match`` (``layers/box_utils.py:159-227``):

  1. IoU(gt, priors); each prior takes its best gt.
  2. Greedy force-match: repeatedly take the (gt, prior) pair with the
     globally highest remaining IoU, bind them (overlap pinned to 2 so it
     never thresholds out), and remove both from contention.
  3. Threshold: IoU < pos_thresh -> neutral (-1); < neg_thresh -> background.
  4. Crowd: non-positive priors whose crowd-IoU (inter/area_prior) exceeds
     ``crowd_iou_threshold`` become neutral.

The reference runs step 2 as a data-dependent Python loop per image; here it
is a fixed ``MAX_GT``-trip ``lax.fori_loop`` over a padded ``[G, P]`` IoU
matrix (identical semantics: the loop always picks the current global max,
and padded/consumed rows are pinned at -1 so a predicate skips them).

Padded-GT convention (see data/coco.py:pad_batch): gt_labels >= 0 are real
objects, -1 marks crowds (tail), -2 marks padding.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from yolact_tpu.config import YolactConfig
from yolact_tpu.ops.boxes import (change, decode, encode, jaccard, point_form)
from yolact_tpu.ops.topk import top_k_lex


class MatchResult(NamedTuple):
    loc_t: jnp.ndarray     # [B, P, 4] encoded regression targets
    conf_t: jnp.ndarray    # [B, P] int32: 0 bg, -1 neutral, else class+1
    idx_t: jnp.ndarray     # [B, P] int32 matched gt index
    gt_box_t: jnp.ndarray  # [B, P, 4] matched gt box (point form)
    pos: jnp.ndarray       # [B, P] bool


def _match_single(cfg: YolactConfig, gt_boxes, gt_labels, priors, loc_pred):
    """gt_boxes [G,4] point form, gt_labels [G] int32, priors [P,4]."""
    G = gt_boxes.shape[0]
    is_truth = gt_labels >= 0         # real, non-crowd objects
    is_crowd = gt_labels == -1

    if cfg.use_prediction_matching:
        decoded_priors = decode(loc_pred, priors, cfg.use_yolo_regressors)
    else:
        decoded_priors = point_form(priors)

    if cfg.use_change_matching:
        # change values are unbounded below (can sit under the reference's
        # -1 consumption marker), so the compacted-candidate loop's value
        # reasoning does not hold — run the reference loop op-for-op on
        # the full matrix instead.  This mode is a research flag (off in
        # every named config), so the [G, P] carry cost is irrelevant.
        overlaps = change(gt_boxes, decoded_priors)
        overlaps = jnp.where(is_truth[:, None], overlaps, -jnp.inf)
        best_truth_overlap = jnp.max(overlaps, axis=0)   # [P]
        best_truth_idx = jnp.argmax(overlaps, axis=0)
        num_truth = jnp.sum(is_truth)

        def body_full(t, state):
            ov, bto, bti = state
            j = jnp.argmax(jnp.max(ov, axis=1))
            i = jnp.argmax(ov[j])
            # exactly num_objects force-match trips, like the reference's
            # `for _ in range(overlaps.size(0))` — including its quirk
            # that a consumed (-1) entry can outrank live ones
            live = t < num_truth
            ov = jnp.where(live, ov.at[:, i].set(-1.0).at[j].set(-1.0), ov)
            bto = jnp.where(live, bto.at[i].set(2), bto)
            bti = jnp.where(live, bti.at[i].set(j), bti)
            return ov, bto, bti

        _, best_truth_overlap, best_truth_idx = jax.lax.fori_loop(
            0, G, body_full,
            (overlaps, best_truth_overlap, best_truth_idx))
    else:
        overlaps = jaccard(gt_boxes, decoded_priors)     # [G, P]
        overlaps = jnp.where(is_truth[:, None], overlaps, -1.0)

        best_truth_overlap = jnp.max(overlaps, axis=0)   # [P]
        best_truth_idx = jnp.argmax(overlaps, axis=0)

        # The greedy loop only ever consults each gt's best REMAINING
        # prior, and every iteration removes exactly one prior globally —
        # so after G-1 removals a row's best remaining is still within
        # its top-G candidates (sound because IoU >= 0 > the -1
        # consumption marker).  Compacting [G, P] -> [G, G+1] before the
        # loop keeps the fori_loop carry tiny (the full-matrix version
        # carried and copied [G,19248] every trip: profiled ~15% of the
        # b8 train step).
        P = overlaps.shape[1]
        K = min(G + 1, P)
        # Exact top-K by (IoU desc, prior index asc) — ties must resolve
        # to the LOWEST prior index to replicate the reference argmax, so
        # approx_max_k stays rejected (arbitrary tie order on TPU breaks
        # parity for all-zero-IoU gts / symmetric anchors).  top_k_lex
        # runs K fused max-reduce passes instead of sorting; at
        # [8,32,19248]->33 it measures 2x faster than the best
        # sort-based scheme tried (segmented two-phase top_k; NOTES.md).
        cand_vals, cand_idx = top_k_lex(overlaps, K)     # [G, K]

        def body(_, state):
            sm, bto, bti = state
            best_per_gt = jnp.max(sm, axis=1)            # [G]
            j = jnp.argmax(best_per_gt)                  # gt w/ highest IoU
            i = cand_idx[j, jnp.argmax(sm[j])]           # its best prior
            live = best_per_gt[j] > -0.5                 # skip padded rows
            sm = jnp.where(live, jnp.where(cand_idx == i, -1.0, sm), sm)
            sm = jnp.where(live, sm.at[j].set(-1.0), sm)
            bto = jnp.where(live, bto.at[i].set(2), bto)
            bti = jnp.where(live, bti.at[i].set(j), bti)
            return sm, bto, bti

        _, best_truth_overlap, best_truth_idx = jax.lax.fori_loop(
            0, G, body, (cand_vals, best_truth_overlap, best_truth_idx))

    matches = gt_boxes[best_truth_idx]                   # [P, 4]
    conf = gt_labels[best_truth_idx] + 1                 # [P]
    conf = jnp.where(best_truth_overlap < cfg.positive_iou_threshold, -1, conf)
    conf = jnp.where(best_truth_overlap < cfg.negative_iou_threshold, 0, conf)

    if cfg.crowd_iou_threshold < 1:
        crowd_overlaps = jaccard(decoded_priors, gt_boxes, iscrowd=True)  # [P, G]
        crowd_overlaps = jnp.where(is_crowd[None, :], crowd_overlaps, 0.0)
        best_crowd = jnp.max(crowd_overlaps, axis=1)
        conf = jnp.where((conf <= 0) & (best_crowd > cfg.crowd_iou_threshold),
                         -1, conf)

    loc = encode(matches, priors, cfg.use_yolo_regressors)
    return loc, conf.astype(jnp.int32), best_truth_idx.astype(jnp.int32), matches


def match(cfg: YolactConfig, gt_boxes, gt_labels, priors,
          loc_pred=None) -> MatchResult:
    """Batched matcher.  gt_boxes [B,G,4], gt_labels [B,G], priors [P,4]."""
    if loc_pred is None:
        loc_pred = jnp.zeros(gt_boxes.shape[:1] + priors.shape, priors.dtype)
    loc_t, conf_t, idx_t, gt_box_t = jax.vmap(
        lambda b, l, lp: _match_single(cfg, b, l, priors, lp))(
            gt_boxes, gt_labels, loc_pred)
    return MatchResult(loc_t, conf_t, idx_t, gt_box_t, conf_t > 0)
