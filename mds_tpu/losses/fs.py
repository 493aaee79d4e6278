"""FS* loss wrappers + SegFix loss.

Reference: lib/loss/loss_helper.py — the "FS" (fully-supervised) wrapper
family used by the contrast/HRNet-era trainers: `FSCELoss` (:342-386, CE
with optional class weights, nearest label rescale per input), `FSAuxCELoss`
(:474-487, seg_loss/aux_loss weighted sum), `FSOhemCELoss` (:388-435,
thresholded top-k CE), `FSRMILoss` (:533-543), `FSAuxRMILoss` (:489-517),
`FSCELOVASZLoss` (:250-...), and `SegFixLoss` (:545-606).

NOTE on SegFix: the reference imports `lib.utils.helpers.offset_helper.
DTOffsetHelper`, a module that does NOT exist in its tree — SegFixLoss is
dead code there. Here the two helpers are implemented self-contained with
the standard SegFix semantics (Yuan et al., ECCV'20): boundary mask =
distance-transform < threshold; direction label = angle quantized into 8
sectors.

Layout: logits NHWC (B,H,W,C); labels (B,H,W) int.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from mds_tpu.losses.lovasz import lovasz_softmax
from mds_tpu.losses.ohem_ce import OhemCELoss, cross_entropy_per_pixel
from mds_tpu.losses.rmi import rmi_loss


def _scale_target(target: jax.Array, hw) -> jax.Array:
    """Nearest-neighbor label rescale (FSCELoss._scale_target :381-386)."""
    b = target.shape[0]
    if target.shape[1:3] == tuple(hw):
        return target
    return jax.image.resize(
        target.astype(jnp.float32), (b, hw[0], hw[1]), method="nearest"
    ).astype(jnp.int32)


def fs_ce(logits, target, class_weight=None, ignore_index: int = 255):
    """Mean CE over valid pixels with optional per-class weights."""
    target = _scale_target(jnp.asarray(target, jnp.int32), logits.shape[1:3])
    ce, valid_b = cross_entropy_per_pixel(
        logits.astype(jnp.float32), target, ignore_index
    )
    valid = valid_b.astype(jnp.float32)
    if class_weight is not None:
        w = jnp.asarray(class_weight, jnp.float32)[
            jnp.clip(target, 0, len(class_weight) - 1)
        ] * valid
    else:
        w = valid
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


class FSCELoss:
    """CE over one tensor or a weighted list of tensors (ref :342-386)."""

    def __init__(self, configer=None, ignore_index: int = 255,
                 class_weight=None):
        if configer is not None:
            params = configer.get("loss", "params", default={}) or {}
            ignore_index = int(params.get("ce_ignore_index", ignore_index))
            class_weight = params.get("ce_weight", class_weight)
        self.ignore_index = ignore_index
        self.class_weight = class_weight

    def __call__(self, inputs, target, weights: Optional[Sequence] = None):
        if isinstance(inputs, (list, tuple)):
            if weights is None:
                weights = [1.0] * len(inputs)
            return sum(
                w * fs_ce(x, target, self.class_weight, self.ignore_index)
                for w, x in zip(weights, inputs)
            )
        return fs_ce(inputs, target, self.class_weight, self.ignore_index)


class FSOhemCELoss:
    """Thresholded hard-pixel CE (ref :388-435) — reuses the exact OHEM
    bisection machinery."""

    def __init__(self, configer=None, thresh: float = 0.7,
                 ignore_index: int = 255):
        if configer is not None:
            params = configer.get("loss", "params", default={}) or {}
            thresh = float(params.get("ohem_thresh", thresh))
            ignore_index = int(params.get("ce_ignore_index", ignore_index))
        self._ohem = OhemCELoss(thresh, ignore_index)

    def __call__(self, logits, target):
        target = _scale_target(jnp.asarray(target, jnp.int32),
                               logits.shape[1:3])
        return self._ohem(logits, target)


class FSAuxCELoss:
    """seg_weight·CE(seg) + aux_weight·CE(aux) (ref :474-487)."""

    def __init__(self, configer=None, seg_weight: float = 1.0,
                 aux_weight: float = 0.4, **kw):
        if configer is not None:
            lw = configer.get("network", "loss_weights", default={}) or {}
            seg_weight = float(lw.get("seg_loss", seg_weight))
            aux_weight = float(lw.get("aux_loss", aux_weight))
        self.seg_weight, self.aux_weight = seg_weight, aux_weight
        self.ce = FSCELoss(configer, **kw)

    def __call__(self, inputs, target):
        aux_out, seg_out = inputs
        return (self.seg_weight * self.ce(seg_out, target)
                + self.aux_weight * self.ce(aux_out, target))


class FSRMILoss:
    """RMI on the main head (ref :533-543)."""

    def __init__(self, configer=None, ignore_index: int = 255):
        self.ignore_index = ignore_index

    def __call__(self, logits, target):
        target = _scale_target(jnp.asarray(target, jnp.int32),
                               logits.shape[1:3])
        return rmi_loss(logits, target, num_classes=logits.shape[-1],
                        ignore=self.ignore_index)


class FSAuxRMILoss:
    """aux CE + seg RMI, weighted (ref :489-517)."""

    def __init__(self, configer=None, seg_weight: float = 1.0,
                 aux_weight: float = 0.4):
        if configer is not None:
            lw = configer.get("network", "loss_weights", default={}) or {}
            seg_weight = float(lw.get("seg_loss", seg_weight))
            aux_weight = float(lw.get("aux_loss", aux_weight))
        self.seg_weight, self.aux_weight = seg_weight, aux_weight
        self.ce = FSCELoss(configer)
        self.rmi = FSRMILoss(configer)

    def __call__(self, inputs, target):
        aux_out, seg_out = inputs
        return (self.seg_weight * self.rmi(seg_out, target)
                + self.aux_weight * self.ce(aux_out, target))


class FSCELOVASZLoss:
    """CE + Lovász-softmax mix (ref :250-...)."""

    def __init__(self, configer=None, ce_weight: float = 1.0,
                 lovasz_weight: float = 1.0, ignore_index: int = 255):
        self.ce = FSCELoss(configer, ignore_index=ignore_index)
        self.ce_weight, self.lovasz_weight = ce_weight, lovasz_weight
        self.ignore_index = ignore_index

    def __call__(self, logits, target):
        target = _scale_target(jnp.asarray(target, jnp.int32),
                               logits.shape[1:3])
        return (self.ce_weight * self.ce(logits, target)
                + self.lovasz_weight
                * lovasz_softmax(logits, target, ignore=self.ignore_index))


# --------------------------------------------------------------------- SegFix
def distance_to_mask_label(distance_map, seg_label_map,
                           boundary_threshold: float = 5.0,
                           ignore_index: int = 255):
    """Boundary mask: 1 where the distance transform is under the threshold
    and the pixel has a valid segmentation label, else 0; invalid pixels
    get -1 (the DTOffsetHelper role the reference imports but lacks)."""
    valid = seg_label_map != ignore_index
    mask = (jnp.asarray(distance_map) < boundary_threshold) & valid
    return jnp.where(valid, mask.astype(jnp.int32), -1)


def angle_to_direction_label(angle_map, seg_label_map,
                             num_directions: int = 8,
                             extra_ignore_mask=None,
                             ignore_index: int = 255):
    """Quantize angles (degrees, [-180,180]) into `num_directions` sectors;
    -1 where the segmentation label is invalid or extra_ignore_mask set."""
    ang = (jnp.asarray(angle_map, jnp.float32) + 180.0) % 360.0
    lab = jnp.floor(ang / (360.0 / num_directions)).astype(jnp.int32)
    lab = jnp.clip(lab, 0, num_directions - 1)
    invalid = seg_label_map == ignore_index
    if extra_ignore_mask is not None:
        invalid = invalid | extra_ignore_mask
    return jnp.where(invalid, -1, lab)


def _balanced_weights(label_map, num_classes: int):
    """(1 − class frequency) weights (SegFixLoss.calc_weights :558-565)."""
    oh = jax.nn.one_hot(jnp.clip(label_map, 0, num_classes - 1), num_classes)
    oh = oh * (label_map >= 0)[..., None]
    counts = jnp.sum(oh.reshape(-1, num_classes), axis=0)
    return 1.0 - counts / jnp.maximum(jnp.sum(counts), 1.0)


class SegFixLoss:
    """Boundary-mask CE + direction CE (ref :545-606). inputs =
    (pred_mask (B,H,W,2), pred_direction (B,H,W,D)); targets =
    (seg_label_map, distance_map, angle_map)."""

    def __init__(self, configer=None, mask_weight: float = 1.0,
                 direction_weight: float = 1.0,
                 mask_threshold: float = 0.5, ignore_index: int = 255):
        self.mask_weight = mask_weight
        self.direction_weight = direction_weight
        self.mask_threshold = mask_threshold
        self.ignore_index = ignore_index

    def __call__(self, inputs, targets):
        pred_mask, pred_direction = inputs
        seg_label, distance_map, angle_map = targets
        gt_mask = distance_to_mask_label(
            distance_map, seg_label, ignore_index=self.ignore_index
        )
        mask_w = _balanced_weights(gt_mask, 2)
        mask_loss = _weighted_ce(pred_mask, gt_mask, mask_w)

        binary = jax.nn.softmax(
            pred_mask.astype(jnp.float32), axis=-1
        )[..., 1] > self.mask_threshold
        gt_dir = angle_to_direction_label(
            angle_map, seg_label, pred_direction.shape[-1],
            extra_ignore_mask=~binary, ignore_index=self.ignore_index,
        )
        dir_w = _balanced_weights(gt_dir, pred_direction.shape[-1])
        dir_loss = _weighted_ce(pred_direction, gt_dir, dir_w)
        return self.mask_weight * mask_loss + self.direction_weight * dir_loss


def _weighted_ce(logits, target, class_weight):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = target >= 0
    t = jnp.clip(target, 0, logits.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, t[..., None], axis=-1)[..., 0]
    w = class_weight[t] * valid
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
