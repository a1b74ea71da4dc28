"""Training step: clip-window loss + optax SGD, re-expressing the reference's
in-forward optimization.

The reference computes losses per frame INSIDE `model.forward`, calls
`.backward()` per frame and steps the optimizer every 2 frames
(`code/helpers/model.py:353-374`, grad-accum of 2). Equivalent functional
formulation: one training step consumes a window of `n_center=2` consecutive
frames (plus the F-1 temporal halo), the loss is the SUM of the two frames'
losses, and one optimizer step is taken — identical effective optimization,
but the whole step is a single compiled XLA graph.

Optimizer matches `code/train.py:80`: SGD(lr=1e-3, momentum=0.9, wd=1e-4),
with weight decay applied additively before momentum exactly like torch SGD.
Only the SlowFast module and RoI heads are trainable; backbone and RPN are
frozen (`model.py:176-179`) and their losses (still reported, like the
reference's `proposal_loses`) carry no gradient.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from slowfast_vos_tpu.models.heads import (
    fastrcnn_loss,
    maskrcnn_loss,
    project_masks_on_boxes,
    select_training_samples,
)
from slowfast_vos_tpu.models.pipeline import ROI_SCALES, Pipeline
from slowfast_vos_tpu.models.rpn import filter_proposals, rpn_loss
from slowfast_vos_tpu.models.segmentation import TRAINABLE_TOPLEVEL
from slowfast_vos_tpu.ops.roi_align_mm import multiscale_roi_align_mmgrad


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any          # trainable subtree ({slow_fast, box_head, mask_head})
    frozen: Any          # frozen subtree ({backbone, rpn})
    batch_stats: Any
    opt_state: Any


def split_params(params: dict, trainable_keys=TRAINABLE_TOPLEVEL):
    trainable = {k: v for k, v in params.items() if k in trainable_keys}
    frozen = {k: v for k, v in params.items() if k not in trainable_keys}
    return trainable, frozen


def make_optimizer(lr: float = 1e-3, momentum: float = 0.9, weight_decay: float = 1e-4):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr, momentum=momentum),
    )


# FrozenBatchNorm's parameter set (models/layers.py:24-27). It is the ONLY
# module in the model whose param dict is exactly these four names (flax
# nn.BatchNorm keeps mean/var in batch_stats, not params), so the key set
# identifies FrozenBN nodes structurally.
_FROZEN_BN_KEYS = frozenset({"scale", "bias", "mean", "var"})


def _is_frozen_bn(node: dict) -> bool:
    return set(node.keys()) == _FROZEN_BN_KEYS and not any(
        isinstance(v, dict) for v in node.values()
    )


def _body_layers_to_train(trainable_backbone_layers: int) -> list[str]:
    """torchvision `_resnet_fpn_extractor` freezing: the trainable stem/stage
    prefixes for a given `trainable_backbone_layers` (default 3 for a
    pretrained detector -> conv1, bn1 and layer1 frozen; the reference's
    fine-tune relies on this via `maskrcnn_resnet50_fpn(pretrained=True)`,
    `code/maskrcnn/maskrcnn_src.py:190`, and its optimizer filters on
    `requires_grad`, :253-255)."""
    order = ["layer4", "layer3", "layer2", "layer1", "conv1"]
    to_train = order[:trainable_backbone_layers]
    if trainable_backbone_layers == 5:
        to_train.append("bn1")
    return to_train


def trainable_labels(trainable: dict, trainable_backbone_layers: int | None = None):
    """'train'/'freeze' label tree (same structure as `trainable`) for
    optax.multi_transform.

    Two freeze sources, both matching torch semantics the reference depends on:

    * FrozenBatchNorm leaves (scale/bias/mean/var) are 'freeze' EVERYWHERE:
      in torchvision FrozenBatchNorm2d these tensors are *buffers* —
      `backbone.parameters()` never yields them, so even freeze='none'
      (`code/osvos/osvos_model.py:25-27`) never updates or weight-decays them.
    * With `trainable_backbone_layers` set, backbone body children outside the
      torchvision trainable set are 'freeze' (FPN stays trainable, as in
      `_resnet_fpn_extractor`).
    """

    def walk(node, freeze):
        if isinstance(node, dict):
            freeze = freeze or _is_frozen_bn(node)
            return {k: walk(v, freeze) for k, v in node.items()}
        return "freeze" if freeze else "train"

    out = {}
    for top, sub in trainable.items():
        if top == "backbone" and trainable_backbone_layers is not None:
            to_train = _body_layers_to_train(trainable_backbone_layers)
            bb = {}
            for part, tree in sub.items():
                if part == "body":
                    bb[part] = {
                        name: walk(t, not any(name.startswith(p) for p in to_train))
                        for name, t in tree.items()
                    }
                else:
                    bb[part] = walk(tree, False)
            out[top] = bb
        else:
            out[top] = walk(sub, False)
    return out


class Trainer:
    """Builds the jitted train step around a Pipeline.

    A training batch (one window) is a dict of device-ready arrays:
      images:      [W, H0, W0, 3] float32 in [0,1], W = n_center + F - 1
      feat_valid:  [W] bool     — False for frames outside the sequence
      frame_valid: [n] bool     — center frames that carry gt (reference skips
                                  no-box frames, model.py:289-312)
      boxes:       [n, G, 4] float32, ORIGINAL resolution XYXY
      labels:      [n, G] int32
      gt_valid:    [n, G] bool
      masks:       [n, G, H0, W0] uint8 binary
    """

    def __init__(
        self,
        pipe: Pipeline,
        *,
        lr: float = 1e-3,
        momentum: float = 0.9,
        weight_decay: float = 1e-4,
        n_center: int = 2,
        train_slow_fast: bool = True,
        train_heads: bool = True,
        train_backbone: bool = False,
        trainable_backbone_layers: int | None = None,
        accumulate: int = 1,
    ):
        """`accumulate > 1` steps the optimizer every k calls (optax
        MultiSteps), matching the reference OSVOS grad-accum of 2 items
        (`code/osvos/osvos_model.py:89-93`). The unsupervised path instead
        packs 2 frames into one window (n_center=2), so accumulate stays 1.

        Freeze-policy mapping (reference `osvos_model.py:12-29`):
          'none'  -> train_backbone=True,  train_slow_fast=True
          'SF'    -> train_backbone=True,  train_slow_fast=False
          'BB_SF' -> train_backbone=False, train_slow_fast=False
        RoI heads are always trainable."""
        self.pipe = pipe
        self.n_center = n_center
        keys = []
        if train_slow_fast:
            keys.append("slow_fast")
        if train_heads:
            keys += ["box_head", "mask_head"]
        if train_backbone:
            keys += ["backbone", "rpn"]
        self.trainable_keys = tuple(keys)
        self.backbone_trainable = train_backbone
        tbl = trainable_backbone_layers if train_backbone else None
        # Leaf-level freeze partition: `set_to_zero` makes the masked leaves'
        # updates exact zeros, so FrozenBN statistics (and, in pretrain mode,
        # conv1/layer1) stay bit-identical across steps — never momentum-
        # updated, never weight-decayed. `optax.masked` would pass the raw
        # gradient through for masked-out leaves, which is why it isn't used.
        tx = optax.multi_transform(
            {"train": make_optimizer(lr, momentum, weight_decay), "freeze": optax.set_to_zero()},
            lambda params: trainable_labels(params, tbl),
        )
        self.tx = optax.MultiSteps(tx, accumulate) if accumulate > 1 else tx
        self._step = jax.jit(self._step_impl)

    def init_state(self, variables: dict) -> TrainState:
        trainable, frozen = split_params(variables["params"], self.trainable_keys)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=trainable,
            frozen=frozen,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(trainable),
        )

    # -- loss ---------------------------------------------------------------

    def _loss_fn(self, trainable, frozen, batch_stats, key, batch):
        pipe = self.pipe
        cfg = pipe.cfg
        model = pipe.model
        variables = {"params": {**trainable, **frozen}, "batch_stats": batch_stats}
        f = pipe.sf.fast
        n = self.n_center

        images = pipe.transform(batch["images"])  # [W, Hc, Wc, 3]
        feats = model.apply(variables, images, method="backbone_feats")
        if not self.backbone_trainable:
            feats = jax.tree.map(jax.lax.stop_gradient, feats)
        fv = batch["feat_valid"]
        feats = [jnp.where(fv[:, None, None, None], fl, 0.0) for fl in feats]

        center = slice(f // 2, f // 2 + n)
        center_feats = [fl[center] for fl in feats]

        # RPN on raw center-frame features. When the backbone is frozen the
        # proposal losses are reported constants, matching the reference's
        # no-grad proposal losses; with a trainable backbone (OSVOS 'none'/'SF'
        # policies) they backprop, as in `osvos_model.py:50-58`.
        obj, dlt = model.apply(variables, center_feats, method="rpn_predict")
        if not self.backbone_trainable:
            obj = jax.tree.map(jax.lax.stop_gradient, obj)
            dlt = jax.tree.map(jax.lax.stop_gradient, dlt)
        proposals, _scores, pvalid = filter_proposals(
            obj, dlt, pipe.anchors, image_hw=pipe.image_hw, cfg=cfg, training=True
        )
        # Box coordinates never carry gradients (torchvision roi_align is not
        # differentiable w.r.t. roi coords; ours is, so cut it explicitly).
        proposals = jax.lax.stop_gradient(proposals)

        gt_boxes = pipe.transform.transform_boxes(batch["boxes"])  # canvas coords
        gt_valid = batch["gt_valid"] & batch["frame_valid"][:, None]
        key_rpn, key_sample = jax.random.split(key)
        obj_loss, rpn_box_loss = rpn_loss(
            key_rpn, obj, dlt, pipe.anchors, gt_boxes, gt_valid, cfg
        )

        # SlowFast enhancement of the window (train-mode BN).
        enhanced, bn_updates = model.apply(
            variables,
            feats[:4],
            method="enhance",
            train=True,
            pre_padded=True,
            mutable=["batch_stats"],
        )

        # Per-frame training sample selection.
        skeys = jax.random.split(key_sample, n)
        samples = jax.vmap(
            lambda k, pr, pv, gb, gl, gv: select_training_samples(k, pr, pv, gb, gl, gv, cfg)
        )(skeys, proposals, pvalid, gt_boxes, batch["labels"], gt_valid)

        # Box branch. Gather-form RoIAlign FORWARD (exact, cheap) with the
        # separable-matmul TRANSPOSE as its custom-VJP backward: autodiff of
        # the gather yields scatter-adds that were the single largest cost
        # of the step (8 x ~3.5 ms on v5e); the matmul gradient is the same
        # linear map as dense MXU work (ops/roi_align_mm.py). The all-matmul
        # form (fwd too) was measured to TIE in the full step — its
        # [block, 7, W, C] forward temporaries cost the standalone win back
        # in HBM traffic under the 2-frame vmap.
        pooled7 = jax.vmap(
            lambda l0, l1, l2, l3, rois: multiscale_roi_align_mmgrad(
                [l0, l1, l2, l3], rois, ROI_SCALES, output_size=7
            )
        )(*enhanced, samples["boxes"])
        bsz = samples["boxes"].shape[1]
        cls, reg = model.apply(
            variables, pooled7.reshape(n * bsz, 7, 7, pooled7.shape[-1]), method="box_predict"
        )
        cls = cls.reshape(n, bsz, -1)
        reg = reg.reshape(n, bsz, cfg.num_classes, 4)
        cls_l, box_l = jax.vmap(fastrcnn_loss)(cls, reg, samples)

        # Mask branch on the leading (positive-first) sampled rois.
        mr = min(cfg.mask_train_rois, bsz)
        mask_rois = samples["boxes"][:, :mr]
        mask_labels = samples["labels"][:, :mr]
        mask_valid = samples["is_pos"][:, :mr]
        matched = samples["matched_gt"][:, :mr]

        # gt masks -> canvas resolution (device-side resize + pad).
        g = batch["masks"].shape[1]
        rh, rw = pipe.transform.resized_hw
        ch, cw = pipe.transform.canvas_hw
        masks_resized = jax.image.resize(
            batch["masks"].astype(jnp.float32), (n, g, rh, rw), method="bilinear"
        )
        masks_canvas = jnp.pad(
            (masks_resized >= 0.5).astype(jnp.float32),
            ((0, 0), (0, 0), (0, ch - rh), (0, cw - rw)),
        )

        mask_targets = jax.vmap(
            lambda ms, gi, bx: project_masks_on_boxes(ms, gi, bx, cfg.mask_out_size)
        )(masks_canvas, matched, mask_rois)

        pooled14 = jax.vmap(
            lambda l0, l1, l2, l3, rois: multiscale_roi_align_mmgrad(
                [l0, l1, l2, l3], rois, ROI_SCALES, output_size=cfg.mask_roi_size
            )
        )(*enhanced, mask_rois)
        mask_logits = model.apply(
            variables, pooled14.reshape(n * mr, *pooled14.shape[2:]), method="mask_predict"
        ).reshape(n, mr, cfg.mask_out_size, cfg.mask_out_size, cfg.num_classes)
        mask_l = jax.vmap(maskrcnn_loss)(mask_logits, mask_targets, mask_labels, mask_valid)

        fvalid = batch["frame_valid"].astype(jnp.float32)
        # SUM over center frames = reference's per-frame backward + accum-2 step.
        trainable_loss = ((cls_l + box_l + mask_l) * fvalid).sum()
        rpn_total = obj_loss + rpn_box_loss
        if not self.backbone_trainable:
            rpn_total = jax.lax.stop_gradient(rpn_total)
        total = trainable_loss + rpn_total * fvalid.sum() / jnp.maximum(fvalid.sum(), 1)
        metrics = {
            "loss": total,
            "loss_classifier": (cls_l * fvalid).sum(),
            "loss_box_reg": (box_l * fvalid).sum(),
            "loss_mask": (mask_l * fvalid).sum(),
            "loss_objectness": obj_loss,
            "loss_rpn_box_reg": rpn_box_loss,
        }
        # When the SlowFast stage is bypassed (use_slow_fast=False) no BN runs
        # and the mutable update is empty — keep the existing stats rather
        # than clobbering them.
        new_bn = bn_updates.get("batch_stats") or batch_stats
        return total, (metrics, new_bn)

    # -- step ---------------------------------------------------------------

    def _step_impl(self, state: TrainState, key, batch):
        (loss, (metrics, new_bn)), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            state.params, state.frozen, state.batch_stats, key, batch
        )
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bn,
                opt_state=new_opt,
            ),
            metrics,
        )

    def step(self, state: TrainState, key, batch):
        return self._step(state, key, batch)

    def eval_variables(self, state: TrainState) -> dict:
        return {
            "params": {**state.params, **state.frozen},
            "batch_stats": state.batch_stats,
        }
