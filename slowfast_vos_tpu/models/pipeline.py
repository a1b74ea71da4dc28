"""Clip-level orchestration: jitted stages + host chunking for full sequences.

This is the TPU-native restructuring of the reference's hot loop
(`code/helpers/model.py:275-389`): instead of a per-frame Python loop that
slices windows, caches features, and steps the optimizer, we run

  1. `backbone_rpn_batch` — frozen backbone + RPN over fixed-size frame
     batches (one compiled graph reused across the sequence),
  2. a single HBM-resident, zero-halo-padded feature buffer per FPN level
     (the "shared decoded buffer" of BASELINE.json's north star: slow and
     fast pathways read the same buffer),
  3. `detect_chunk` — SlowFast enhancement of a feature window (pre-padded
     streaming mode) + RoI heads for E frames at a time,
  4. `finalize_frame` — detection postprocess back to original resolution
     with on-device mask pasting (torchvision's CPU paste loop replaced by
     `ops/paste_masks.py`).

All stage shapes are static; sequences of any length stream through without
recompilation.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from slowfast_vos_tpu.models.anchors import fpn_anchors
from slowfast_vos_tpu.models.config import DetectionConfig, SlowFastConfig
from slowfast_vos_tpu.models.resnet_fpn import FPN_STRIDES
from slowfast_vos_tpu.models.rpn import filter_proposals
from slowfast_vos_tpu.models.segmentation import SlowFastMaskRCNN
from slowfast_vos_tpu.models.transform import ImageTransform
from slowfast_vos_tpu.ops.paste_masks import paste_masks_in_image
from slowfast_vos_tpu.ops.roi_align import multiscale_roi_align
from slowfast_vos_tpu.models.heads import postprocess_detections_single

ROI_SCALES = (1 / 4, 1 / 8, 1 / 16, 1 / 32)


class Pipeline:
    """Wires model + static geometry into reusable jitted stage functions."""

    def __init__(
        self,
        model: SlowFastMaskRCNN,
        transform: ImageTransform,
        *,
        backbone_batch: int = 8,
        chunk: int = 8,
        superchunk: int = 32,
        pallas_pool7: bool | None = None,
    ):
        """`pallas_pool7`: pool the 1000-proposal 7x7 RoIAlign with the
        Pallas patch-DMA kernel (measured 1.8x over the XLA gather at
        production shape, scripts/profile_roialign.py). Default: on for TPU
        backends, off elsewhere (the kernel's interpret mode is slow on
        CPU). Set False for exact torchvision numerics on rois with aspect
        ratio beyond ~4:1 (the kernel's documented patch-clamp tail); the
        10-detection 14x14 mask pool always uses the exact gather form."""
        if pallas_pool7 is None:
            # Allowlist, not blocklist: the kernel uses TPU-only Pallas
            # primitives (interpret=False), so a GPU or other non-CPU backend
            # must fall back to the exact gather form rather than crash.
            pallas_pool7 = jax.default_backend() in ("tpu", "axon")
        self.pallas_pool7 = pallas_pool7
        self.superchunk = superchunk
        self.model = model
        self.cfg: DetectionConfig = model.cfg
        self.sf: SlowFastConfig = model.sf
        self.transform = transform
        self.backbone_batch = backbone_batch
        self.chunk = chunk

        ch, cw = transform.canvas_hw
        self.feature_hws = [(ch // s, cw // s) for s in FPN_STRIDES]
        self.anchors = tuple(jnp.asarray(a) for a in fpn_anchors(self.feature_hws))
        # torchvision clips proposals to the resized (un-padded) image extent.
        self.image_hw = (float(transform.resized_hw[0]), float(transform.resized_hw[1]))

        f = self.sf.fast
        self.halo_left = f // 2
        self.halo_right = -(-f // 2) - 1

        self._backbone_rpn = jax.jit(self._backbone_rpn_impl, static_argnames=("training",))
        self._detect_chunk = jax.jit(self._detect_chunk_impl)
        self._finalize = jax.jit(self._finalize_impl)
        self._finalize_instances = jax.jit(self._finalize_instances_impl)
        self._superchunk = jax.jit(
            self._superchunk_impl, static_argnames=("instance_masks",)
        )
        self._superchunk_first = jax.jit(
            self._superchunk_first_impl, static_argnames=("instance_masks",)
        )
        self._superchunk_carry = jax.jit(
            self._superchunk_carry_impl, static_argnames=("instance_masks",)
        )

    # ---- jitted stage impls -------------------------------------------------

    def _backbone_rpn_impl(self, variables, images, training: bool = False):
        """images [B, Hc, Wc, 3] (normalized) -> (feats, proposals, pvalid)."""
        feats = self.model.apply(variables, images, method="backbone_feats")
        feats = jax.tree.map(jax.lax.stop_gradient, feats)
        obj, dlt = self.model.apply(variables, feats, method="rpn_predict")
        obj = jax.tree.map(jax.lax.stop_gradient, obj)
        dlt = jax.tree.map(jax.lax.stop_gradient, dlt)
        proposals, _scores, pvalid = filter_proposals(
            obj, dlt, self.anchors, image_hw=self.image_hw, cfg=self.cfg, training=training
        )
        return feats, proposals, pvalid

    def _roi_forward(self, variables, enhanced, proposals, pvalid):
        """Shared RoI-head forward on enhanced features.

        enhanced: 4 levels [E, h, w, 256]; proposals [E, P, 4] -> detections.
        """
        e, p = proposals.shape[:2]

        # Sequential over frames (lax.map, not vmap): the gather temporaries
        # of RoIAlign scale with frames x rois x bins x channels and OOM HBM
        # if all frames pool at once; per-frame they are a few hundred MB.
        # The hot 1000-proposal pool rides the Pallas patch-DMA kernel on
        # TPU (1.8x over the gather form; pallas_pool7 docstring).
        if self.pallas_pool7:
            from slowfast_vos_tpu.ops.roi_align_pallas import multiscale_roi_align_pallas

            pool7_fn = multiscale_roi_align_pallas
        else:
            pool7_fn = multiscale_roi_align
        pooled7 = jax.lax.map(
            lambda a: pool7_fn(
                [a[0], a[1], a[2], a[3]], a[4], ROI_SCALES, output_size=7
            ),
            (*enhanced, proposals),
        )
        cls, reg = self.model.apply(
            variables, pooled7.reshape(e * p, 7, 7, pooled7.shape[-1]), method="box_predict"
        )
        cls = cls.reshape(e, p, -1)
        reg = reg.reshape(e, p, self.cfg.num_classes, 4)

        boxes, scores, labels, dvalid = jax.vmap(
            lambda c, r, pr, pv: postprocess_detections_single(
                c, r, pr, pv, self.image_hw, self.cfg
            )
        )(cls, reg, proposals, pvalid)

        d = boxes.shape[1]
        # vmap (not lax.map): at detections_per_img rois the gather
        # temporaries are tiny, and the per-frame map paid ~1.5 ms/frame of
        # dispatch overhead (48 ms/superchunk for 320 rois, measured).
        pooled14 = jax.vmap(
            lambda l0, l1, l2, l3, b: multiscale_roi_align(
                [l0, l1, l2, l3], b, ROI_SCALES, output_size=self.cfg.mask_roi_size
            )
        )(*enhanced, boxes)
        mask_logits = self.model.apply(
            variables, pooled14.reshape(e * d, *pooled14.shape[2:]), method="mask_predict"
        ).reshape(e, d, self.cfg.mask_out_size, self.cfg.mask_out_size, self.cfg.num_classes)
        sel = labels[:, :, None, None, None]
        mask_probs = jax.nn.sigmoid(
            jnp.take_along_axis(mask_logits, sel.repeat(self.cfg.mask_out_size, 2).repeat(self.cfg.mask_out_size, 3), axis=4)
        )[..., 0]
        return boxes, scores, labels, dvalid, mask_probs

    def _detect_chunk_impl(self, variables, feat_window, proposals, pvalid):
        """feat_window: 4 levels [E + F - 1, h, w, 256] (halo included)."""
        enhanced = self.model.apply(
            variables, feat_window, method="enhance", train=False, pre_padded=True
        )
        return self._roi_forward(variables, enhanced, proposals, pvalid)

    def _finalize_impl(self, boxes, scores, labels, valid, mask_probs):
        """Canvas-space detections -> original-resolution boxes + pasted masks.

        Returns per-frame UNION mask (>=0.5, uint8) — 2 orders of magnitude
        less device->host traffic than per-detection float masks, and exactly
        what the DAVIS PNG contract needs (`davis_evaluate.py:36-44`).
        """
        orig_boxes = self.transform.inverse_boxes(boxes)
        masks = jax.vmap(
            lambda m, b, v: paste_masks_in_image(m, b, self.transform.original_hw, v)
        )(mask_probs, orig_boxes, valid)
        union = ((masks >= 0.5) & valid[:, :, None, None]).any(axis=1)
        # Bit-pack the union masks: device->host link latency/bandwidth is the
        # wall for this pipeline (measured 8x win over byte masks).
        packed = jnp.packbits(union, axis=-1)
        return orig_boxes, scores, labels, valid, packed

    def _finalize_instances_impl(self, boxes, scores, labels, valid, mask_probs):
        """Variant returning full per-detection mask probabilities (viz /
        prediction drivers)."""
        orig_boxes = self.transform.inverse_boxes(boxes)
        masks = jax.vmap(
            lambda m, b, v: paste_masks_in_image(m, b, self.transform.original_hw, v)
        )(mask_probs, orig_boxes, valid)
        return orig_boxes, scores, labels, valid, masks

    def _superchunk_impl(self, variables, images, feat_valid, instance_masks: bool = False):
        """The WHOLE inference pipeline for one superchunk in ONE compiled
        graph: transform -> backbone -> RPN -> SlowFast -> RoI heads ->
        original-resolution finalize.

        One device call per ~`chunk` frames instead of four — essential when
        the chip sits behind a high-latency tunnel, and lets XLA overlap
        stages it could never see across separate dispatches.

        images: [SC + F - 1, H0, W0, 3] uint8 (halo frames included; zero +
        feat_valid=False beyond the sequence ends), or a (y, uv) tuple of
        YUV 4:2:0 planes (half the upload bytes — the tunnel's transfer
        bandwidth is the wall-clock bottleneck; see `rgb_to_yuv420`).
        """
        if isinstance(images, tuple):
            y, uv = images
            sc = y.shape[0] - (self.sf.fast - 1)
            canvas = self.transform.from_yuv420(y, uv)
        else:
            sc = images.shape[0] - (self.sf.fast - 1)
            canvas = self.transform(images)
        feats = self.model.apply(variables, canvas, method="backbone_feats")
        outs, _carry = self._detect_finalize(
            variables, feats, feat_valid, sc, instance_masks
        )
        return outs

    def _superchunk_first_impl(self, variables, images, feat_valid, instance_masks: bool = False):
        """`_superchunk_impl` that ALSO returns the backbone-feature carry for
        the next chunk (`infer_sequence`'s first chunk; see
        `_superchunk_carry_impl`)."""
        if isinstance(images, tuple):
            y, uv = images
            sc = y.shape[0] - (self.sf.fast - 1)
            canvas = self.transform.from_yuv420(y, uv)
        else:
            sc = images.shape[0] - (self.sf.fast - 1)
            canvas = self.transform(images)
        feats = self.model.apply(variables, canvas, method="backbone_feats")
        return self._detect_finalize(variables, feats, feat_valid, sc, instance_masks)

    def _superchunk_carry_impl(
        self, variables, images, feat_valid, carry, instance_masks: bool = False
    ):
        """Steady-state superchunk: consumes only the SC NEW frames plus the
        F-1 overlap frames' backbone features carried on-device from the
        previous chunk. Consecutive windows overlap by F-1 frames (the
        temporal halo); recomputing transform+backbone on them cost
        ~11 ms/superchunk of device time AND re-uploaded 2 of 34 frames per
        chunk on a link where upload bytes are the wall-clock bottleneck
        (CLAUDE.md). The carried features were masked by the previous
        chunk's feat_valid for the same global frames, so the reuse is an
        exact reformulation of the full recompute (numeric scope below).

        images: [SC, H0, W0, 3] (or YUV tuple) — frames [c+hr, c+sc+hr);
        feat_valid: [SC+F-1] for the FULL window [c-hl, c+sc+hr);
        carry: 5 levels [F-1, h, w, 256] — features of [c-hl, c+hr).

        Exactness scope of the carry contract (measured, round 5): the
        reformulation is mathematically exact, and results are bit-identical
        to the plain full-window graph on single-device XLA:CPU
        (tests/test_pipeline_inference.py pins this via
        `scripts/verify_carry_tpu.py --platform cpu`). It is NOT bit-exact
        wherever XLA lowers the batch-SC carry backbone and the
        batch-SC+F-1 plain backbone differently: under the 8-VIRTUAL-device
        CPU test mesh (reduced per-device thread budget), per-frame backbone
        outputs differ at bf16 ulp (max 6.3e-2, 6-11% of elements per FPN
        level, isolated-jit reproduction), and on the v5e TPU backend the
        same mechanism leaves a small bounded drift (tiny-shape measurement,
        `scripts/verify_carry_tpu.py`: boxes <= 0.28 px, scores <= 2.1e-3,
        isolated mask boundary pixels — far inside the 0.5-pt J&F parity
        budget). Padding the carry batch to SC+F-1 does NOT restore
        exactness (same-shape subgraphs inside different mega-graph
        executables still partition differently); the by-construction remedy
        — every path sharing ONE fixed-batch backbone executable + ONE
        detect executable, host-composed — is designed but not adopted (it
        forfeits the single-dispatch superchunk consolidation this tunnel
        environment depends on, and risks the same cross-executable variance
        in the dp-vs-serial contracts that currently hold).
        """
        sc = images[0].shape[0] if isinstance(images, tuple) else images.shape[0]
        canvas = (
            self.transform.from_yuv420(*images)
            if isinstance(images, tuple)
            else self.transform(images)
        )
        new_feats = self.model.apply(variables, canvas, method="backbone_feats")
        feats = [jnp.concatenate([cf, nf]) for cf, nf in zip(carry, new_feats)]
        return self._detect_finalize(variables, feats, feat_valid, sc, instance_masks)

    def _detect_finalize(self, variables, feats, feat_valid, sc, instance_masks):
        """Shared superchunk core: masked features -> RPN -> SlowFast ->
        RoI heads -> finalize. Returns (outputs, carry) where carry is the
        last F-1 frames' (masked) features of all 5 levels — exactly the
        next window's overlap [c+sc-hl, c+sc+hr)."""
        # Zero the features of frames beyond the sequence ends so the temporal
        # convs see zero contributions (reference zero-padding semantics,
        # model.py:215-225). This masking is FREE on device: XLA fuses the
        # select into the FPN output convs' epilogues (measured — a
        # static-specialized no-mask variant replaced the 18.87 ms
        # add_select_fusion with an 18.90 ms convolution_add_fusion of the
        # same shape; the specialization was removed again as pure compile
        # overhead).
        feats = [jnp.where(feat_valid[:, None, None, None], fl, 0.0) for fl in feats]

        center = slice(self.halo_left, self.halo_left + sc)
        center_feats = [fl[center] for fl in feats]
        obj, dlt = self.model.apply(variables, center_feats, method="rpn_predict")
        proposals, _scores, pvalid = filter_proposals(
            obj, dlt, self.anchors, image_hw=self.image_hw, cfg=self.cfg, training=False
        )

        enhanced = self.model.apply(
            variables, feats[:4], method="enhance", train=False, pre_padded=True
        )
        boxes, scores, labels, dvalid, mask_probs = self._roi_forward(
            variables, enhanced, proposals, pvalid
        )
        finalize = self._finalize_instances_impl if instance_masks else self._finalize_impl
        return finalize(boxes, scores, labels, dvalid, mask_probs), [
            fl[sc:] for fl in feats
        ]

    def forward_superchunk(self, variables, images, feat_valid):
        """PUBLIC jittable full-pipeline forward on one superchunk — the
        stable entry-point contract for external drivers (`__graft_entry__`).

        images: [SC + F - 1, H0, W0, 3] uint8/float (halo frames included),
        feat_valid: [SC + F - 1] bool (False for zero halo frames beyond the
        sequence ends). Returns (orig_boxes, scores, labels, valid, packed
        union masks) — see `_superchunk_impl`.
        """
        return self._superchunk_impl(variables, images, feat_valid)

    # ---- host drivers -------------------------------------------------------

    def compute_sequence_features(self, variables, images: np.ndarray):
        """Run frozen backbone+RPN over a whole sequence in static batches.

        images: [T, H, W, 3] float32 in [0,1] at ORIGINAL resolution.
        Returns (feats_padded: 4 levels [T+F-1, ...] with zero halo,
                 proposals [T, P, 4], pvalid [T, P]).
        """
        t = images.shape[0]
        b = self.backbone_batch
        feats_parts, prop_parts, pvalid_parts = [], [], []
        for i in range(0, t, b):
            batch = images[i : i + b]
            n = batch.shape[0]
            if n < b:
                batch = np.concatenate([batch, np.zeros((b - n, *batch.shape[1:]), batch.dtype)])
            canvas = self.transform(jnp.asarray(batch))
            feats, proposals, pvalid = self._backbone_rpn(variables, canvas)
            feats_parts.append([f[:n] for f in feats[:4]])
            prop_parts.append(proposals[:n])
            pvalid_parts.append(pvalid[:n])
        feats = [
            jnp.concatenate([p[lvl] for p in feats_parts], axis=0) for lvl in range(4)
        ]
        feats_padded = [
            jnp.pad(f, ((self.halo_left, self.halo_right), (0, 0), (0, 0), (0, 0)))
            for f in feats
        ]
        return feats_padded, jnp.concatenate(prop_parts), jnp.concatenate(pvalid_parts)

    def infer_sequence(
        self,
        variables,
        images: np.ndarray,
        *,
        instance_masks: bool = False,
        transport: str = "rgb",
    ) -> list[dict[str, Any]]:
        """Full-sequence inference at original resolution.

        Returns one dict per frame: boxes [D,4], scores [D], labels [D],
        valid [D], union_mask [H,W] uint8 (union of detections >= 0.5), and —
        only with `instance_masks=True` — masks [D, H, W] probabilities.
        `images` may be uint8 (preferred) or float32 in [0,1].

        The whole pipeline runs as ONE device call per `superchunk` frames;
        union masks come back bit-packed in ONE fetch at sequence end.
        `transport="yuv420"` uploads 4:2:0 planes instead of raw RGB — half
        the bytes on a link that does not overlap transfers with compute
        (measured: the dominant wall-clock term). DAVIS sources are 4:2:0
        JPEGs, so the chroma loss mirrors the source material; use "rgb" for
        exact-parity runs.
        """
        t = images.shape[0]
        sc = self.superchunk
        hl, hr = self.halo_left, self.halo_right
        w = images.shape[2]
        if transport == "yuv420":
            from slowfast_vos_tpu.models.transform import rgb_to_yuv420

        # Steady-state chunks carry the F-1 overlap frames' backbone features
        # on-device (`_superchunk_carry_impl`): only the SC new frames are
        # uploaded and run through transform+backbone. An exact reformulation
        # of the full recompute — bit-identical on single-device XLA:CPU,
        # bf16-ulp-bounded elsewhere (see `_superchunk_carry_impl`'s
        # exactness-scope note); F=1 has no overlap, so no carry path.
        use_carry = self.sf.fast > 1
        carry = None
        pending = []
        for c in range(0, t, sc):
            widxs = np.arange(c - hl, c + sc + hr)
            in_range = (widxs >= 0) & (widxs < t)
            idxs = widxs if carry is None else widxs[self.sf.fast - 1 :]
            window = images[np.clip(idxs, 0, t - 1)].copy()
            window[~((idxs >= 0) & (idxs < t))] = 0
            if transport == "yuv420":
                y, uv = rgb_to_yuv420(window)
                dev_images = (jnp.asarray(y), jnp.asarray(uv))
            else:
                dev_images = jnp.asarray(window)
            if carry is None and use_carry:
                outs, carry = self._superchunk_first(
                    variables, dev_images, jnp.asarray(in_range),
                    instance_masks=instance_masks,
                )
            elif carry is None:
                outs = self._superchunk(
                    variables, dev_images, jnp.asarray(in_range),
                    instance_masks=instance_masks,
                )
            else:
                outs, carry = self._superchunk_carry(
                    variables, dev_images, jnp.asarray(in_range), carry,
                    instance_masks=instance_masks,
                )
            pending.append((min(sc, t - c), outs))

        # Concatenate per-chunk results on device, fetch once.
        cat = [jnp.concatenate([p[1][i] for p in pending]) for i in range(5)]
        fboxes, fscores, flabels, fvalid, fmasks = jax.device_get(cat)

        out: list[dict[str, Any]] = []
        for ci, (n, _) in enumerate(pending):
            for f in range(n):
                g = ci * sc + f
                if instance_masks:
                    union = ((fmasks[g] >= 0.5) & fvalid[g][:, None, None]).any(0)
                else:
                    union = np.unpackbits(fmasks[g], axis=-1, count=w).astype(bool)
                det = {
                    "boxes": fboxes[g],
                    "scores": fscores[g],
                    "labels": flabels[g],
                    "valid": fvalid[g],
                    "union_mask": union,
                }
                if instance_masks:
                    det["masks"] = fmasks[g]
                out.append(det)
        return out


def build_pipeline(
    slow: int = 3,
    fast: int = 3,
    original_hw: tuple[int, int] = (480, 854),
    *,
    num_classes: int = 2,
    dtype=jnp.bfloat16,
    min_size: int = 800,
    max_size: int = 1333,
    cfg: DetectionConfig | None = None,
    use_slow_fast: bool = True,
    s2d_stem: bool = False,
    **kw,
) -> tuple[Pipeline, SlowFastMaskRCNN]:
    cfg = cfg or DetectionConfig(num_classes=num_classes)
    sf = SlowFastConfig(slow=slow, fast=fast)
    model = SlowFastMaskRCNN(
        cfg=cfg, sf=sf, dtype=dtype, use_slow_fast=use_slow_fast, s2d_stem=s2d_stem
    )
    transform = ImageTransform(original_hw, min_size=min_size, max_size=max_size)
    return Pipeline(model, transform, **kw), model


def init_variables(model: SlowFastMaskRCNN, key) -> dict:
    """Initialize all parameters with tiny dummy shapes (weights are shape-
    agnostic for convs/BN; only Dense layers need the real pooled size, which
    is static anyway)."""
    dummy = jnp.zeros((max(model.sf.fast, 2), 64, 64, 3), jnp.float32)
    return model.init(key, dummy)
