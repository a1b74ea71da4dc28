"""Device-level data-parallel inference: N sequence streams in lockstep.

The reference shards eval work only across *processes* (DistributedSampler,
`code/maskrcnn/train.py:73-74`); a single host with several chips would run
inference on one device and idle the rest. Here the sequence axis is mapped
onto the local mesh: each device owns one DAVIS sequence and the whole
superchunk pipeline (`models/pipeline.py`) runs as ONE shard_mapped SPMD
program per chunk step — the per-device computation is byte-for-byte the
single-sequence graph, so results are bit-identical to the serial loop
(tested: tests/test_dp_infer.py asserts a byte-identical PNG tree).

Design notes:
* Sequences in a group advance in lockstep: `steps = ceil(max_t / SC)` chunk
  calls; shorter sequences pad with zero frames + feat_valid=False (exactly
  the serial tail-padding semantics) and their excess outputs are dropped on
  host, so no cross-device synchronization cost beyond the step barrier.
* The F-1 backbone-feature carry (`_superchunk_carry_impl`) stays sharded on
  device between steps — upload traffic per step is SC new frames per device.
* Groups are consecutive slices of the sequence list; a trailing group
  smaller than the mesh wrap-fills with repeats of its first member (same
  policy as the DP trainer's wrap-fill), whose duplicate outputs are dropped.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def infer_mesh(max_devices: int | None = None) -> Mesh | None:
    """Mesh over the local devices for device-parallel inference, or None when
    only one device is visible (the serial path is then strictly better)."""
    devices = jax.local_devices()
    if max_devices is not None:
        devices = devices[:max_devices]
    if len(devices) <= 1:
        return None
    return Mesh(np.asarray(devices), ("data",))


class DeviceParallelInference:
    """Runs `pipe.infer_sequence` semantics over groups of sequences, one
    sequence per local device."""

    def __init__(
        self,
        pipe,
        mesh: Mesh,
        *,
        instance_masks: bool = False,
        stacked_variables: bool = False,
    ):
        """`stacked_variables=True`: every `variables` leaf carries a leading
        [n_devices] axis sharded over 'data' — each device runs its OWN
        parameters on its own sequence (the OSVOS lockstep fine-tune eval,
        where the 20 per-sequence models all differ). Default: variables are
        replicated (one model, many sequences)."""
        self.pipe = pipe
        self.mesh = mesh
        self.n = mesh.devices.size
        self.instance_masks = instance_masks
        self.stacked_variables = stacked_variables
        im = instance_masks
        unstack = (lambda v: jax.tree.map(lambda x: x[0], v)) if stacked_variables else (lambda v: v)

        def first(variables, images, feat_valid):
            outs, carry = pipe._superchunk_first_impl(
                unstack(variables), images[0], feat_valid[0], instance_masks=im
            )
            return tuple(o[None] for o in outs), [c[None] for c in carry]

        def carry_step(variables, images, feat_valid, carry):
            outs, new_carry = pipe._superchunk_carry_impl(
                unstack(variables), images[0], feat_valid[0], [c[0] for c in carry],
                instance_masks=im,
            )
            return tuple(o[None] for o in outs), [c[None] for c in new_carry]

        def plain(variables, images, feat_valid):
            outs = pipe._superchunk_impl(
                unstack(variables), images[0], feat_valid[0], instance_masks=im
            )
            return tuple(o[None] for o in outs)

        d = P("data")
        v = d if stacked_variables else P()
        carry_spec = [d] * 5  # 5 FPN levels
        self._first = jax.jit(jax.shard_map(
            first, mesh=mesh, in_specs=(v, d, d),
            out_specs=((d,) * 5, carry_spec), check_vma=False,
        ))
        self._carry = jax.jit(jax.shard_map(
            carry_step, mesh=mesh, in_specs=(v, d, d, carry_spec),
            out_specs=((d,) * 5, carry_spec), check_vma=False,
        ))
        self._plain = jax.jit(jax.shard_map(
            plain, mesh=mesh, in_specs=(v, d, d), out_specs=(d,) * 5,
            check_vma=False,
        ))

    def _shard(self, x):
        return jax.device_put(
            x, NamedSharding(self.mesh, P("data", *([None] * (np.ndim(x) - 1))))
        )

    def infer_group(self, variables, group: list[np.ndarray]) -> list[list[dict[str, Any]]]:
        """group: up to `n` sequences [T_i, H, W, 3] (uint8 or float32 in
        [0,1]), all at one original resolution. Returns per-sequence detection
        lists with exactly the serial `infer_sequence` contract."""
        pipe = self.pipe
        assert 1 <= len(group) <= self.n, (len(group), self.n)
        real = len(group)
        group = group + [group[0]] * (self.n - real)  # wrap-fill trailing group

        lengths = [g.shape[0] for g in group]
        max_t = max(lengths)
        sc = pipe.superchunk
        hl, hr = pipe.halo_left, pipe.halo_right
        f = pipe.sf.fast
        h0, w0 = group[0].shape[1:3]
        use_carry = f > 1

        carry = None
        pending = []  # (chunk_start, sharded outs tuple)
        for c in range(0, max_t, sc):
            widxs = np.arange(c - hl, c + sc + hr)
            idxs = widxs if carry is None else widxs[f - 1:]
            images = np.zeros((self.n, len(idxs), h0, w0, 3), group[0].dtype)
            feat_valid = np.zeros((self.n, len(widxs)), bool)
            for k, seq in enumerate(group):
                t = lengths[k]
                in_range = (idxs >= 0) & (idxs < t)
                images[k, in_range] = seq[idxs[in_range]]
                feat_valid[k] = (widxs >= 0) & (widxs < t)
            dev_images = self._shard(jnp.asarray(images))
            dev_valid = self._shard(jnp.asarray(feat_valid))
            if not use_carry:
                outs = self._plain(variables, dev_images, dev_valid)
            elif carry is None:
                outs, carry = self._first(variables, dev_images, dev_valid)
            else:
                outs, carry = self._carry(variables, dev_images, dev_valid, carry)
            pending.append((c, outs))

        # Concatenate per-chunk results on device (frame axis 1), fetch once.
        cat = [jnp.concatenate([p[1][i] for p in pending], axis=1) for i in range(5)]
        fboxes, fscores, flabels, fvalid, fmasks = jax.device_get(cat)

        results = []
        for k in range(real):
            t = lengths[k]
            out = []
            for g in range(t):
                if self.instance_masks:
                    union = ((fmasks[k, g] >= 0.5) & fvalid[k, g][:, None, None]).any(0)
                else:
                    union = np.unpackbits(fmasks[k, g], axis=-1, count=w0).astype(bool)
                det = {
                    "boxes": fboxes[k, g],
                    "scores": fscores[k, g],
                    "labels": flabels[k, g],
                    "valid": fvalid[k, g],
                    "union_mask": union,
                }
                if self.instance_masks:
                    det["masks"] = fmasks[k, g]
                out.append(det)
            results.append(out)
        return results
