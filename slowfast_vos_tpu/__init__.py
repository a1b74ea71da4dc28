"""slowfast_vos_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for SlowFast
video object segmentation, re-designed from scratch with the capabilities of
`ChantalMP/Applying-SlowFast-networks-to-video-object-segmentation`.

Design stance (vs. the PyTorch reference):

* The reference runs a per-frame Python loop that slices a temporal window of
  backbone features, runs a SlowFast 3D-conv module per window, and even steps
  the optimizer inside ``model.forward`` (reference ``code/helpers/model.py:275-389``).
  Here everything is functional and clip-level: the frozen backbone runs once
  over the whole clip, the SlowFast module runs as ONE set of valid temporal
  convolutions over the padded clip (mathematically identical to the per-window
  formulation by translation invariance), and gradients/optimizer live outside
  the model via ``jax.grad`` + optax.
* All shapes are static: images are padded to a fixed canvas, boxes/proposals/
  detections are padded to fixed maxima with validity masks, so the whole
  pipeline compiles under ``jax.jit`` and tiles onto the MXU.
* Parallelism is SPMD over a ``jax.sharding.Mesh`` (data-parallel over clips,
  optionally time-parallel over frames for the frozen backbone) instead of the
  reference's vendored-and-unused DDP/NCCL layer.
"""

__version__ = "0.1.0"
