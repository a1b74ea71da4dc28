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

import os as _os

# Persistent XLA compilation cache: detection graphs are large and this
# environment compiles via a remote-compile tunnel, so caching compiled
# executables across processes saves minutes per run. Opt out with
# SLOWFAST_VOS_NO_COMPILE_CACHE=1.
if not _os.environ.get("SLOWFAST_VOS_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "SLOWFAST_VOS_COMPILE_CACHE", _os.path.expanduser("~/.cache/slowfast_vos_jax")
    )
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
