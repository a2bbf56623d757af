"""picad_tpu — TPU-native semi-supervised video action detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`AKASH2907/pi-consistency-activity-detection` (CVPR 2022, "End-to-End
Semi-Supervised Learning for Video Action Detection"):

- I3D RGB encoder truncated at Mixed_4f with multi-scale skips
  (reference: models/pytorch_i3d.py)
- Capsule localization head with EM routing + transposed-conv decoder
  (reference: models/capsules_ucf101.py)
- Semi-supervised consistency training with temporal-variance and
  gradient-smoothness pixel-attentive masks (reference: main_ucf101.py,
  utils/helpers.py)
- UCF101-24 / JHMDB-21 data pipelines and the sliding-clip f-mAP/v-mAP
  evaluation protocol (reference: datasets/*, evaluate_*.py)

Everything is designed TPU-first: channels-last layouts, a single jitted
train step (both forwards, losses, and attentive masks on-device), bf16
matmuls with f32 accumulation, and data parallelism over a
`jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the CapsNet train step is a large
# program (~minutes to compile cold); caching makes reruns start in
# seconds.  Opt out with PICAD_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("PICAD_TPU_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "picad_tpu_xla"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

