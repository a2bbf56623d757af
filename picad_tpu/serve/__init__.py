"""Production serving: AOT export + load of the eval forward."""

from picad_tpu.serve.export import (
    export_eval_forward,
    load_artifact,
    save_artifact,
)
from picad_tpu.serve.runner import ServingModel

__all__ = [
    "ServingModel",
    "export_eval_forward",
    "load_artifact",
    "save_artifact",
]
