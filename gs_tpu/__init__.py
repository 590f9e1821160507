"""gs_tpu — TPU-native 3D Gaussian Splatting (JAX / Pallas).

Public API:

  gs_tpu.render.render, RenderOutput   one-view differentiable rendering
  GaussianParams                        the parameter pytree
  Camera, CameraBatch, make_camera
  Scene                                 dataset container + model-dir layout
  Trainer                               the training driver
  TrainState, create_from_pcd, densify_and_prune
  render_multichip                      shard_map multi-chip rendering
"""
from .core.camera import Camera, CameraBatch, make_camera, stack_cameras
from .core.gaussians import GaussianParams
from .config import (ModelConfig, OptimizationConfig, PipelineConfig,
                     RasterConfig)

__version__ = "0.1.0"
__all__ = [
    "Camera", "CameraBatch", "make_camera", "stack_cameras",
    "GaussianParams", "ModelConfig", "OptimizationConfig", "PipelineConfig",
    "RasterConfig", "Scene", "Trainer", "render_multichip",
]


def __getattr__(name):
    # heavier classes load lazily so `import gs_tpu` stays cheap. (The
    # render FUNCTION is deliberately not re-exported here: `gs_tpu.render`
    # names the submodule; use `from gs_tpu.render import render`.)
    if name == "Scene":
        from .data.scene import Scene
        return Scene
    if name == "Trainer":
        from .train.loop import Trainer
        return Trainer
    if name in ("TrainState", "create_from_pcd", "densify_and_prune",
                "init_state"):
        from .models import gaussian_model as gm
        return getattr(gm, name)
    if name == "render_multichip":
        from .parallel.render_mc import render_multichip
        return render_multichip
    raise AttributeError(f"module 'gs_tpu' has no attribute {name!r}")
