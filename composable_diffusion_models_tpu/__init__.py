"""composable_diffusion_models_tpu — TPU-native composable diffusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
mo-rsa24/composable_diffusion_models research codebase: factored score-model
experts composed at sampling time (weighted blends, Ito-kappa equal-density
paths, SUPERDIFF OR/AND with density tracking, CFG, spatial-mask layouts) over
continuous VP-SDE and discrete DDPM schedules. See SURVEY.md for the layer map.
"""

from . import compose, data, experts, samplers, schedules, train
from .schedules import DDPMSchedule, VPSchedule

__all__ = [
    "compose", "data", "experts", "samplers", "schedules", "train",
    "DDPMSchedule", "VPSchedule",
]

__version__ = "0.1.0"
