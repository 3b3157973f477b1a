"""Model layer: flax networks replacing the reference's TF graph builders.

Rebuild of base_network.py + each agent's network classes (SURVEY.md §2.1).
"""

from cartpoleplusplus_tpu.models.networks import (
    Actor,
    Critic,
    DiscretePolicy,
    GaussianActor,
    NAFNetwork,
    NoisyDense,
    QNetwork,
    ValueNetwork,
)
from cartpoleplusplus_tpu.models.target import hard_target_update, soft_target_update
from cartpoleplusplus_tpu.models.trunks import (
    DEFAULT_HIDDEN,
    ConvTrunk,
    MLPTrunk,
    ObsEncoder,
    flatten_obs,
    pixels_to_nhwc,
)

__all__ = [
    "Actor",
    "Critic",
    "DiscretePolicy",
    "GaussianActor",
    "NAFNetwork",
    "NoisyDense",
    "QNetwork",
    "ValueNetwork",
    "hard_target_update",
    "soft_target_update",
    "DEFAULT_HIDDEN",
    "ConvTrunk",
    "MLPTrunk",
    "ObsEncoder",
    "flatten_obs",
    "pixels_to_nhwc",
]
