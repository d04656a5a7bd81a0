"""DotPredictor — inner product (reference model/predictors/dot_predictor.py:6-10)."""
import jax.numpy as jnp

from legommenders_tpu.models.predictors.base import BasePredictor
from legommenders_tpu.utils.registry import PREDICTORS


@PREDICTORS.register
class DotPredictor(BasePredictor):

    def score_pair(self, user, item, training: bool = False):
        return jnp.sum(user * item, axis=-1)

    def __call__(self, user, items, training: bool = False):
        return jnp.einsum("...d,...kd->...k", user, items)
