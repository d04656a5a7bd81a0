"""Semantic scoring heads: Poly and SemanticMix.

Parity: reference model/predictors/poly_predictor.py:9-63 (wraps a base
predictor across semantic layers of the user stack, mean-pools the scores)
and semantic_mix_predictor.py:34-89 (cumulative user/item semantic
embeddings, all-pairs base-predictor scores (B, Si·Su) -> linear).
"""
import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.predictors.base import BasePredictor
from legommenders_tpu.utils.registry import PREDICTORS


def _make_base(name: str, cfg: dict, hidden_size: int, dtype):
    cls = PREDICTORS[name]
    cfg = {k: v for k, v in (cfg or {}).items()
           if k in cls.__dataclass_fields__}
    cfg.setdefault("hidden_size", hidden_size)
    return cls(dtype=dtype, name="base", **cfg)


@PREDICTORS.register
class PolyPredictor(BasePredictor):
    keep_input_dim: bool = True
    base_predictor: str = "Dot"
    base_predictor_config: dict = None
    num_layers: int = 4

    def setup(self):
        self.base = _make_base(self.base_predictor,
                               self.base_predictor_config,
                               self.hidden_size, self.dtype)

    def __call__(self, user, items, training: bool = False):
        """user (B, S, D) semantic-layer stack; items (B, K, D)."""
        scores = []
        for i in range(user.shape[1]):
            scores.append(self.base(user[:, i, :], items,
                                    training=training))    # (B, K)
        return jnp.mean(jnp.stack(scores, axis=0), axis=0)


@PREDICTORS.register
class SemanticMixPredictor(BasePredictor):
    keep_input_dim: bool = True
    base_predictor: str = "Dot"
    base_predictor_config: dict = None

    def setup(self):
        self.base = _make_base(self.base_predictor,
                               self.base_predictor_config,
                               self.hidden_size, self.dtype)
        self.linear = nn.Dense(1, dtype=self.dtype, name="mix_linear")

    def __call__(self, user, items, training: bool = False):
        """user (B, Su, D) semantic codes; items (B, K, Si, D)."""
        if items.ndim == 3:
            items = items[:, :, None, :]
        B, K, Si, D = items.shape
        Su = user.shape[1]
        u = jnp.cumsum(user, axis=1)                      # (B, Su, D)
        it = jnp.cumsum(items, axis=2)                    # (B, K, Si, D)
        pair_u = jnp.broadcast_to(u[:, None, None, :, :], (B, K, Si, Su, D))
        pair_i = jnp.broadcast_to(it[:, :, :, None, :], (B, K, Si, Su, D))
        scores = self.base.score_pair(pair_u, pair_i, training=training)
        scores = scores.reshape(B, K, Si * Su)
        return self.linear(scores).squeeze(-1)            # (B, K)
