"""Network zoo for the sys-ID subsystem (flax re-designs of reference
legged_gym/models/*, SURVEY.md §2.2)."""

from pointfoot_tpu.models.nets import (
    AttentionModel, LSTMIdentifier, MLPCritic, MLPDiscriminator, MLPGenerator,
    TransformerDiscriminator, TransformerGenerator,
)

__all__ = ["MLPGenerator", "MLPDiscriminator", "MLPCritic", "LSTMIdentifier",
           "AttentionModel", "TransformerGenerator", "TransformerDiscriminator"]
