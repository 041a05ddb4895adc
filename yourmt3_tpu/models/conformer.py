"""Conformer encoder — placeholder, implemented in M3 (SURVEY.md C23)."""
from flax import linen as nn
from ..config.model import ModelConfig


class ConformerEncoder(nn.Module):
    cfg: ModelConfig

    def __call__(self, feats, deterministic=True):
        raise NotImplementedError("Conformer encoder lands in M3")
