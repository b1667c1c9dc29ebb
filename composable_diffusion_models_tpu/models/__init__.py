from .dit import DiT
from .mlp import LatentDiffusionMLP, ScoreMLP
from .unet import UNet
from .vae import BetaVAE, vae_loss

__all__ = ["DiT", "UNet", "ScoreMLP", "LatentDiffusionMLP", "BetaVAE",
           "vae_loss"]
