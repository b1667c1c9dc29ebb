from .mlp import LatentDiffusionMLP, ScoreMLP
from .unet import UNet
from .vae import BetaVAE, vae_loss

__all__ = ["UNet", "ScoreMLP", "LatentDiffusionMLP", "BetaVAE", "vae_loss"]
