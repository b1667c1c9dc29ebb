from .dit import DiT, make_folded_apply
from .mlp import LatentDiffusionMLP, ScoreMLP
from .unet import UNet
from .vae import BetaVAE, vae_loss

__all__ = ["DiT", "make_folded_apply", "UNet", "ScoreMLP",
           "LatentDiffusionMLP", "BetaVAE", "vae_loss"]
