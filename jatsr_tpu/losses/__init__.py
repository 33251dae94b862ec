from .perceptual import (
    charbonnier_loss,
    consistency_loss,
    frequency_domain_loss,
    latent_perceptual_loss,
    multi_scale_loss,
    reconstruction_loss,
    total_training_loss,
)

__all__ = [
    "charbonnier_loss",
    "frequency_domain_loss",
    "multi_scale_loss",
    "consistency_loss",
    "latent_perceptual_loss",
    "reconstruction_loss",
    "total_training_loss",
]
