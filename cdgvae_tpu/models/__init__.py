from .vae import VAE, CDGVAE, VAEOutput  # noqa: F401
from .classifier import Discriminator, FactorClassifier, DownstreamClassifier  # noqa: F401
