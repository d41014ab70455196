from .generator import Generator
from .discriminator import Discriminator
from .fnet import FNet
from .vgg import VGG19, vgg19_features, VGG_MEAN

__all__ = ["Generator", "Discriminator", "FNet", "VGG19", "vgg19_features", "VGG_MEAN"]
