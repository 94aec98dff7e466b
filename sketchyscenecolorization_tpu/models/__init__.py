from . import deeplab, rmi, fg_gan, bg_gan, gan_layers, backbones
from . import fg_gan_variants, inception_v4
