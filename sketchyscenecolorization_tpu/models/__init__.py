from . import deeplab, rmi, fg_gan, bg_gan, gan_layers
