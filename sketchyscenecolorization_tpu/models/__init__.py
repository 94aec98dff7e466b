from . import deeplab, rmi
