from .preparation import create_masker
from .vmc import VMC, VMCConfig
