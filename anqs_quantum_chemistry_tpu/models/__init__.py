from .made import MadeSpec, made_init, made_apply
from .anqs import ANQS, AnqsConfig
from .bf_state import BFState
