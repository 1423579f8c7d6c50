from . import bits
from . import keys
