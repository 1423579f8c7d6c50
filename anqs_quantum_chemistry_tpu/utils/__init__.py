from .config import Config, Schedule, flatten_dict, schedule_lookup
from .timing import timed, Timer
