from .config import Config, Schedule, flatten_dict, schedule_lookup

__all__ = ["Config", "Schedule", "flatten_dict", "schedule_lookup"]
