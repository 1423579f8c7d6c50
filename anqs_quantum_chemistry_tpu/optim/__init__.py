from .sr import SRConfig, sr_transform
