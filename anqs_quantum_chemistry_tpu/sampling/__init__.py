from .sampler import (
    SamplerState,
    gumbel_top_k_sample,
    multinomial_sample,
    sample_precisely,
    SamplingConfig,
    sample,
)
