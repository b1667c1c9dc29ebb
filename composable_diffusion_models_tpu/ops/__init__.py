from .divergence import exact_div, value_and_div
from .pallas_kernels import short_seq_attention

__all__ = ["value_and_div", "exact_div", "short_seq_attention"]
