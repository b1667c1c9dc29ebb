from .divergence import exact_div, value_and_div

__all__ = ["value_and_div", "exact_div"]
