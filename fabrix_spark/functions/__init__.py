from .fns import FUNCTIONS, apply_fn, fn

__all__ = ["FUNCTIONS", "apply_fn", "fn"]
