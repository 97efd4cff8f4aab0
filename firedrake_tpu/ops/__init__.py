from .batched_inverse import batched_inv, batched_solve

__all__ = ["batched_inv", "batched_solve"]
