from .warp_combine import warp_combine

__all__ = ["warp_combine"]
