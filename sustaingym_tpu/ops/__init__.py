from . import qp

__all__ = ["qp"]
