from dibs_tpu.native import graph

__all__ = ["graph"]
