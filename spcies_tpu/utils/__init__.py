from spcies_tpu.utils import linalg
from spcies_tpu.utils import projections

__all__ = ["linalg", "projections"]
