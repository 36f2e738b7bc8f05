"""TPU-native LZ-ANI: rapid all-vs-all average nucleotide identity.

A ground-up reimplementation of the capabilities of refresh-bio/LZ-ANI
(reference snapshot at /root/reference) designed for TPU hardware:
JAX/XLA/Pallas device engine for the pair-parse compute path, a native C++
host engine (CPU backend + kernel oracle), and jax.sharding mesh parallelism
for multi-chip scale-out.
"""

__version__ = "0.1.0"
VERSION_STRING = "lz-ani-tpu 0.1.0"

from .params import Params  # noqa: F401
from .matcher import Matcher  # noqa: F401
