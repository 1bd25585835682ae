"""Sparse formats: pytree containers, conversions, IO, generators."""

from cask_tpu.formats.matrix import BSR, COO, CSR  # noqa: F401
from cask_tpu.formats.signature import Signature, signature  # noqa: F401
