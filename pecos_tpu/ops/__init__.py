"""Hand-written TPU (Pallas/Mosaic) kernels for pecos_tpu hot paths."""

from . import intersect  # noqa: F401
