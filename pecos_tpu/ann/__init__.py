"""Approximate nearest neighbor search: HNSW + PairwiseANN, TPU-batched."""

from .hnsw.model import HNSW  # noqa: F401
