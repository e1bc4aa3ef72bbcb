"""Extreme multi-label classification (XMC): XR-Linear on TPU."""

from .postprocessor import PostProcessor  # noqa: F401
from .clustering import HierarchicalKMeans, Indexer, LabelEmbeddingFactory  # noqa: F401
from .base import MLProblem, MLModel, HierarchicalMLModel  # noqa: F401
