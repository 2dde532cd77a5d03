"""Production serving for trained models (beyond the reference, which has
no deployment path — SURVEY §2 lists none): static-shape bucketed batch
inference with on-device preprocessing, plus a latency-bounded request
aggregator for online serving."""
from .engine import BatchAggregator, InferenceEngine
from .export import ExportedEngine, export_engine, load_exported
from .quantize import QuantConfig, int8_serving, quantized_apply

__all__ = ["BatchAggregator", "InferenceEngine", "QuantConfig",
           "ExportedEngine", "export_engine", "load_exported",
           "int8_serving", "quantized_apply"]
