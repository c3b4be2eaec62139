"""Network layer: DEQ fixed-point trajectory proposers (SURVEY.md §2.1)."""
from .deq_layer import DEQLayer, DEQLayerConfig, FFDNetwork

__all__ = ["DEQLayer", "DEQLayerConfig", "FFDNetwork"]
