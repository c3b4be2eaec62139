"""Network layer: DEQ fixed-point trajectory proposers (SURVEY.md §2.1)."""
from .deq_layer import DEQLayer, DEQLayerConfig, FFDNetwork
from .deq_layer_variants import (DEQLayerDelta, DEQLayerFeedback,
                                 DEQLayerHistory, DEQLayerHistoryState,
                                 DEQLayerHistoryStateEstPred, DEQLayerMem,
                                 DEQLayerQ)

__all__ = [
    "DEQLayer", "DEQLayerConfig", "FFDNetwork",
    "DEQLayerDelta", "DEQLayerFeedback", "DEQLayerHistory",
    "DEQLayerHistoryState", "DEQLayerHistoryStateEstPred",
    "DEQLayerMem", "DEQLayerQ",
]
