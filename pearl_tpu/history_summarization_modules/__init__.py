from pearl_tpu.history_summarization_modules.frame_ring import (
    FrameRingHistorySummarization,
    FrameRingView,
)
from pearl_tpu.history_summarization_modules.modules import (
    HistorySummarizationModule,
    IdentityHistorySummarization,
    LSTMHistorySummarization,
    StackingHistorySummarization,
    TransformerHistorySummarization,
)

__all__ = [
    "HistorySummarizationModule",
    "IdentityHistorySummarization",
    "StackingHistorySummarization",
    "LSTMHistorySummarization",
    "TransformerHistorySummarization",
    "FrameRingHistorySummarization",
    "FrameRingView",
]
