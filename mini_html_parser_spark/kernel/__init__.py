from .config import (
    ExtractionConfig,
    NAMED_CONFIGS,
    TagToRemove,
    TagToRemoveWithContent,
    boilerplate_strip_br_config,
    boilerplate_strip_config,
    keep_everything_config,
)
from .extract import ExtractResult, Span, extract

__all__ = [
    "ExtractionConfig", "NAMED_CONFIGS", "TagToRemove",
    "TagToRemoveWithContent", "boilerplate_strip_br_config",
    "boilerplate_strip_config", "keep_everything_config",
    "ExtractResult", "Span", "extract",
]
