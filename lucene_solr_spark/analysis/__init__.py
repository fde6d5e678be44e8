from .porter import porter_stem
from .analyzer import (
    ENGLISH_STOP_WORDS,
    LuceneChainAnalyzer,
    SimpleAnalyzer,
    StopChainAnalyzer,
    analyze_frame,
)

__all__ = [
    "porter_stem",
    "ENGLISH_STOP_WORDS",
    "LuceneChainAnalyzer",
    "SimpleAnalyzer",
    "StopChainAnalyzer",
    "analyze_frame",
]
