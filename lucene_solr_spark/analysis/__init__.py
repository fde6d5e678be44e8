from .porter import porter_stem
from .analyzer import (
    ENGLISH_STOP_WORDS,
    SYNONYMS,
    ASCIIFoldingAnalyzer,
    EdgeNGramAnalyzer,
    EnglishPossessiveAnalyzer,
    LuceneChainAnalyzer,
    ShingleAnalyzer,
    SimpleAnalyzer,
    StopChainAnalyzer,
    SynonymAnalyzer,
    analyze_frame,
)

__all__ = [
    "porter_stem",
    "ENGLISH_STOP_WORDS",
    "SYNONYMS",
    "ASCIIFoldingAnalyzer",
    "EdgeNGramAnalyzer",
    "EnglishPossessiveAnalyzer",
    "LuceneChainAnalyzer",
    "ShingleAnalyzer",
    "SimpleAnalyzer",
    "StopChainAnalyzer",
    "SynonymAnalyzer",
    "analyze_frame",
]
