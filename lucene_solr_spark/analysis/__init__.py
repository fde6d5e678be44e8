from .porter import porter_stem
from .analyzer import (
    ENGLISH_STOP_WORDS,
    SYNONYMS,
    ASCIIFoldingAnalyzer,
    EdgeNGramAnalyzer,
    EnglishPossessiveAnalyzer,
    KeywordAnalyzer,
    LuceneChainAnalyzer,
    ShingleAnalyzer,
    SimpleAnalyzer,
    StopChainAnalyzer,
    SynonymAnalyzer,
    WhitespaceAnalyzer,
    analyze_frame,
)

__all__ = [
    "porter_stem",
    "ENGLISH_STOP_WORDS",
    "SYNONYMS",
    "ASCIIFoldingAnalyzer",
    "EdgeNGramAnalyzer",
    "EnglishPossessiveAnalyzer",
    "KeywordAnalyzer",
    "LuceneChainAnalyzer",
    "ShingleAnalyzer",
    "SimpleAnalyzer",
    "StopChainAnalyzer",
    "SynonymAnalyzer",
    "WhitespaceAnalyzer",
    "analyze_frame",
]
