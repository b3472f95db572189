"""Adaptive preprocessing: route queries by analyzed intent.

Composes the :mod:`trueno_rag_tpu.preprocess` pieces the way the
reference's docs imagine but never wire up: the
:class:`~trueno_rag_tpu.preprocess.QueryAnalyzer` picks an expansion
strategy per query — troubleshooting queries get synonym expansion
(error/fix/crash vocabularies vary wildly), definition/informational
queries get HyDE (a hypothetical answer retrieves better than a
question), how-to queries get keyword variants, everything else passes
through.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from trueno_rag_tpu.preprocess import (
    HydePreprocessor,
    KeywordExpander,
    MultiQueryPreprocessor,
    PassthroughPreprocessor,
    QueryAnalyzer,
    QueryIntent,
    QueryPreprocessor,
    SynonymExpander,
)


class AdaptivePreprocessor:
    """Intent-routed preprocessing (QueryPreprocessor protocol)."""

    name = "adaptive"

    def __init__(self, routes: Optional[Dict[QueryIntent, QueryPreprocessor]] = None) -> None:
        self.analyzer = QueryAnalyzer()
        self.routes: Dict[QueryIntent, QueryPreprocessor] = routes or {
            QueryIntent.TROUBLESHOOTING: MultiQueryPreprocessor(SynonymExpander()),
            QueryIntent.DEFINITION: HydePreprocessor(augment=True),
            QueryIntent.INFORMATIONAL: HydePreprocessor(augment=True),
            QueryIntent.HOW_TO: MultiQueryPreprocessor(KeywordExpander()),
        }
        self._fallback = PassthroughPreprocessor()

    def preprocess(self, query: str) -> List[str]:
        intent = self.analyzer.analyze(query).intent
        return self.routes.get(intent, self._fallback).preprocess(query)
