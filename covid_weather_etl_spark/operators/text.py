"""Text-analysis operators over `documents` (LLM-pipeline extension).

Filled in after the relational spine: token counting, quality scoring,
language-ID heuristic, fingerprinting, n-gram Jaccard near-dup.
"""
