"""LLM-data-pipeline extension queries (SURVEY.md §7.7).

Populated alongside the operator modules: dedup (exact / MinHash-LSH /
SimHash / n-gram Jaccard), similarity search, text analysis, multimodal
columns, event-time windows.
"""

from __future__ import annotations
