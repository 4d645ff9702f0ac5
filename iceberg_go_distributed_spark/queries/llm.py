"""LLM training-data pipeline queries (dedup, similarity, text analysis).

Populated by the operators package; placeholders filled in as each
operator lands.
"""

from __future__ import annotations
