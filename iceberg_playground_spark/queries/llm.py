"""Layer C — LLM-data-pipeline operators (SURVEY.md §2, C1-C7).

Populated incrementally.
"""

from __future__ import annotations
