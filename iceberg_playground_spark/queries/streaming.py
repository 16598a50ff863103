"""Layer B — streaming operator surface (SURVEY.md §2, B47-B54).

Populated incrementally; see tests/test_streaming.py for the harness.
"""

from __future__ import annotations
