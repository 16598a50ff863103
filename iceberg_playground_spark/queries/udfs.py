"""Layer B — UDF/UDAF/UDTF surface (SURVEY.md §2, B55-B59).

Populated incrementally.
"""

from __future__ import annotations
