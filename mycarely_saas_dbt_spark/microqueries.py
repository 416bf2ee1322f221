"""Operator-level micro-queries: one registered (query, oracle) pair per
inventory row of SURVEY.md §2 that isn't already covered end-to-end by the
three model pipelines. Extended LLM-pipeline operators register here too.
"""

from __future__ import annotations


def register_all(register) -> None:
    # populated as operators land (P/J/A/W/U/F series + extensions)
    pass
