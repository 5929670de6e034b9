"""Wildcard patterns: ``*`` matches anything, including newlines.

Contract (reference: interpolation_engine.py:553-567): a pattern is the
literal string with each ``*`` becoming a capturing ``(.*)`` regex group,
anchored at both ends, DOTALL. Matching goes through Python ``re``, so the
reference's end-anchor quirk (``$`` also matching just before a trailing
newline) is preserved bit-for-bit.
"""

from __future__ import annotations

import re

_PLACEHOLDER = "〠"


def _compile(wildcard_s: str) -> str:
    return "^" + re.escape(wildcard_s.replace("*", _PLACEHOLDER)).replace(
        _PLACEHOLDER, "(.*)") + "$"


def is_wildcard_match(wildcard_s: str, s: str) -> bool:
    return bool(re.match(_compile(wildcard_s), s, re.DOTALL))


def get_wildcard_matches(wildcard_s: str, s: str) -> list:
    """Capture groups for each ``*`` (flattened, findall-style)."""
    found = re.findall(_compile(wildcard_s), s, re.DOTALL)
    result = []
    for item in found:
        if isinstance(item, tuple):
            result.extend(item)
        else:
            result.append(item)
    return result
