"""Identifier-naming helpers (reference F4/F5: ``parse_camelcase`` and
``normalize_string``, /root/reference/parser/functions.py:28-69 — defined
there but uncalled, quirk Q2; implemented here because they complete the
declared function surface).

These are metadata operations on COLUMN/TABLE NAMES, so they run
driver-side in plain Python — renaming a DataFrame's columns is a plan
transformation, not a data job.
"""

from __future__ import annotations

import re

_ACRONYM_RE = re.compile(r"([A-Z]+)([A-Z][a-z])")
_CAMEL_RE = re.compile(r"([a-z\d])([A-Z])")


def parse_camelcase(name: str) -> str:
    """CamelCase -> snake_case with acronym handling (``ABCWord`` ->
    ``abc_word``, ``myXMLFile`` -> ``my_xml_file``)."""
    s = _ACRONYM_RE.sub(r"\1_\2", name)
    s = _CAMEL_RE.sub(r"\1_\2", s)
    return s.lower()


def normalize_string(name: str) -> str:
    """Postgres-style identifier normalization: drop ``(...)`` groups,
    strip spaces/dots/hyphens, then snake_case."""
    s = re.sub(r"\([^)]*\)", "", name)
    s = s.replace(" ", "").replace(".", "").replace("-", "")
    return parse_camelcase(s)


def normalize_columns(columns: list[str]) -> dict[str, str]:
    """old -> normalized column-name map for a whole table."""
    return {c: normalize_string(c) for c in columns}
