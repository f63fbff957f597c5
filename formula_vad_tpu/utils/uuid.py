"""UUID v4 generation/parsing — parity stub for the reference's vendored
``src/uuid.zig`` (which is dead code there: imported only by a test block,
SURVEY.md §2.1). Python's stdlib provides the real implementation; this
module pins the same API surface (``new_v4``, ``parse``, ``format``)."""

from __future__ import annotations

import uuid as _uuid


def new_v4() -> str:
    return str(_uuid.uuid4())


def parse(text: str) -> _uuid.UUID:
    u = _uuid.UUID(text)
    return u


def format(u: _uuid.UUID) -> str:  # noqa: A001 — mirrors the reference name
    return str(u)
