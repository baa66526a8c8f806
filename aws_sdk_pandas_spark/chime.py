"""Chime webhook notifications (reference: awswrangler/chime.py:14
``post_message`` — an HTTP POST of ``{"Content": message}``).

No outbound network in this environment: messages land in a local
outbox (newest last) that tests and pipeline code can assert on; the
return value mirrors the reference's parsed-response contract."""

from __future__ import annotations

from typing import Any

_OUTBOX: list[dict[str, Any]] = []


def post_message(webhook: str, message: str) -> dict[str, Any] | None:
    """reference: chime.py:14."""
    record = {"webhook": webhook, "Content": f"Message: {message}"}
    _OUTBOX.append(record)
    return record


def outbox() -> list[dict[str, Any]]:
    """Local extension: the delivered-message log."""
    return list(_OUTBOX)
