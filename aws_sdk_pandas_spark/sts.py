"""STS identity helpers (reference: awswrangler/sts.py:14,35,56).

Locally the "account" is the engine process: identity derives from the
OS user and a stable synthetic account id, overridable via
``ASPS_ACCOUNT_ID`` / ``ASPS_IDENTITY_ARN`` for tests and pipelines
that assert on specific principals."""

from __future__ import annotations

import getpass
import os
from typing import Any


def get_account_id(boto3_session: Any = None) -> str:
    """reference: sts.py:14."""
    return os.environ.get("ASPS_ACCOUNT_ID", "000000000000")


def get_current_identity_arn(boto3_session: Any = None) -> str:
    """reference: sts.py:35."""
    return os.environ.get(
        "ASPS_IDENTITY_ARN",
        f"arn:aws:iam::{get_account_id()}:user/{get_current_identity_name()}",
    )


def get_current_identity_name(boto3_session: Any = None) -> str:
    """reference: sts.py:56."""
    arn = os.environ.get("ASPS_IDENTITY_ARN")
    if arn:
        return arn.rsplit("/", 1)[-1]
    return getpass.getuser()
