"""Secrets Manager (reference: awswrangler/secretsmanager.py:17
``get_secret``, :45 ``get_secret_json``).

The reference fetches from AWS Secrets Manager; locally secrets resolve
through a deterministic chain — (1) the in-process store seeded with
``put_secret`` (the local-account extension), (2) the environment
variable ``ASPS_SECRET_<NAME>`` (non-alphanumerics -> ``_``, upper),
(3) a JSON file of ``{name: secret}`` at ``$ASPS_SECRETS_FILE``.  This
is not a veneer for its own sake: ``databases.core.connect`` accepts
``secret_id=`` and builds the JDBC URL from the standard RDS/Redshift
secret shape (engine/host/port/dbname/username/password), exactly the
reference's connect-from-secret flow (redshift/_connect.py:32).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from aws_sdk_pandas_spark.exceptions import InvalidArgument

_STORE: dict[str, str | bytes] = {}


def put_secret(name: str, value: str | bytes | dict[str, Any]) -> None:
    """Local-account extension: seed a secret (dicts stored as JSON)."""
    _STORE[name] = json.dumps(value) if isinstance(value, dict) else value


def delete_secret(name: str) -> None:
    _STORE.pop(name, None)


def get_secret(name: str, boto3_session: Any = None) -> str | bytes:
    """reference: secretsmanager.py:17."""
    if name in _STORE:
        return _STORE[name]
    env_key = "ASPS_SECRET_" + re.sub(r"\W", "_", name).upper()
    if env_key in os.environ:
        return os.environ[env_key]
    path = os.environ.get("ASPS_SECRETS_FILE")
    if path and os.path.exists(path):
        with open(path) as fh:
            data = json.load(fh)
        if name in data:
            v = data[name]
            return json.dumps(v) if isinstance(v, dict) else v
    raise InvalidArgument(
        f"secret {name!r} not found (checked put_secret store, ${env_key}, "
        "$ASPS_SECRETS_FILE)"
    )


def get_secret_json(name: str, boto3_session: Any = None) -> dict[str, Any]:
    """reference: secretsmanager.py:45."""
    raw = get_secret(name)
    if isinstance(raw, bytes):
        raw = raw.decode()
    return json.loads(raw)
