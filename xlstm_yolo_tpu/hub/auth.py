"""API-key auth for the hub client (reference hub/auth.py:11-141).

The reference supports api-key, id_token-cookie and interactive prompt
flows; headless TPU pods only ever use the api-key path, so that is the one
implemented — key from argument, ``$HUB_API_KEY``, or SETTINGS.
"""
from __future__ import annotations

import os

from ..utils import LOGGER, SETTINGS


class Auth:
    def __init__(self, api_key: str = "", base_url: str | None = None, verbose: bool = False):
        api_key = api_key.split("_")[0] if api_key else ""  # strip model-id suffix like the reference
        self.api_key = api_key or os.environ.get("HUB_API_KEY", "") or SETTINGS.get("api_key", "")
        self.base_url = base_url or SETTINGS.get("hub_url", "")
        if verbose and self.api_key:
            LOGGER.info("hub: authenticated via API key")

    def authenticate(self) -> bool:
        """Probe ``<base>/auth`` with the key; True on HTTP 200 (reference
        hub/auth.py:89). Returns False (never raises) when offline."""
        if not (self.api_key and self.base_url):
            return False
        from .session import smart_request

        try:
            r = smart_request("GET", f"{self.base_url}/v1/auth", headers=self.get_auth_header(),
                              retry=0, thread=False, verbose=False)
            return r is not None and r.get("_status", 0) == 200
        except Exception:
            return False

    def get_auth_header(self) -> dict:
        """Authorization header dict (reference hub/auth.py:129)."""
        return {"x-api-key": self.api_key} if self.api_key else {}
