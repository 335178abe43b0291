"""Hub client — remote experiment/model registry integration.

TPU-native re-design of the reference ``hub/`` package (reference
hub/session.py:19, hub/auth.py:11, hub/utils.py:111): a small urllib-based
client that can talk to ANY self-hosted registry endpoint (the reference is
hard-wired to one SaaS). Air-gap friendly: nothing here is imported on the
training path; sessions attach via the callback registry exactly like the
reference (hub/__init__.py -> utils/callbacks/hub.py).

No ``requests`` dependency, no telemetry (the reference's Google-Analytics
``Events`` sink is intentionally not reproduced).
"""
from .auth import Auth
from .session import HubTrainingSession, smart_request

__all__ = ("Auth", "HubTrainingSession", "smart_request", "login", "logout")


def login(api_key: str | None = None, base_url: str | None = None) -> bool:
    """Persist hub credentials into SETTINGS (reference hub/__init__.py:login)."""
    from ..utils import SETTINGS

    auth = Auth(api_key or SETTINGS.get("api_key", ""), base_url=base_url)
    if auth.api_key:
        SETTINGS.update(api_key=auth.api_key, **({"hub_url": base_url} if base_url else {}))
        return True
    return False


def logout() -> None:
    """Drop stored credentials (reference hub/__init__.py:logout)."""
    from ..utils import SETTINGS

    SETTINGS.update(api_key="")
