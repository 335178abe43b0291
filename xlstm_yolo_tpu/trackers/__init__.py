from .byte_tracker import BYTETracker  # noqa: F401
from .bot_sort import BOTSORT  # noqa: F401
from .track import create_tracker, track_results  # noqa: F401
