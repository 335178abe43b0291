from . import vil_blocks  # noqa: F401  (registers ViL YAML blocks)
from .graph import REGISTRY, GraphModel, parse_model  # noqa: F401
from .tasks import DetectionModel, TaskModel  # noqa: F401
