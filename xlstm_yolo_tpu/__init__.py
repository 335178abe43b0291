"""xlstm_yolo_tpu — a TPU-native (JAX/XLA/Pallas) vision framework with the
capabilities of the xLSTM-YOLO reference: YOLO-family detection/segmentation/
pose/OBB/classification with Vision-LSTM (mLSTM/xLSTM) backbones, built
SPMD-first for TPU meshes.
"""

__version__ = "0.1.0"

from .engine.model import Model  # noqa: E402,F401

YOLO = Model  # API parity alias

__all__ = ["Model", "YOLO", "__version__"]
