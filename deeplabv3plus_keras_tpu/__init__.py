"""TPU-native (JAX/XLA/Pallas/pjit) semantic-segmentation framework with
the capabilities of tonandr/deeplabv3plus_keras.

The reference package exports the single symbol ``SemanticSegmentation``
(reference __init__.py:1); mirrored here, plus the typed Config schema.
"""

from .api import SemanticSegmentation
from .config import Config

__version__ = "0.1.0"
__all__ = ["SemanticSegmentation", "Config", "__version__"]
