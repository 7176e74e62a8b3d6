from .features import AudioFeatureExtractor  # noqa: F401
from .image import ImageFeatureExtractor  # noqa: F401
