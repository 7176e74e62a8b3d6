from .features import AudioFeatureExtractor  # noqa: F401
from .image import ImageDecodeStub  # noqa: F401
