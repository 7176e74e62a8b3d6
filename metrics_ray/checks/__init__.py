from .base import BatchCheck, BatchOutcome, CheckContext  # noqa: F401
from .stateless import (  # noqa: F401
    EnumCheck,
    NonNullCheck,
    RangeCheck,
    RegexCheck,
    SchemaCheck,
)
from .sketch_checks import DistinctHLLCheck, DriftCheck, QuantileProfileCheck  # noqa: F401
from .decode import DecodeCheck  # noqa: F401
