from ov3det.utils.logger import Logger
from ov3det.utils.meters import SmoothedValue

__all__ = ["Logger", "SmoothedValue"]
