from .bloom import BloomFilter  # noqa: F401
from .cuckoo import CuckooFilter  # noqa: F401
from .robots import RobotsPolicy  # noqa: F401
from .tokenbucket import TokenBucket  # noqa: F401
