"""I/O, logging, and timing utilities."""

from .xyz_io import read_xyz, write_xyz
from .log import get_logger, enable_verbose_logging

__all__ = ["read_xyz", "write_xyz", "get_logger", "enable_verbose_logging"]
