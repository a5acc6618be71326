"""Log level plumbing.

API parity with the reference's c10-log-level passthrough
(reference: nvdiffrast/torch/ops.py:18-41). We map the same integer
convention (0=Info, 1=Warning, 2=Error, 3=Fatal; default 1) onto
Python's logging module for the ``nvdiffrast_tpu`` logger.
"""

import logging

_LOGGER = logging.getLogger("nvdiffrast_tpu")

# Integer level convention of the reference <-> python logging levels.
_LEVELS = [logging.INFO, logging.WARNING, logging.ERROR, logging.CRITICAL]

_current_level = 1
_LOGGER.setLevel(_LEVELS[_current_level])


def get_log_level():
    """Get current log level.

    Returns:
      Current log level in nvdiffrast_tpu. See `set_log_level()` for possible values.
    """
    return _current_level


def set_log_level(level):
    """Set log level.

    Log levels follow the convention of the reference implementation:
      0 = Info,
      1 = Warning,
      2 = Error,
      3 = Fatal.
    The default log level is 1.

    Args:
      level: New log level as integer. Internal nvdiffrast_tpu messages of this
             severity or higher will be printed, while messages of lower
             severity will be silent.
    """
    global _current_level
    level = int(level)
    if not 0 <= level <= 3:
        raise ValueError("log level must be in [0, 3]")
    _current_level = level
    _LOGGER.setLevel(_LEVELS[level])


def logger():
    return _LOGGER
