"""Process-tagged structured logging.

The reference uses loguru with a per-process ``[device|worker]`` tag injected
into every record (/root/reference/src/logging_config.py:15-36). loguru is not
available here; this module provides the same surface — ``configure_logging``
and a module-level ``log`` — on top of stdlib logging, with a process tag such
as ``[TPU-0|W-0]`` or ``[MASTER]``.
"""
from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_TAG = "MASTER"

_FORMAT = "%(asctime)s.%(msecs)03d | %(levelname)-8s | [%(proc_tag)s] %(name)s - %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"


class _TagFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        record.proc_tag = _TAG
        return True


def configure_logging(level: Optional[str] = None, tag: Optional[str] = None) -> logging.Logger:
    """Configure root logging for this process.

    Args:
      level: log level name; defaults to $LOG_LEVEL or INFO.
      tag: process tag shown in every record, e.g. "TPU-0|W-0".
    """
    global _TAG
    if tag:
        _TAG = tag
    if level is None:
        level = os.environ.get("LOG_LEVEL", "INFO")

    root = logging.getLogger()
    root.setLevel(level.upper())
    # Replace existing stream handlers so repeated calls are idempotent.
    for h in list(root.handlers):
        root.removeHandler(h)
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATEFMT))
    handler.addFilter(_TagFilter())
    root.addHandler(handler)
    return log


log = logging.getLogger("chatterbox_tpu")
if not logging.getLogger().handlers:  # sensible default when embedded
    logging.basicConfig(level=os.environ.get("LOG_LEVEL", "INFO"))
