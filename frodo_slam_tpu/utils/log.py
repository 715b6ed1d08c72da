"""Logging: console + optional rotating file sink.

The reference logs through loguru with a file sink at ``logs/vio.log``
(run_vio.py:272) and calls ``logger.info/warning`` across vio.py,
tracker.py:335 and odometry.py. This is the stdlib equivalent with the same
default sink location; importing modules grab a child logger via
:func:`get_logger`.
"""

from __future__ import annotations

import logging
import pathlib
from logging.handlers import RotatingFileHandler

_ROOT_NAME = "frodo_slam_tpu"
_configured = False


def get_logger(name: str = "") -> logging.Logger:
    return logging.getLogger(f"{_ROOT_NAME}.{name}" if name else _ROOT_NAME)


def configure(logfile: str | None = "logs/vio.log", level: int = logging.INFO) -> logging.Logger:
    """Attach console (+ file) handlers once (run_vio.py:271-272 contract)."""
    global _configured
    root = logging.getLogger(_ROOT_NAME)
    root.setLevel(level)
    if _configured:
        return root
    fmt = logging.Formatter("%(asctime)s | %(levelname)-7s | %(name)s - %(message)s")
    con = logging.StreamHandler()
    con.setFormatter(fmt)
    root.addHandler(con)
    if logfile:
        path = pathlib.Path(logfile)
        path.parent.mkdir(parents=True, exist_ok=True)
        fh = RotatingFileHandler(path, maxBytes=10_000_000, backupCount=2)
        fh.setFormatter(fmt)
        root.addHandler(fh)
    _configured = True
    return root
