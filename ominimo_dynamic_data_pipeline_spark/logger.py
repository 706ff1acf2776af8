"""Timestamped file + console run logger (reference parity:
``reference/src/logger.py:6-58`` — one ``pipeline_%Y%m%d_%H%M%S.log`` per
run under the output log directory, mirrored to the console).

Differences from the reference, per SURVEY.md §3: the clock is injectable
so tests can pin the artifact name, and re-initialising with a different
directory replaces the file handler instead of silently keeping the old
one.
"""

from __future__ import annotations

import logging
from datetime import datetime
from pathlib import Path
from typing import Callable

LOGGER_NAME = "ominimo_dynamic_data_pipeline_spark"
_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"


def setup_logging(
    log_dir: str = "Data/output/logs",
    log_level: int = logging.INFO,
    clock: Callable[[], datetime] | None = None,
) -> logging.Logger:
    """Configure the run logger: a timestamped log file under ``log_dir``
    plus a console stream, both with the reference's line format.  Returns
    the configured logger; calling again with the same directory is a
    no-op, with a new directory re-points the file handler."""
    log_path = Path(log_dir)
    log_path.mkdir(parents=True, exist_ok=True)
    now = (clock or datetime.now)()
    log_file = log_path / f"pipeline_{now.strftime('%Y%m%d_%H%M%S')}.log"

    logger = logging.getLogger(LOGGER_NAME)
    logger.setLevel(log_level)

    current = [
        h
        for h in logger.handlers
        if isinstance(h, logging.FileHandler)
    ]
    if current and Path(current[0].baseFilename).parent == log_path.resolve():
        return logger
    for h in current:
        logger.removeHandler(h)
        h.close()

    formatter = logging.Formatter(_FORMAT, datefmt=_DATEFMT)
    file_handler = logging.FileHandler(log_file, encoding="utf-8")
    file_handler.setLevel(log_level)
    file_handler.setFormatter(formatter)
    logger.addHandler(file_handler)

    if not any(
        isinstance(h, logging.StreamHandler)
        and not isinstance(h, logging.FileHandler)
        for h in logger.handlers
    ):
        console = logging.StreamHandler()
        console.setLevel(log_level)
        console.setFormatter(formatter)
        logger.addHandler(console)

    logger.info("Logging initialized. Log file: %s", log_file)
    return logger


def get_logger() -> logging.Logger:
    """The run logger; sets up default logging on first use."""
    logger = logging.getLogger(LOGGER_NAME)
    if not logger.handlers:
        return setup_logging()
    return logger
