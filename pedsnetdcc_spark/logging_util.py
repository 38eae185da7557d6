"""Structured elapsed-time logging — the ``dict_logging`` analog (E6).

Every reference operation logs a dict ``{msg, elapsed, …}`` rendered as
JSON/tty/text (reference: pedsnetdcc/dict_logging.py:78-249; elapsed
seconds at dict_logging.py:30-38 ``secs_since``).  Here: a JSON log
formatter that folds ``extra`` fields into the record, plus a ``timed``
context manager operators/pipelines wrap around actions.
"""

from __future__ import annotations

import json
import logging
import time
from contextlib import contextmanager

_RESERVED = set(
    logging.LogRecord("", 0, "", 0, "", (), None).__dict__
) | {"message", "asctime"}


class JsonDictFormatter(logging.Formatter):
    """Render each record as one JSON object including extras."""

    def format(self, record: logging.LogRecord) -> str:
        out = {
            "msg": record.getMessage(),
            "level": record.levelname.lower(),
            "ts": round(record.created, 3),
        }
        for k, v in record.__dict__.items():
            if k not in _RESERVED and not k.startswith("_"):
                try:
                    json.dumps(v)
                    out[k] = v
                except TypeError:
                    out[k] = repr(v)
        return json.dumps(out)


def secs_since(start: float) -> float:
    """Elapsed seconds, 1-decimal (dict_logging.py:30-38)."""
    return round(time.time() - start, 1)


@contextmanager
def timed(logger: logging.Logger, msg: str, **fields):
    """Log ``{msg} … {msg} done {elapsed}`` around an action."""
    t0 = time.monotonic()
    logger.info(msg, extra=fields)
    try:
        yield
    finally:
        logger.info(
            f"{msg} done",
            extra={**fields, "elapsed": round(time.monotonic() - t0, 3)},
        )
