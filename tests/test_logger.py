"""Logger unit tests (reference: tests/test_logger.py)."""

import logging

from ffpa_attn_tpu.logger import init_logger, reset_once_cache


def test_once_dedup(capsys):
    reset_once_cache()
    logger = init_logger("test_once")
    handler_stream = logging.StreamHandler()
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    cap = Capture()
    logging.getLogger("FFPA_TPU.test_once").addHandler(cap)
    try:
        logger.warning_once("hello %s", "x")
        logger.warning_once("hello %s", "x")
        logger.warning_once("hello %s", "y")
    finally:
        logging.getLogger("FFPA_TPU.test_once").removeHandler(cap)
    assert records.count("hello x") == 1
    assert records.count("hello y") == 1


def test_env_level(monkeypatch):
    monkeypatch.setenv("FFPA_TPU_LOGGER_LEVEL", "DEBUG")
    logger = init_logger("test_level")
    assert logger.level == logging.DEBUG
