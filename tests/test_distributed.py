"""Distributed init helper: single-process no-op path + info shape."""

import os

from anime_illust_image_searcher_tpu.parallel import distributed


def test_single_process_is_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert distributed.initialize() is False


def test_process_info_keys():
    info = distributed.process_info()
    assert set(info) == {
        "process_index", "process_count", "local_devices", "global_devices"
    }
    assert info["process_count"] >= 1
