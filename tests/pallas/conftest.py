"""Pallas kernels run in interpreter mode on CPU (SURVEY §4.2): the same
test files execute compiled on real TPU via tests_tpu/run_pallas_tpu.py."""

import pytest

import audiogan_tpu.kernels.conv as kconv
import audiogan_tpu.kernels.gru as kgru
import audiogan_tpu.kernels.ingest as kingest


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(kconv, "_INTERPRET", True)
    monkeypatch.setattr(kgru, "_INTERPRET", True)
    monkeypatch.setattr(kingest, "_INTERPRET", True)
