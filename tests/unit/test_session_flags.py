"""DDW_ADVERSARIAL parsing law: explicit affirmatives enable, explicit
negatives (and unset) disable, and anything else raises — a typo'd
"on"/"y" must never silently record a tuned session as adversarial
evidence, nor an adversarial session as a tuned bench."""

from __future__ import annotations

import pytest

from demo_data_warehouse_spark.session import adversarial_enabled


def test_affirmatives_enable(monkeypatch):
    for v in ("1", "true", "yes", "TRUE", " Yes "):
        monkeypatch.setenv("DDW_ADVERSARIAL", v)
        assert adversarial_enabled() is True, v


def test_negatives_and_unset_disable(monkeypatch):
    for v in ("0", "false", "no", "", "  "):
        monkeypatch.setenv("DDW_ADVERSARIAL", v)
        assert adversarial_enabled() is False, v
    monkeypatch.delenv("DDW_ADVERSARIAL", raising=False)
    assert adversarial_enabled() is False


def test_unrecognized_values_raise(monkeypatch):
    for v in ("on", "y", "enable", "2", "adversarial"):
        monkeypatch.setenv("DDW_ADVERSARIAL", v)
        with pytest.raises(ValueError, match="DDW_ADVERSARIAL"):
            adversarial_enabled()
