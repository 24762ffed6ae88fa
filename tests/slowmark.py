"""Shared marker for long-running golden/parity cases.

These run in the DEFAULT suite (so ultra-sensitive/CBS/blocked parity
cannot rot silently); set SKIP_EXTENDED_GOLDENS=1 or `-m "not slow"` to
opt out on very slow windows of this time-shared host.
"""
import os

import pytest


def slow_extended(fn):
    fn = pytest.mark.slow(fn)
    return pytest.mark.skipif(
        bool(os.environ.get("SKIP_EXTENDED_GOLDENS")),
        reason="SKIP_EXTENDED_GOLDENS=1")(fn)
