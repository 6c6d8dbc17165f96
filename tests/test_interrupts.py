"""Unit tests for the SIGINT escalation state machine
(reference: interrupts.{h,cxx})."""

import io
import signal

import pytest

import rtl_power_fftw_tpu.interrupts as intr
from rtl_power_fftw_tpu.interrupts import (
    InterruptState, check_interrupt, raise_interrupt, set_ctrl_c_handler,
)


@pytest.fixture(autouse=True)
def _reset():
    intr.reset()
    yield
    intr.reset()
    set_ctrl_c_handler(False)


def test_neutral_state():
    err = io.StringIO()
    assert not check_interrupt(InterruptState.FinishPass, stderr=err)
    assert not check_interrupt(InterruptState.FinishNow, stderr=err)
    assert err.getvalue() == ""


def test_first_interrupt_finishes_pass():
    err = io.StringIO()
    raise_interrupt()
    assert check_interrupt(InterruptState.FinishPass, stderr=err)
    assert not check_interrupt(InterruptState.FinishNow, stderr=err)
    assert err.getvalue() == "Interrupted, will try to finish this pass.\n"


def test_second_interrupt_finishes_now():
    err = io.StringIO()
    raise_interrupt()
    raise_interrupt()
    assert check_interrupt(InterruptState.FinishNow, stderr=err)
    # Each newly observed level prints exactly once (interrupts.cxx:45-57).
    assert err.getvalue() == ("Interrupted, will try to finish this pass.\n"
                              "Interrupted, finishing now.\n")
    assert check_interrupt(InterruptState.FinishNow, stderr=err)
    assert err.getvalue().count("finishing now") == 1


def test_handler_uninstalls_at_level_two():
    """The second SIGINT restores SIG_DFL so a third one kills the process
    (interrupts.cxx:28-31)."""
    set_ctrl_c_handler(True)
    assert signal.getsignal(signal.SIGINT) is intr._handler
    raise_interrupt()
    assert signal.getsignal(signal.SIGINT) is intr._handler
    raise_interrupt()
    assert signal.getsignal(signal.SIGINT) == signal.SIG_DFL


def test_real_sigint_delivery():
    import os
    set_ctrl_c_handler(True)
    os.kill(os.getpid(), signal.SIGINT)
    err = io.StringIO()
    assert check_interrupt(InterruptState.FinishPass, stderr=err)
    assert "finish this pass" in err.getvalue()


def test_non_main_thread_uninstall_tolerated_install_raises():
    """Worker-thread escalation may UNINSTALL as a no-op (the count is
    what matters), but a worker-thread INSTALL must fail loudly —
    silently running without a handler would lose graceful Ctrl-C."""
    import threading

    results = {}

    def worker():
        try:
            set_ctrl_c_handler(False)
            results["uninstall"] = "ok"
        except Exception as e:  # pragma: no cover - failure reporting
            results["uninstall"] = e
        try:
            set_ctrl_c_handler(True)
            results["install"] = "ok"
        except ValueError:
            results["install"] = "raised"

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert results["uninstall"] == "ok"
    assert results["install"] == "raised"
