"""Diagnostic logging analog of the reference's EnableLog mode.

The Go reference keeps a package-level zerolog logger disabled by
default and flips it to Debug level when Options.EnableLog is set
(core.go:38-44, 97-99).  Here the same contract rides on the stdlib
`logging` module: the `go_htmldate_spark` logger stays above DEBUG
until an extraction runs with Options(enable_log=True), which lowers
it for the duration of the process (matching the reference's global
flip — it never restores the old level either, mock_test.go:93 ORs
the flags)."""

from __future__ import annotations

import logging

log = logging.getLogger("go_htmldate_spark")
log.addHandler(logging.NullHandler())


def apply_log_option(enable_log: bool) -> None:
    """core.go:97-99: EnableLog flips the package logger to debug."""
    if enable_log:
        log.setLevel(logging.DEBUG)
