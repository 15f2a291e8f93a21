"""Extraction options record.

Mirrors the reference engine's per-call config
(/root/reference/core-options.go:27-59) as a frozen dataclass that is
cheap to ship into Spark workers (broadcast once per executor via
closure capture of the pandas UDF).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from datetime import date


# Defaults per /root/reference/constant.go:33-34. MaxDate there is
# `now + 1 year`; we freeze it at engine-config build time so a whole
# Spark job uses one consistent bound (determinism across executors).
DEFAULT_MIN_DATE = date(1995, 1, 1)


def default_max_date(today: date | None = None) -> date:
    t = today or date.today()
    try:
        return t.replace(year=t.year + 1)
    except ValueError:  # Feb 29
        return t.replace(year=t.year + 1, day=28)


@dataclass(frozen=True)
class Options:
    extract_time: bool = False
    use_original_date: bool = False
    url: str = ""
    min_date: date = DEFAULT_MIN_DATE
    max_date: date | None = None
    skip_extensive_search: bool = False
    defer_url_extractor: bool = False
    # core-options.go:44-45: diagnostic stage logging (logutil.py)
    enable_log: bool = False

    def with_defaults(self) -> "Options":
        if self.max_date is None:
            return replace(self, max_date=default_max_date())
        return self

    def with_url(self, url: str) -> "Options":
        return replace(self, url=url)
