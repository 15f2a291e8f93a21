"""Time + timezone extraction kernels.

Pins /root/reference/core.go:273-350 (findTime) and
/root/reference/timezone.go:10-43 (tz-code parse, named-tz scan).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

from . import patterns as P
from .textkit import atoi, normalize_spaces
from .tzdata import TZ_OFFSET_SECONDS


class FoundTime(NamedTuple):
    hour: int
    minute: int
    second: int
    tz_offset: Optional[int]  # seconds east of UTC; None = no tz found
    found: bool


def parse_timezone_code(tz_code: str) -> Optional[int]:
    """'Z' → UTC(0); ±HH(:MM) → fixed offset seconds (timezone.go:10-33)."""
    tz_code = tz_code.upper()
    if tz_code == "Z":
        return 0
    m = P.RX_TZ_CODE.search(tz_code)
    if m is None:
        return None
    offset = atoi(m.group(2)) * 3600 + atoi(m.group(3) or "") * 60
    if m.group(1) == "-":
        offset = -offset
    return offset


def find_named_timezone(s: str) -> Optional[int]:
    """Whitespace-split token lookup in the 776-name table
    (timezone.go:36-43)."""
    for tok in s.split():
        if tok in TZ_OFFSET_SECONDS:
            return TZ_OFFSET_SECONDS[tok]
    return None


def find_time(raw_string: str) -> FoundTime:
    """ISO time → tz code → named tz → common time, consuming matches in
    order exactly like the reference (core.go:273-350)."""
    hour = minute = second = 0
    tz: Optional[int] = None
    time_found = False

    raw_string = normalize_spaces(raw_string)
    if not raw_string:
        return FoundTime(0, 0, 0, None, False)

    # ISO-8601: capture the first, blank out every match
    def _iso_sub(m) -> str:
        nonlocal hour, minute, second, tz, time_found
        if not time_found:
            hour = atoi(m.group(1))
            minute = atoi(m.group(2))
            second = atoi(m.group(3) or "")
            tz = parse_timezone_code(m.group(4))
            time_found = True
        return " "

    raw_string = P.RX_ISO_TIME.sub(_iso_sub, raw_string)
    if time_found and tz is not None:
        return FoundTime(hour, minute, second, tz, True)

    # Common tz code (e.g. "UTC +07:00"), same consume-as-you-scan
    if tz is None:
        def _tz_sub(m) -> str:
            nonlocal tz
            if tz is None:
                tz = parse_timezone_code(m.group(0))
            return " "

        raw_string = P.RX_TZ_CODE.sub(_tz_sub, raw_string)

    if time_found and tz is not None:
        return FoundTime(hour, minute, second, tz, True)

    if tz is None:
        tz = find_named_timezone(raw_string)

    if time_found:
        return FoundTime(hour, minute, second, tz, True)

    # Common time (H:MM(:SS) am/pm, French 7h08)
    m = P.RX_COMMON_TIME.search(raw_string)
    if m is not None:
        hour = atoi(m.group(1))
        minute = atoi(m.group(2))
        second = atoi(m.group(3) or "")
        h12 = (m.group(4) or "").lower().replace(".", "")
        if h12 == "pm":
            hour += 12
        time_found = True

    return FoundTime(hour, minute, second, tz, time_found)
