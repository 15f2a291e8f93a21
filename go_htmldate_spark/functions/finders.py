"""Scan-pattern finders over serialized HTML.

Each finder emulates one re2go DFA scanner from
/root/reference/internal/re2go/{search-pattern,plausible-year}.re:
leftmost, non-overlapping matches, yielding (candidate_text,
whole_match_start) pairs. ``re.finditer`` has the same
consume-the-delimiter boundary behavior as the generated scanners.
"""

from __future__ import annotations

from . import patterns as P


def _mk_finder(rx):
    def finder(s: str) -> list[tuple[str, int]]:
        out = []
        for m in rx.finditer(s):
            out.append((m.group(1) if m.lastindex else m.group(0), m.start()))
        return out

    return finder


copyright_finder = _mk_finder(P.RX_COPYRIGHT_SCAN)          # search-pattern.re:22-38
three_finder = _mk_finder(P.RX_THREE_SCAN)                  # search-pattern.re:59-80
three_loose_finder = _mk_finder(P.RX_THREE_LOOSE_SCAN)      # search-pattern.re:83-106
select_ymd_finder = _mk_finder(P.RX_SELECT_YMD_SCAN)        # plausible-year.re:21-34
date_strings_finder = _mk_finder(P.RX_DATESTRINGS_SCAN)     # search-pattern.re:127-140
slashes_finder = _mk_finder(P.RX_SLASHES_SCAN)              # plausible-year.re:55-68
yyyy_mm_finder = _mk_finder(P.RX_YYYYMM_SCAN)               # search-pattern.re:161-174
mm_yyyy_finder = _mk_finder(P.RX_MMYYYY_SCAN)               # plausible-year.re:89-102
simple_finder = _mk_finder(P.RX_SIMPLE_SCAN)                # search-pattern.re:196-210


def timestamp_first_match(s: str):
    """First `(Y-M-D).HH:MM:SS` match → (groups list, start) or None
    (regex-pattern-search.re:26-40)."""
    m = P.RX_TIMESTAMP.search(s)
    if m is None:
        return None
    return [m.group(0), *m.groups()], m.start()


def idiosyncrasies_first_match(s: str):
    """First idiosyncratic author-date match across the EN/DE/TR1/TR2
    alternation → ([whole, g1, g2, g3], start) or None
    (idiosyncrasies-search.re:28-36)."""
    m = P.RX_IDIOSYNCRASIES.search(s)
    if m is None:
        return None
    groups = [g for g in m.groups() if g is not None]
    return [m.group(0), *groups[:3]], m.start()
