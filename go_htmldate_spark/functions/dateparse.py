"""Date-string parsing kernels.

Pins /root/reference/extractors.go:50-207 and 403-447 (fastParse /
regexParse / correctYear / trySwapValues / tryDateExpr / extractUrlDate)
plus a deterministic mini replacement for the third-party go-dateparser
library (externalDateParser, extractors.go:193-207) covering the
behaviors pinned by the reference's own fixtures
(extractors_test.go:275-303).
"""

from __future__ import annotations

import re
from datetime import date
from typing import Optional

from ..logutil import log
from ..options import Options
from . import patterns as P
from .textkit import atoi, digit_count, normalize_spaces, str_limit
from .validate import validate_date, validate_date_parts


def correct_year(year: int) -> int:  # extractors.go:429-439
    if year < 100:
        year += 1900 if year >= 90 else 2000
    return year


def try_swap_values(day: int, month: int) -> tuple[int, int]:  # extractors.go:442-447
    if month > 12 and day <= 12:
        return month, day
    return day, month


def find_named_submatch(rx, s: str) -> tuple[dict[str, str], str]:
    """Emulates the reference's named-group extraction where duplicate
    group names span alternation branches (utils.go:149-163). Our
    patterns suffix branch copies with digits; strip them back and track
    the last non-empty group (drives the D-M-Y branch detection)."""
    m = rx.search(s)
    result: dict[str, str] = {}
    last_name = ""
    if m is None:
        return result, last_name
    names = {v: k for k, v in rx.groupindex.items()}
    for i in range(1, (m.lastindex or 0) + 1):
        g = m.group(i)
        if g:
            name = names.get(i, str(i)).rstrip("0123456789")
            result[name] = g
            last_name = name
    return result, last_name


def extract_url_date(url: str, opts: Options) -> Optional[date]:
    """\\D(YYYY)[/_-](M)[/_-](D)(\\D|$) on the URL (extractors.go:50-69)."""
    m = P.RX_COMPLETE_URL.search(url)
    if m is None:
        return None
    dt = validate_date_parts(
        atoi(m.group(1)), atoi(m.group(2)), atoi(m.group(3)), opts
    )
    if dt is not None:
        log.debug("found date in url: %s", m.group(0))  # extractors.go:67
    return dt


# Every RX_LONG_TEXT branch ENDS at its year group (199x/20[0-3]x); the
# text between a branch start and the year is at most 19 chars (dmy:
# day(2) + ordinal/dot(2) + ws + "of " + month(9) + [,.] + ws). The
# lookahead enumerates ALL year starts (overlapping — "201999" holds
# valid years at 0 and 2, and a consuming finditer would skip the
# second), so every possible match lies inside some [y-60, y+10]
# window; pos/endpos windowing is exact because the pattern has no
# anchors or lookaround — any window match is a genuine full-string
# match, and the minimal window-match start is the leftmost match.
_RX_YEAR_CORE_LA = re.compile(r"(?=(?:199[0-9]|20[0-3][0-9]))")
_LT_PRE = 60
_LT_POST = 10


def _long_text_search(s: str):
    """Leftmost RX_LONG_TEXT match via year-core windows — O(n + hits)
    instead of the full month-name alternation at every position (the
    reference runs this scan as a re2go DFA, extractors.go:403-427;
    semantics reference: the direct search, differential-tested)."""
    if len(s) <= 256:
        return P.RX_LONG_TEXT.search(s)
    best = None
    for core in _RX_YEAR_CORE_LA.finditer(s):
        y = core.start()
        if best is not None and best.start() <= y - _LT_PRE:
            break  # no later window can start earlier than best
        m = P.RX_LONG_TEXT.search(s, max(0, y - _LT_PRE), y + _LT_POST)
        if m is not None and (best is None or m.start() < best.start()):
            best = m
    if best is None:
        return None
    # Re-run from the found start WITHOUT endpos so greedy expansion
    # matches the direct search exactly (the window's endpos truncation
    # could otherwise pick a shorter expansion at the same start) —
    # same re-match the idiosyncrasies fast path does.
    return P.RX_LONG_TEXT.search(s, best.start())


def regex_parse(s: str, opts: Options) -> Optional[date]:
    """Multilingual `Month D, Y` / `D Month Y` (extractors.go:403-427)."""
    year = month = day = 0
    m = _long_text_search(s)
    if m is not None:
        if m.group("mdy_month") is not None:
            str_month, str_day, str_year = (
                m.group("mdy_month"), m.group("mdy_day"), m.group("mdy_year"))
        else:
            str_month, str_day, str_year = (
                m.group("dmy_month"), m.group("dmy_day"), m.group("dmy_year"))
        mnum = P.MONTH_NUMBER.get(str_month.lower())
        if mnum is not None:
            month = mnum
            year = atoi(str_year)
            day = atoi(str_day)

    year = correct_year(year)
    day, month = try_swap_values(day, month)
    return validate_date_parts(year, month, day, opts)


def fast_parse(s: str, opts: Options) -> Optional[date]:
    """5-attempt ordered cascade (extractors.go:119-190)."""
    # 1. Bare YYYYMMDD at the head. The reference indexes *bytes*
    #    (extractors.go:122-131), so run this step on the UTF-8 encoding.
    b = s.encode("utf-8", "surrogatepass")
    if len(b) >= 8 and b[4:8].isdigit():
        dt = validate_date_parts(atoi(b[:4]), atoi(b[4:6]), atoi(b[6:8]), opts)
        if dt is not None:
            return dt

    # 2. \D(\d{8})\D anywhere
    m = P.RX_YMD_NO_SEP.search(s)
    if m is not None:
        t = m.group(1)
        dt = validate_date_parts(atoi(t[:4]), atoi(t[4:6]), atoi(t[6:8]), opts)
        if dt is not None:
            return dt

    # 3. Y-M-D / D-M-Y with year completion + day/month swap
    parts, last_name = find_named_submatch(P.RX_YMD, s)
    if parts:
        year = atoi(parts.get("year", ""))
        month = atoi(parts.get("month", ""))
        day = atoi(parts.get("day", ""))
        if last_name != "day":  # D-M-Y branch
            year = correct_year(year)
            day, month = try_swap_values(day, month)
        dt = validate_date_parts(year, month, day, opts)
        if dt is not None:
            return dt

    # 4. Y-M / M-Y → first of month
    parts, _ = find_named_submatch(P.RX_YM, s)
    if parts:
        dt = validate_date_parts(
            atoi(parts.get("year", "")), atoi(parts.get("month", "")), 1, opts
        )
        if dt is not None:
            return dt

    # 5. Long-text month-name parse
    dt = regex_parse(s, opts)
    if validate_date(dt, opts):
        return dt
    return None


# ---------------------------------------------------------------------------
# Mini external parser — deterministic stand-in for go-dateparser with
# CustomFormat+AbsoluteTime parsers, PreferredDateSource=Past,
# StrictParsing (constant.go:36-48). Covers the fixture behaviors in
# extractors_test.go:275-303; StrictParsing ⇒ a full Y/M/D is required.
# ---------------------------------------------------------------------------

_EXT_MONTHS: dict[str, int] = dict(P.MONTH_NUMBER)
for _i, _names in enumerate(
    [
        # extra locales the go-dateparser dependency accepts (es, pt, it,
        # ru incl. genitive, uk, ar, nl, pl) + extra EN/FR abbreviations
        ["janv", "ene", "enero", "janeiro", "gennaio", "gen", "январь",
         "января", "янв", "січень", "січня", "يناير", "stycznia", "styczeń", "sty"],
        ["févr", "febrero", "fevereiro", "fev", "febbraio", "февраль", "февраля",
         "фев", "лютий", "лютого", "فبراير", "lutego", "luty", "lut"],
        ["marzo", "março", "março", "marzec", "marca", "март", "марта",
         "березень", "березня", "مارس", "maart", "mrt"],
        ["abr", "abril", "aprile", "апрель", "апреля", "апр", "квітень",
         "квітня", "أبريل", "ابريل", "kwietnia", "kwiecień", "kwi"],
        ["mayo", "maio", "maggio", "mag", "май", "мая", "травень", "травня",
         "مايو", "maja"],
        ["junio", "junho", "giugno", "giu", "июнь", "июня", "июн", "червень",
         "червня", "يونيو", "czerwca", "czerwiec", "cze"],
        ["julio", "julho", "luglio", "lug", "июль", "июля", "июл", "липень",
         "липня", "يوليو", "lipca", "lipiec", "lip"],
        ["agosto", "ago", "август", "августа", "авг", "серпень", "серпня",
         "أغسطس", "اغسطس", "sierpnia", "sierpień", "sie"],
        ["sept", "septiembre", "setiembre", "setembro", "settembre", "set", "сентябрь",
         "сентября", "сен", "вересень", "вересня", "سبتمبر", "września",
         "wrzesień", "wrz"],
        ["octubre", "outubro", "out", "ottobre", "ott", "октябрь", "октября",
         "окт", "жовтень", "жовтня", "أكتوبر", "اكتوبر", "października",
         "październik", "paź"],
        ["noviembre", "novembro", "novembre", "ноябрь", "ноября", "ноя",
         "листопад", "листопада", "نوفمبر", "listopada", "lis"],
        ["dic", "diciembre", "dezembro", "dicembre", "декабрь", "декабря",
         "дек", "грудень", "грудня", "ديسمبر", "grudnia", "grudzień", "gru"],
    ]
):
    for _n in _names:
        _EXT_MONTHS.setdefault(_n, _i + 1)
_EXT_MONTHS.update({"june": 6, "july": 7, "déc": 12, "juil": 7})

# connector tokens dateparser skips inside date phrases
_EXT_CONNECTORS = frozenset(
    ["de", "del", "do", "da", "в", "г", "года", "год", "р", "року", "roku",
     "on", "at", "am", "um", "el", "le", "il", "dnia", "den"]
)

_EXT_WEEKDAYS = frozenset(
    [
        "mon", "monday", "tue", "tues", "tuesday", "wed", "wednesday", "thu",
        "thur", "thurs", "thursday", "fri", "friday", "sat", "saturday", "sun",
        "sunday", "mo", "di", "mi", "do", "fr", "sa", "so", "montag", "dienstag",
        "mittwoch", "donnerstag", "freitag", "samstag", "sonntag", "lundi",
        "mardi", "mercredi", "jeudi", "vendredi", "samedi", "dimanche",
        "pazartesi", "salı", "çarşamba", "perşembe", "cuma", "cumartesi",
        "pazar", "senin", "selasa", "rabu", "kamis", "jumat", "sabtu", "minggu",
        # es / pt / it
        "lunes", "martes", "miércoles", "miercoles", "jueves", "viernes",
        "sábado", "sabado", "domingo", "segunda", "terça", "terca", "quarta",
        "quinta", "sexta", "feira", "lunedì", "martedì", "mercoledì",
        "giovedì", "venerdì", "sabato", "domenica",
        # ru / uk
        "понедельник", "вторник", "среда", "среду", "четверг", "пятница",
        "пятницу", "суббота", "субботу", "воскресенье", "понеділок",
        "вівторок", "середа", "середу", "четвер", "п'ятниця", "субота",
        "неділя", "неділю",
        # nl / pl
        "maandag", "dinsdag", "woensdag", "donderdag", "vrijdag", "zaterdag",
        "zondag", "poniedziałek", "wtorek", "środa", "środę", "czwartek",
        "piątek", "sobota", "sobotę", "niedziela", "niedzielę",
        # ar
        "الاثنين", "الإثنين", "الثلاثاء", "الأربعاء", "الاربعاء", "الخميس",
        "الجمعة", "السبت", "الأحد", "الاحد",
    ]
)

_EXT_ORDINAL = re.compile(r"^([0-9]{1,2})(?:st|nd|rd|th)$", re.I)
_EXT_TIME_TOKEN = re.compile(
    r"^[0-9]{1,2}:[0-9]{2}(?::[0-9]{2}(?:\.[0-9]*[a-z]*)?)?$", re.I
)
_EXT_NUM = re.compile(r"^[0-9]{1,4}$")
_EXT_SPLIT = re.compile(r"[\s|,،\-/]+")

# CJK calendar-marker dates (go-dateparser parses these via its zh/ja/ko
# locales, extractors.go:193-207): 2023年3月15日 / 2023년 3월 15일.
# Strict full Y/M/D only, matching the mini-parser's completeness rule.
_EXT_CJK = re.compile(
    r"([0-9]{2,4})\s*[年년]\s*([0-9]{1,2})\s*[月월]\s*([0-9]{1,2})\s*[日일]"
)


def external_parse(s: str, opts: Options) -> Optional[date]:
    """Deterministic mini-dateparser (extractors.go:193-207 stand-in).

    Tokenize → drop weekday names and time-of-day tokens → resolve the
    remaining (number|month-name) tokens into a complete Y/M/D. Strict:
    anything leftover or incomplete ⇒ no date.

    CJK fast path first: 年月日/년월일 marker dates carry their own
    field labels, so they resolve directly (2-digit years completed
    like everywhere else)."""
    cm = _EXT_CJK.search(s)
    if cm:
        y = atoi(cm.group(1))
        if len(cm.group(1)) == 2:
            y = correct_year(y)
        dt = _mk(y, atoi(cm.group(2)), atoi(cm.group(3)))
        return dt if validate_date(dt, opts) else None
    tokens = [t for t in _EXT_SPLIT.split(s) if t]

    nums: list[str] = []
    month: int | None = None
    for tok in tokens:
        low = tok.lower().rstrip(".").lstrip("(").rstrip(")")
        if not low:
            continue
        if low in _EXT_WEEKDAYS or low in _EXT_CONNECTORS:
            continue
        if _EXT_TIME_TOKEN.match(low):
            continue
        om = _EXT_ORDINAL.match(low)
        if om:
            nums.append(om.group(1))
            continue
        if low in _EXT_MONTHS:
            if month is not None:
                return None  # two month names → ambiguous, strict mode bails
            month = _EXT_MONTHS[low]
            continue
        if _EXT_NUM.match(low):
            nums.append(low)
            continue
        return None  # unconsumable token → strict parsing fails

    dt: Optional[date] = None
    if month is not None and len(nums) == 2:
        # month name + two numbers: the 4-digit (or larger) one is the year
        a, b = nums
        if len(a) == 4 and len(b) <= 2:
            dt = _mk(atoi(a), month, atoi(b))
        elif len(b) == 4 and len(a) <= 2:
            dt = _mk(atoi(b), month, atoi(a))
        elif len(b) <= 2 and len(a) <= 2:
            # two 2-digit numbers: day then 2-digit year (dateparser "past")
            dt = _mk(correct_year(atoi(b)), month, atoi(a))
    elif month is None and len(nums) == 3:
        # pure numeric triple. go-dateparser with these settings resolves
        # YYYY-A-B as year/day/month (pinned by extractors_test.go:293:
        # "2018-04-12 17:20:03…" → 2018-12-04).
        a, b, c = nums
        if len(a) == 4:
            dt = _mk(atoi(a), atoi(c), atoi(b))
        elif len(c) == 4:
            dt = _mk(atoi(c), atoi(b), atoi(a))
    return dt if validate_date(dt, opts) else None


def _mk(year: int, month: int, day: int) -> Optional[date]:
    # external parser does NOT apply the <1582 Gregorian floor — the
    # reference pins "1 January 0002" → 0002-01-01 (extractors_test.go:289)
    if year < 1 or year > 9999 or month < 1 or month > 12 or day < 1:
        return None
    try:
        return date(year, month, day)
    except ValueError:
        return None


def try_date_expr(s: str, opts: Options) -> tuple[str, Optional[date]]:
    """Normalize → gates → fastParse → (extensive) external parse
    (extractors.go:73-114). Returns (normalized string, date|None)."""
    s = normalize_spaces(s)
    s = str_limit(s, P.MAX_SEGMENT_LEN)

    if len(s) < 6:
        return s, None

    n_digit = digit_count(s)
    if n_digit < 4 or n_digit > 18:
        return s, None

    if P.RX_DISCARD.search(s):
        return s, None

    dt = fast_parse(s, opts)
    if dt is not None:
        return s, dt

    if not opts.skip_extensive_search:
        if not P.RX_TEXT_DATE_PATTERN.search(s):
            return s, None
        dt = external_parse(s, opts)
        if dt is not None:
            return s, dt

    return s, None
