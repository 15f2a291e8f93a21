"""Regex pattern bank.

Python translations of the reference engine's date grammar
(/root/reference/constant.go:58-123 and the DFA specs under
/root/reference/internal/re2go/*.re). Translation rules:

- Go's ``\\d``/``\\D`` are ASCII-only → spelled ``[0-9]``/``[^0-9]`` here
  (Python's ``\\d`` is Unicode and would over-match).
- Go regexp duplicate group names across alternation branches are legal;
  Python's are not → branches get numeric suffixes (year1/year2 …) and
  ``find_named_submatch`` canonicalizes them back.
- The re2go scanners are leftmost, non-overlapping scans → emulated with
  ``finditer`` (same consume-the-delimiter behavior at match boundaries).
- ``\\pL``/``\\pM`` classes exist only in the third-party ``regex`` module,
  used just for the discard pattern.
"""

from __future__ import annotations

import re

import regex as uregex

# --- building blocks (constant.go:61-63) ---
RX_DAY = r"[0-3]?[0-9]"
RX_MONTH = r"[0-1]?[0-9]"
RX_YEAR = r"199[0-9]|20[0-3][0-9]"

# --- simple helpers (constant.go:59, 82) ---
RX_LAST_NON_DIGITS = re.compile(r"[^0-9]+$")
RX_TEXT_DATE_PATTERN = re.compile(r"[.:,_/ -]|^[0-9]+$", re.I)

# --- YYYYMMDD without separator (constant.go:65) ---
RX_YMD_NO_SEP = re.compile(r"(?:[^0-9]|^)([0-9]{8})(?:[^0-9]|$)")

# --- Y-M-D / D-M-Y (constant.go:66-71); suffixes mark the branch ---
RX_YMD = re.compile(
    r"(?:[^0-9]|^)(?:"
    rf"(?P<year1>{RX_YEAR})[\-/.](?P<month1>{RX_MONTH})[\-/.](?P<day1>{RX_DAY})"
    r"|"
    rf"(?P<day2>{RX_DAY})[\-/.](?P<month2>{RX_MONTH})[\-/.](?P<year2>[0-9]{{2,4}})"
    r")(?:[^0-9]|$)",
    re.I,
)

# --- Y-M / M-Y (constant.go:72-77) ---
RX_YM = re.compile(
    r"(?:[^0-9]|^)(?:"
    rf"(?P<year1>{RX_YEAR})[\-/.](?P<month1>{RX_MONTH})"
    r"|"
    rf"(?P<month2>{RX_MONTH})[\-/.](?P<year2>{RX_YEAR})"
    r")(?:[^0-9]|$)",
    re.I,
)

# --- URL date (constant.go:79-80) ---
RX_COMPLETE_URL = re.compile(
    rf"[^0-9]({RX_YEAR})[/_-]({RX_MONTH})[/_-]({RX_DAY})(?:[^0-9]|$)", re.I
)

# --- discard gate (constant.go:84-94); \pL\pM need the `regex` module ---
RX_DISCARD = uregex.compile(
    r"^[0-9]{2}:[0-9]{2}(?: |:|$)|"
    r"^[^0-9]*[0-9]{4}[^0-9]*$|"
    r"[$€¥Ұ£¢₽₱฿#₹]|"
    r"[A-Z]{3}[^A-Z]|"
    r"(?:^|[^0-9])(?:\+[0-9]{2}|[0-9]{3}|[0-9]{5})[^0-9]|"
    r"ftps?|https?|sftp|"
    r"\.(?:com|net|org|info|gov|edu|de|fr|io)(?:$|[^\p{L}\p{M}0-9_])|"
    r"IBAN|[A-Z]{2}[0-9]{2}|"
    r"®"
)

# --- extensive-search helper patterns (constant.go:97-106) ---
RX_YEAR_PATTERN = re.compile(rf"^[^0-9]?({RX_YEAR})")
RX_THREE_CATCH = re.compile(r"([0-9]{4})/([0-9]{2})/([0-9]{2})")
RX_THREE_LOOSE_CATCH = re.compile(r"([0-9]{4})[/.-]([0-9]{2})[/.-]([0-9]{2})")
RX_SELECT_YMD_YEAR = re.compile(rf"({RX_YEAR})[^0-9]?$")
RX_YMD_YEAR = re.compile(rf"^({RX_YEAR})")
RX_DATESTRINGS_CATCH = re.compile(rf"({RX_YEAR})([01][0-9])([0-3][0-9])")
RX_SLASHES_YEAR = re.compile(r"([0-9]{2})$")
RX_YYYYMM_CATCH = re.compile(rf"({RX_YEAR})[/.-](1[0-2]|0[1-9])")
RX_MMYYYY_YEAR = re.compile(rf"({RX_YEAR})[^0-9]?$")
RX_SIMPLE_W3_CLEANER = re.compile(rf"w3.org[^0-9]({RX_YEAR})[^0-9]")

# --- scan patterns (internal/re2go/search-pattern.re, plausible-year.re) ---
# Each is used via finditer; group 1 (when present) is the candidate text
# and match.start() anchors the raw-string slice.
RX_COPYRIGHT_SCAN = re.compile(
    rf"(?:©|&copy;|Copyright|\(c\))[^0-9]*(?:{RX_YEAR})?-?({RX_YEAR})[^0-9]"
)
RX_THREE_SCAN = re.compile(r"/([0-9]{4}/[0-9]{2}/[0-9]{2})[01/]")
RX_THREE_LOOSE_SCAN = re.compile(r"[^0-9]([0-9]{4}[/.-][0-9]{2}[/.-][0-9]{2})[^0-9]")
RX_SELECT_YMD_SCAN = re.compile(
    r"[^0-9]([0-3]?[0-9][/.-][01]?[0-9][/.-][0-9]{4})[^0-9]"
)
RX_DATESTRINGS_SCAN = re.compile(
    r"([^0-9]19[0-9]{2}[01][0-9][0-3][0-9][^0-9]|[^0-9]20[0-9]{2}[01][0-9][0-3][0-9][^0-9])"
)
RX_SLASHES_SCAN = re.compile(
    r"[^0-9]([0-3]?[0-9]/[01]?[0-9]/[0129][0-9]|[0-3][0-9]\.[01][0-9]\.[0129][0-9])[^0-9]"
)
RX_YYYYMM_SCAN = re.compile(r"[^0-9]([12][0-9]{3}[/.-](?:1[0-2]|0[1-9]))[^0-9]")
RX_MMYYYY_SCAN = re.compile(r"[^0-9]([01]?[0-9][/.-][12][0-9]{3})[^0-9]")
RX_SIMPLE_SCAN = re.compile(rf"[^0-9]({RX_YEAR})[^0-9]")

# --- serialized-HTML timestamp (internal/re2go/regex-pattern-search.re:26-40) ---
RX_TIMESTAMP = re.compile(
    rf"((?:{RX_YEAR})-(?:{RX_MONTH})-(?:{RX_DAY})).[0-9]{{2}}:[0-9]{{2}}:[0-9]{{2}}",
    re.I,
)

# --- long-text month-name date (internal/re2go/regex-parse.re:15-60) ---
# Month alternation exactly as the DFA spec (English/German/French/
# Indonesian/Turkish names and abbreviations).
_MONTHS_ALT = (
    "January?|February?|March|A[pv]ril|Ma[iy]|Jun[ei]|Jul[iy]|August|September|"
    "O[ck]tober|November|De[csz]ember|Jan|Feb|M[aä]r|Apr|Jun|Jul|Aug|Sep|O[ck]t|"
    "Nov|De[cz]|Januari|Februari|Maret|Mei|Agustus|Jänner|Feber|März|janvier|"
    "février|mars|juin|juillet|aout|septembre|octobre|novembre|décembre|Ocak|"
    "Şubat|Mart|Nisan|Mayıs|Haziran|Temmuz|Ağustos|Eylül|Ekim|Kasım|Aralık|Oca|"
    "Şub|Mar|Nis|Haz|Tem|Ağu|Eyl|Eki|Kas|Ara"
)
_WS = r"[\t\n\f\r ]"
RX_LONG_TEXT = re.compile(
    rf"(?:(?P<mdy_month>{_MONTHS_ALT}){_WS}(?P<mdy_day>{RX_DAY})(?:st|nd|rd|th)?,?{_WS}(?P<mdy_year>{RX_YEAR}))"
    r"|"
    rf"(?:(?P<dmy_day>{RX_DAY})(?:st|nd|rd|th|\.)?{_WS}(?:of{_WS})?(?P<dmy_month>{_MONTHS_ALT})[,.]?{_WS}(?P<dmy_year>{RX_YEAR}))",
    re.I,
)

# --- idiosyncratic author-date patterns (internal/re2go/idiosyncrasies-search.re:28-36,
# original Python patterns quoted there) ---
RX_IDIOSYNCRASIES = re.compile(
    r'(?:(?:date[^0-9"]{0,20}|updated|published|on)(?:[ :])*?'
    r"(?P<e1>[0-9]{1,4})[./](?P<e2>[0-9]{1,2})[./](?P<e3>[0-9]{2,4}))"
    r"|"
    r"(?:(?:Datum|Stand|Veröffentlicht am):? ?"
    r"(?P<d1>[0-9]{1,2})\.(?P<d2>[0-9]{1,2})\.(?P<d3>[0-9]{2,4}))"
    r"|"
    r"(?:(?:güncellen?me|yayı(?:m|n)lan?ma) *?(?:tarihi)? *?:? *?"
    r"(?P<t1>[0-9]{1,2})[./](?P<t2>[0-9]{1,2})[./](?P<t3>[0-9]{2,4}))"
    r"|"
    r"(?:(?P<u1>[0-9]{1,2})[./](?P<u2>[0-9]{1,2})[./](?P<u3>[0-9]{2,4})"
    r" *(?:'de|'da|'te|'ta|’de|’da|’te|’ta|tarihinde)"
    r" *(?:güncellendi|yayı[mn]landı))",
    re.I,
)

# --- time patterns (constant.go:118-120) ---
RX_COMMON_TIME = re.compile(
    r"(?:[^0-9]|^)([0-9]{1,2})(?::|\s*h\s*)([0-9]{1,2})"
    r"(?::([0-9]{1,2})(?:\.[0-9]+)?)?(?:\s*((?:a|p)\.?m\.?))?",
    re.I,
)
RX_TZ_CODE = re.compile(r"(?:[\t\n\f\r ]|^)([-+])([0-9]{2})(?::?([0-9]{2}))?", re.I)
RX_ISO_TIME = re.compile(
    r"([0-9]{2}):([0-9]{2})(?::([0-9]{2})(?:\.[0-9]+)?)?"
    r"(Z|[+-][0-9]{2}(?::?[0-9]{2})?)",
    re.I,
)

RX_LAST_JSON_BRACKET = re.compile(r"\s*\}$", re.I)

# --- month-name → number map (constant.go:126-150) ---
MONTH_NUMBER: dict[str, int] = {}
for _i, _names in enumerate(
    [
        ["jan", "januar", "jänner", "january", "januari", "janvier", "ocak", "oca"],
        ["feb", "februar", "feber", "february", "februari", "février", "şubat", "şub"],
        ["mar", "mär", "märz", "march", "maret", "mart", "mars"],
        ["apr", "april", "avril", "nisan", "nis"],
        ["may", "mai", "mei", "mayıs"],
        ["jun", "juni", "june", "juin", "haziran", "haz"],
        ["jul", "juli", "july", "juillet", "temmuz", "tem"],
        ["aug", "august", "agustus", "ağustos", "ağu", "aout"],
        ["sep", "september", "septembre", "eylül", "eyl"],
        ["oct", "oktober", "october", "octobre", "okt", "ekim", "eki"],
        ["nov", "november", "kasım", "kas", "novembre"],
        ["dec", "dez", "dezember", "december", "desember", "décembre", "aralık", "ara"],
    ]
):
    for _n in _names:
        MONTH_NUMBER[_n] = _i + 1

# --- meta attribute name sets (constant.go:152-258) ---
DATE_ATTRIBUTES = frozenset(
    [
        "analyticsattributes.articledate", "article.created", "article_date_original",
        "article:post_date", "article.published", "article:published",
        "article:published_date", "article:published_time", "article:publicationdate",
        "bt:pubdate", "citation_date", "citation_publication_date",
        "content_create_date", "created", "cxenseparse:recs:publishtime", "date",
        "date_created", "date_published", "datecreated", "dateposted",
        "datepublished", "dc.date", "dc.created", "dc.date.created", "dc.date.issued",
        "dc.date.publication", "dcsext.articlefirstpublished", "dcterms.created",
        "dcterms.date", "dcterms.issued", "dc:created", "dc:date", "displaydate",
        "doc_date", "field-name-post-date", "gentime", "mediator_published_time",
        "meta", "og:article:published", "og:article:published_time",
        "og:datepublished", "og:pubdate", "og:publish_date", "og:published_time",
        "og:question:published_time", "og:regdate", "originalpublicationdate",
        "parsely-pub-date", "pdate", "ptime", "pubdate", "publishdate",
        "publish_date", "publish_time", "publish-date", "published-date",
        "published_date", "published_time", "publisheddate", "publication_date",
        "rbpubdate", "release_date", "rnews:datepublished", "sailthru.date",
        "shareaholic:article_published_time", "timestamp", "twt-published-at",
        "video:release_date", "vr:published_time",
    ]
)

PROPERTY_MODIFIED = frozenset(
    [
        "article:modified", "article:modified_date", "article:modified_time",
        "article:post_modified", "bt:moddate", "datemodified", "dc.modified",
        "dcterms.modified", "lastmodified", "modified_time", "modificationdate",
        "og:article:modified_time", "og:modified_time", "og:updated_time",
        "release_date", "revision_date", "updated_time",
    ]
)

ATTR_MODIFIED_NAMES = frozenset(
    ["lastdate", "lastmod", "lastmodified", "last-modified", "modified", "utime"]
)
ATTR_PUBLISH_CLASSES = frozenset(["published", "date-published", "time-published"])

_ITEMPROP = ["datecreated", "datepublished", "pubyear", "datemodified", "dateupdate"]
ITEMPROP_ATTR_KEYS = frozenset(_ITEMPROP)
ITEMPROP_ORIGINAL = frozenset(_ITEMPROP[:3])
ITEMPROP_MODIFIED = frozenset(_ITEMPROP[3:])

# --- limits (constant.go:52-54) ---
MIN_SEGMENT_LEN = 6
MAX_SEGMENT_LEN = 52
MAX_POSSIBLE_CANDIDATES = 1000
