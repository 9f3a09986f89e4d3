"""Schema inference ("guess") — the engine's schema-evolution brain.

Ports the reference's guess algorithms (driver-side, over a ≤32 KiB
sample — matching the reference's sample budget,
embulk-core/src/main/java/org/embulk/exec/GuessExecutor.java:308 and
SamplingParserPlugin.java:131-138):

- per-cell type guess + per-column merge lattice
  (embulk-ruby/lib/embulk/guess/schema_guess.rb:37-128);
- time-format guess: YMD/MDY/DMY with / - . delimiters, optional
  time+fraction+zone, RFC 2822, Apache CLF, ANSI-C asctime, and the
  "if DMY matches, MDY is likely a false match" merge rule
  (embulk-ruby/lib/embulk/guess/time_format_guess.rb:171-313,152-160,331-408);
- newline majority vote (embulk-ruby/lib/embulk/guess/newline.rb:10-25);
- charset: UTF-8 (embulk-ruby/lib/embulk/guess/charset.rb:7-13);
- compression sniffing by magic bytes (embulk-guess-gzip/-bzip2,
  reference build.gradle:20,23) and JSON-vs-CSV detection in the default
  chain order gzip→bzip2→json→csv (build.gradle:197);
- fixed-point iteration of the guess chain, ≤10 rounds
  (exec/GuessExecutor.java:142-195).

The merged type lattice also drives the lake table's type-widening schema
evolution (streaming/lake.py)."""

from __future__ import annotations

import bz2
import csv as _csv
import gzip
import io
import json
import re
from dataclasses import dataclass

#: guess-side boolean string sets (schema_guess.rb:97-110)
TRUE_STRINGS = frozenset(
    "true True TRUE yes Yes YES t T y Y on On ON".split()
)
FALSE_STRINGS = frozenset(
    "false False FALSE no No NO f F n N off Off OFF".split()
)

#: the widening lattice TYPE_COALESCE (schema_guess.rb:112-128)
_TYPE_COALESCE = {
    tuple(sorted(("long", "double"))): "double",
    tuple(sorted(("boolean", "long"))): "long",
    tuple(sorted(("timestamp", "long"))): "long",
}

#: Guava-derived double pattern, leading-zero floats rejected
#: (schema_guess.rb:65-71). re.ASCII: the reference is Java, whose \d is
#: ASCII-only — Python's default unicode \d would accept e.g. Arabic-Indic
#: digits the reference rejects (and RE2-based SQL oracles can't express).
_DOUBLE_RE = re.compile(
    r"^[+-]?(NaN|Infinity|([1-9]\d*|0)(\.\d+)([eE][+-]?\d+)?[fFdD]?)$", re.ASCII
)
_INT_RE = re.compile(r"^[+-]?\d+$", re.ASCII)


# ---------------------------------------------------------------------------
# time-format guess
# ---------------------------------------------------------------------------

_YEAR = r"[1-4][0-9]{3}"
_MONTH = r"(?:10|11|12|[0 ]?[0-9])"
_MONTH_ND = r"(?:10|11|12|0[0-9])"
_DAY = r"(?:31|30|[1-2][0-9]|[0 ]?[1-9])"
_DAY_ND = r"(?:31|30|[1-2][0-9]|0[1-9])"
_HOUR = r"(?:2[0-4]|1[0-9]|[0 ]?[0-9])"
_HOUR_ND = r"(?:2[0-4]|1[0-9]|0[0-9])"
_MINSEC = r"(?:60|[1-5][0-9]|[0 ]?[0-9])"
_MINSEC_ND = r"(?:60|[1-5][0-9]|0[0-9])"
_ZONE = r"(?P<zone_space> )?(?P<zone>Z|[+-]\d\d(?::?\d\d)?|[A-Z]{1,3})"
_FRAC = r"(?:(?P<frac_delim>[.,])(?P<frac>[0-9]{1,9}))"
_TIME = (
    rf"(?P<hour>{_HOUR})(?:(?P<time_delim>[:\-])(?P<minute>{_MINSEC})"
    rf"(?:(?P=time_delim)(?P<second>{_MINSEC}){_FRAC}?)?)?"
)
_TIME_ND = (
    rf"(?P<hour>{_HOUR_ND})(?:(?P<minute>{_MINSEC_ND})"
    rf"(?:(?P<second>{_MINSEC_ND}){_FRAC}?)?)?"
)

_DATE_PATTERNS: list[tuple[str, str]] = [
    # (order, regex) — order in {"ymd", "mdy", "dmy"}
    ("ymd", rf"(?P<year>{_YEAR})(?P<date_delim>[/\-.])(?P<month>{_MONTH})(?P=date_delim)(?P<day>{_DAY})"),
    ("ymd_nd", rf"(?P<year>{_YEAR})(?P<month>{_MONTH_ND})(?P<day>{_DAY_ND})"),
    ("mdy", rf"(?P<month>{_MONTH})(?P<date_delim>[/\-.])(?P<day>{_DAY})(?P=date_delim)(?P<year>{_YEAR})"),
    ("dmy", rf"(?P<day>{_DAY})(?P<date_delim>[/\-.])(?P<month>{_MONTH})(?P=date_delim)(?P<year>{_YEAR})"),
]

_RFC2822_RE = re.compile(
    r"^(?:(?P<weekday>Sun|Mon|Tue|Wed|Thu|Fri|Sat), )?"
    r"(?P<day>\d\d?) (?P<month>Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) (?P<year>\d{4})"
    r"(?: (?P<hour>\d\d):(?P<minute>\d\d)(?::(?P<second>\d\d))?"
    r"(?: (?P<zone>[A-Z]{1,3}|[+-]\d{4}))?)?$",
    re.ASCII,
)
_APACHE_CLF_RE = re.compile(
    r"^\d\d/(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)/\d{4}"
    r":\d\d:\d\d:\d\d [+-]\d{4}$",
    re.ASCII,
)
_ANSI_C_RE = re.compile(
    r"^(?:Sun|Mon|Tue|Wed|Thu|Fri|Sat) "
    r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) "
    r"[ \d]\d \d\d:\d\d:\d\d (?:[A-Z]{1,3} )?\d{4}$",
    re.ASCII,
)


@dataclass
class _TimeMatch:
    order: str          # ymd | ymd_nd | mdy | dmy | rfc2822 | apache | ansi_c
    date_delim: str
    dt_sep: str | None  # delimiter between date and time
    time_delim: str | None
    has_minute: bool
    has_second: bool
    frac_digits: int
    frac_delim: str | None
    zone: str | None    # None | "simple" | "extended" | "abb"
    zone_space: str

    def format(self) -> str:
        if self.order == "rfc2822":
            return "%a, %d %b %Y %H:%M:%S %z"
        if self.order == "apache":
            return "%d/%b/%Y:%H:%M:%S %z"
        if self.order == "ansi_c":
            return "%a %b %e %H:%M:%S %Y"
        d = self.date_delim
        if self.order in ("ymd", "ymd_nd"):
            fmt = f"%Y{d}%m{d}%d"
        elif self.order == "mdy":
            fmt = f"%m{d}%d{d}%Y"
        else:
            fmt = f"%d{d}%m{d}%Y"
        if self.dt_sep is not None:
            t = self.time_delim or ""
            fmt += f"{self.dt_sep}%H"
            if self.has_minute:
                fmt += f"{t}%M"
                if self.has_second:
                    fmt += f"{t}%S"
                    if self.frac_digits:
                        fmt += (self.frac_delim or ".") + (
                            "%L" if self.frac_digits <= 3 else "%N"
                        )
        if self.zone:
            fmt += self.zone_space
            fmt += "%:z" if self.zone == "extended" else "%z"
        return fmt


#: date-time separators the reference accepts (time_format_guess.rb match
#: of rest after the date part): space, T, ". ", "."; "" for nodelim forms.
_DT_SEPS = (" ", "T", r"\. ", r"\.")


def _match_one(text: str) -> _TimeMatch | None:
    text = text.strip()
    if not text:
        return None
    if _RFC2822_RE.match(text):
        return _TimeMatch("rfc2822", "", " ", ":", True, True, 0, None, "simple", " ")
    if _APACHE_CLF_RE.match(text):
        return _TimeMatch("apache", "/", ":", ":", True, True, 0, None, "simple", " ")
    if _ANSI_C_RE.match(text):
        return _TimeMatch("ansi_c", " ", " ", ":", True, True, 0, None, None, " ")
    for order, date_re in _DATE_PATTERNS:
        nodelim = order.endswith("_nd")
        time_re = _TIME_ND if nodelim else _TIME
        seps = ("",) if nodelim else _DT_SEPS
        for sep in seps:
            sep_re = f"(?P<dt_sep>{sep})" if sep else "(?P<dt_sep>)"
            pat = rf"^{date_re}(?:{sep_re}{time_re})?(?:{_ZONE})?$"
            m = re.match(pat, text, re.ASCII)
            if not m:
                continue
            gd = m.groupdict()
            zone = None
            if gd.get("zone"):
                z = gd["zone"]
                if re.fullmatch(r"[+-]\d\d:\d\d", z):
                    zone = "extended"
                elif re.fullmatch(r"[A-Z]{1,3}", z) and z != "Z":
                    zone = "abb"
                else:
                    zone = "simple"
            has_time = gd.get("hour") is not None
            if not has_time and gd.get("zone") and nodelim:
                # bare digits + alpha tail: too ambiguous
                return None
            return _TimeMatch(
                order=order,
                date_delim=gd.get("date_delim") or "",
                dt_sep=gd.get("dt_sep") if has_time else None,
                time_delim=(gd.get("time_delim") or "") if has_time else None,
                has_minute=gd.get("minute") is not None,
                has_second=gd.get("second") is not None,
                frac_digits=len(gd["frac"]) if gd.get("frac") else 0,
                frac_delim=gd.get("frac_delim"),
                zone=zone,
                zone_space=gd.get("zone_space") or "",
            )
    return None


def guess_time_format(texts) -> str | None:
    """Format string (Ruby strptime dialect, as the reference emits) that
    matches all non-empty samples, or None. Applies the reference's
    'DMY beats MDY when both match' rule (time_format_guess.rb:152-160)."""
    if isinstance(texts, str):
        texts = [texts]
    matches = [m for m in (_match_one(t) for t in texts if t and str(t).strip()) if m]
    if not matches or len(matches) != len(
        [t for t in texts if t and str(t).strip()]
    ):
        return None
    # group by (order-normalized parts, delims); MDY merges into DMY
    orders = {m.order for m in matches}
    base = matches[0]
    if "dmy" in orders and base.order == "mdy":
        base.order = "dmy"
    elif "dmy" in orders:
        base.order = "dmy" if base.order in ("mdy", "dmy") else base.order
    # widest time/frac across samples
    for m in matches[1:]:
        if m.order != base.order and {m.order, base.order} == {"mdy", "dmy"}:
            base.order = "dmy"
        elif m.order != base.order:
            return None
        base.has_minute = base.has_minute or m.has_minute
        base.has_second = base.has_second or m.has_second
        base.frac_digits = max(base.frac_digits, m.frac_digits)
        base.frac_delim = base.frac_delim or m.frac_delim
        base.zone = base.zone or m.zone
        base.zone_space = base.zone_space or m.zone_space
        if base.time_delim is None:
            base.time_delim = m.time_delim
        if base.dt_sep is None:
            base.dt_sep = m.dt_sep
    return base.format()


# ---------------------------------------------------------------------------
# type guess + lattice  (schema_guess.rb)
# ---------------------------------------------------------------------------

def guess_type(value) -> str | tuple[str, str] | None:
    """Guess one cell's Embulk type; timestamps return ('timestamp', fmt);
    empty → None (undecided)."""
    if isinstance(value, (dict, list)):
        return "json"
    s = "" if value is None else str(value)
    if s in TRUE_STRINGS or s in FALSE_STRINGS:
        return "boolean"
    fmt = guess_time_format([s]) if s.strip() else None
    if fmt:
        return ("timestamp", fmt)
    if _INT_RE.match(s):
        return "long"
    if _DOUBLE_RE.match(s):
        return "double"
    if not s:
        return None
    try:
        json.loads(s)
        return "json"
    except Exception:
        pass
    return "string"


def time_match_sql_regexes() -> list[str]:
    """RE2-safe expansion of the single-sample time-format match: a
    non-blank string s has ``guess_time_format([s]) is not None`` iff
    s.strip() full-matches ANY of these regexes. Built from the same
    pattern constants as ``_match_one`` (single source of truth); the
    backreferences RE2 lacks ((?P=date_delim)/(?P=time_delim)) are
    expanded by enumerating the delimiter, and the nodelim
    'digits + zone but no time ⇒ reject' rule (time_format_guess.rb's
    too-ambiguous case) is encoded by splitting the nodelim alternative
    into (bare date) | (date + time [+ zone]).

    Used by the DuckDB correctness oracle for guess_cell_types;
    equivalence against _match_one is pinned exhaustively in
    tests/test_guess.py."""
    zone = r"(?: ?(?:Z|[+-][0-9][0-9](?::?[0-9][0-9])?|[A-Z]{1,3}))?"
    frac = r"(?:[.,][0-9]{1,9})?"
    seps = r"(?: |T|\. |\.)"
    # specials: drop the ^...$ anchors (callers full-match) and the
    # python-only named groups
    regs = [
        re.sub(r"\(\?P<[^>]+>", "(?:", _RFC2822_RE.pattern).strip("^$"),
        _APACHE_CLF_RE.pattern.strip("^$"),
        _ANSI_C_RE.pattern.strip("^$"),
    ]
    for d in ("/", "-", "."):
        de = re.escape(d)
        dates = (
            f"{_YEAR}{de}{_MONTH}{de}{_DAY}",      # ymd
            f"{_MONTH}{de}{_DAY}{de}{_YEAR}",      # mdy
            f"{_DAY}{de}{_MONTH}{de}{_YEAR}",      # dmy
        )
        for t in (":", "-"):
            te = re.escape(t)
            time = f"{_HOUR}(?:{te}{_MINSEC}(?:{te}{_MINSEC}{frac})?)?"
            for dre in dates:
                regs.append(f"{dre}(?:{seps}{time})?{zone}")
    regs.append(f"{_YEAR}{_MONTH_ND}{_DAY_ND}")
    regs.append(
        f"{_YEAR}{_MONTH_ND}{_DAY_ND}{_HOUR_ND}"
        f"(?:{_MINSEC_ND}(?:{_MINSEC_ND}{frac})?)?{zone}"
    )
    return regs


def guess_type_sql(col: str) -> str:
    """DuckDB CASE expression mirroring ``guess_type`` on a string column
    (timestamp formats collapse to 'timestamp'; undecided empty → NULL).
    Literal-$ anchors become optional-trailing-newline full matches, the
    exact semantics of Python's re $ used by the engine."""
    lits = ", ".join(f"'{x}'" for x in sorted(TRUE_STRINGS | FALSE_STRINGS))
    # python str.strip() whitespace set, expressed as a trim character list
    strip = f"trim({col}, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11))"
    time_union = " OR ".join(
        f"regexp_full_match({strip}, '{r}')" for r in time_match_sql_regexes()
    )
    # the trailing \n? mirrors python re's $ (matches before one final
    # newline); DuckDB plain strings keep the backslash, RE2 reads \n
    return f"""
      CASE WHEN {col} IS NULL OR {col} = '' THEN NULL
           WHEN {col} IN ({lits}) THEN 'boolean'
           WHEN {strip} <> '' AND ({time_union}) THEN 'timestamp'
           WHEN regexp_full_match({col}, '[+-]?[0-9]+\\n?') THEN 'long'
           WHEN regexp_full_match({col},
             '[+-]?(NaN|Infinity|([1-9][0-9]*|0)(\\.[0-9]+)([eE][+-]?[0-9]+)?[fFdD]?)\\n?')
             THEN 'double'
           WHEN json_valid({col})
                AND NOT regexp_full_match({strip}, '[+-]?(?i)(nan|inf|infinity)')
                THEN 'json'
           ELSE 'string' END
    """


def merge_type(t1: str | None, t2: str | None) -> str | None:
    """The widening lattice (schema_guess.rb:112-128)."""
    if t1 == t2:
        return t1
    if t1 is None or t2 is None:
        return t1 or t2
    return _TYPE_COALESCE.get(tuple(sorted((t1, t2))), "string")


def types_from_array_records(samples: list[list]) -> list[str | tuple[str, str]]:
    """Per-column merged types over row-major samples
    (schema_guess.rb:37-43, merge at :86-95)."""
    ncols = max((len(r) for r in samples), default=0)
    out: list[str | tuple[str, str]] = []
    for i in range(ncols):
        cell_types = [guess_type(r[i]) if i < len(r) else None for r in samples]
        plain = [t[0] if isinstance(t, tuple) else t for t in cell_types]
        merged: str | None = None
        for t in plain:
            merged = merge_type(merged, t)
        merged = merged or "string"
        if merged == "timestamp":
            fmt = guess_time_format(
                [str(r[i]) for r in samples if i < len(r) and r[i] not in (None, "")]
            )
            out.append(("timestamp", fmt or "%Y-%m-%d %H:%M:%S"))
        else:
            out.append(merged)
    return out


def schema_guess(
    column_names: list[str], samples: list[list]
) -> list[dict]:
    """from_array_records (schema_guess.rb:26-35): ordered column specs
    [{name, type[, format]}]."""
    types = types_from_array_records(samples)
    cols = []
    for name, t in zip(column_names, types):
        if isinstance(t, tuple):
            cols.append({"name": name, "type": t[0], "format": t[1]})
        else:
            cols.append({"name": name, "type": t})
    return cols


# ---------------------------------------------------------------------------
# newline / charset / compression / format guesses
# ---------------------------------------------------------------------------

def guess_newline(sample: bytes) -> str:
    """Majority vote CRLF vs LF vs CR (newline.rb:10-25)."""
    crlf = sample.count(b"\r\n")
    lf = sample.count(b"\n") - crlf
    cr = sample.count(b"\r") - crlf
    if crlf > lf / 2 and crlf > cr / 2:
        return "CRLF"
    return "LF" if lf >= cr else "CR"


def guess_charset(sample: bytes) -> str:
    """UTF-8, unconditionally (charset.rb:7-13)."""
    return "UTF-8"


def guess_compression(sample: bytes) -> str | None:
    """Magic-byte sniff: gzip 1f 8b, bzip2 'BZh' (embulk-guess-gzip/-bzip2)."""
    if sample[:2] == b"\x1f\x8b":
        return "gzip"
    if sample[:3] == b"BZh":
        return "bzip2"
    return None


def _try_json(text: str) -> bool:
    t = text.strip()
    if not t:
        return False
    try:
        json.loads(t)
        return True
    except Exception:
        pass
    # newline-delimited json
    lines = [ln for ln in t.splitlines() if ln.strip()]
    if not lines:
        return False
    try:
        for ln in lines[:20]:
            json.loads(ln)
        return True
    except Exception:
        return False


#: dialect candidate sets — the embulk-guess-csv plugin's published
#: constants (embulk/guess/csv.rb in the reference's guess chain,
#: build.gradle:21 via embulk-util-guess; chain order build.gradle:197)
_DELIM_CANDIDATES = [",", "\t", ";", "|"]
_QUOTE_CANDIDATES = ['"', "'"]
_ESCAPE_CANDIDATES = ["\\", '"']
_NULL_STRING_CANDIDATES = ["null", "NULL", "#N/A", "\\N"]
_COMMENT_MARKER_CANDIDATES = ["#", "//"]


def guess_delimiter(lines: list[str]) -> str | None:
    """Highest total-count / stddev(count-per-line): frequent AND
    consistent across lines — a delimiter appears the same number of
    times on every record, a data character doesn't."""
    best, best_w = None, 0.0
    for d in _DELIM_CANDIDATES:
        counts = [ln.count(d) for ln in lines]
        total = sum(counts)
        if total <= 0:
            continue
        mean = total / len(counts)
        stddev = (sum((c - mean) ** 2 for c in counts) / len(counts)) ** 0.5
        w = total / max(stddev, 1e-9)
        if w > best_w:
            best, best_w = d, w
    return best


def guess_quote(lines: list[str], delim: str) -> str | None:
    """Candidate quote chars scored by average per-line occurrences, with
    a complete delimiter-adjacent quoted field worth 20×; a quote must
    average ≥10 to be believed (stray apostrophes in prose score low)."""
    d = re.escape(delim)
    best, best_w = None, 0.0
    for q in _QUOTE_CANDIDATES:
        qq = re.escape(q)
        field = re.compile(rf"(?:^|{d})\s*{qq}(?:(?!{qq}).)*{qq}\s*(?:$|{d})")
        weights = []
        for ln in lines:
            count = ln.count(q)
            if count:
                weights.append(count + 20 * len(field.findall(ln)))
        avg = sum(weights) / len(weights) if weights else 0.0
        if avg > best_w:
            best, best_w = q, avg
    return best if best_w >= 10.0 else None


def guess_escape(lines: list[str], delim: str, quote: str) -> str | None:
    """Escape char: a candidate immediately followed by the delimiter or
    the quote is evidence it escapes them; most such occurrences wins."""
    found: list[tuple[int, str]] = []
    for e in _ESCAPE_CANDIDATES:
        pat = re.compile(
            re.escape(e) + "(?:" + re.escape(delim) + "|" + re.escape(quote) + ")"
        )
        n = sum(len(pat.findall(ln)) for ln in lines)
        if n > 0:
            found.append((n, e))
    return max(found)[1] if found else None


def guess_null_string(lines: list[str], delim: str) -> str | None:
    """A null-marker candidate standing alone as a field value."""
    d = re.escape(delim)
    found: list[tuple[int, str]] = []
    for ns in _NULL_STRING_CANDIDATES:
        pat = re.compile(f"(?:^|{d}){re.escape(ns)}(?=$|{d})")
        n = sum(len(pat.findall(ln)) for ln in lines)
        if n > 0:
            found.append((n, ns))
    return max(found)[1] if found else None


def guess_comment_marker(
    lines: list[str], delim: str, quote: str | None, null_string: str | None
) -> str | None:
    """Line-leading comment marker; lines that start with the quote char or
    a null marker are data, not comments (e.g. '#N/A' at line start)."""
    exclude: list[re.Pattern] = []
    if quote:
        exclude.append(re.compile("^" + re.escape(quote)))
    if null_string:
        exclude.append(
            re.compile("^" + re.escape(null_string) + "(?:" + re.escape(delim) + "|$)")
        )
    found: list[tuple[int, str]] = []
    for m in _COMMENT_MARKER_CANDIDATES:
        n = sum(
            1
            for ln in lines
            if ln.startswith(m) and not any(ex.search(ln) for ex in exclude)
        )
        if n > 0:
            found.append((n, m))
    return max(found)[1] if found else None


def _parse_csv_line(ln: str, delim: str, quote: str | None, escape: str | None) -> list[str]:
    """One record through Python's csv with the guessed dialect; escape ==
    quote means RFC-4180 doubled quotes (csv's doublequote mode)."""
    kw: dict = {"delimiter": delim}
    if quote:
        kw["quotechar"] = quote
        if escape and escape != quote:
            kw["escapechar"] = escape
            kw["doublequote"] = False
    else:
        kw["quoting"] = _csv.QUOTE_NONE
        if escape:
            kw["escapechar"] = escape
    return next(_csv.reader([ln], **kw))


def guess_csv_dialect(text: str, *, all_strings: bool = False) -> dict:
    """Full CSV dialect guess: delimiter (count/stddev), quote, escape,
    null string, comment marker, header detection ('first row all
    non-typed strings while body has typed columns'), then per-column
    schema guess. ``all_strings`` is the csv_all_strings variant — same
    dialect, every column typed string (build.gradle:22)."""
    lines = [ln for ln in text.splitlines() if ln.strip()][:50]
    comment = None
    # two passes: if a comment marker is found, strip comment lines and
    # RE-RUN every detector — a prose preamble full of commas must not be
    # allowed to out-vote the data's real delimiter
    for _pass in range(2):
        delim = guess_delimiter(lines) or ","
        quote = guess_quote(lines, delim)
        # the effective quote for escape detection defaults to '"' (an
        # escape can exist without believed quoting, e.g. backslash-escaped
        # delimiters)
        escape = guess_escape(lines, delim, quote or '"')
        null_string = guess_null_string(lines, delim)
        found = guess_comment_marker(lines, delim, quote, null_string)
        if not found:
            break  # keeps a pass-1 marker: stripped lines show none
        comment = found
        # strip with the SAME exclusions the detector used: a line starting
        # with the quote char or a null marker ('#N/A,5') is data
        keep_if = []
        if quote:
            keep_if.append(re.compile("^" + re.escape(quote)))
        if null_string:
            keep_if.append(
                re.compile(
                    "^" + re.escape(null_string)
                    + "(?:" + re.escape(delim) + "|$)"
                )
            )
        lines = [
            ln for ln in lines
            if not ln.startswith(found) or any(k.search(ln) for k in keep_if)
        ]
    rows = [_parse_csv_line(ln, delim, quote, escape) for ln in lines]
    rows = [r for r in rows if r]
    if not rows:
        # e.g. the whole 32 KiB sample is comments: a usable (if empty)
        # config beats an unhandled crash in `guess`
        out = {
            "delimiter": delim, "quote": quote or '"',
            "escape": escape or quote or '"',
            "header_line": False, "columns": [],
        }
        if comment:
            out["comment_line_marker"] = comment
        return out
    header = False
    if len(rows) >= 2:
        head_types = [guess_type(v) for v in rows[0]]
        body = types_from_array_records(rows[1:])
        plain_head = [t[0] if isinstance(t, tuple) else t for t in head_types]
        plain_body = [t[0] if isinstance(t, tuple) else t for t in body]
        if all(t in ("string", None) for t in plain_head) and any(
            t not in ("string", None) for t in plain_body
        ):
            header = True
    data_rows = rows[1:] if header else rows
    names = (
        rows[0]
        if header
        else [f"c{i}" for i in range(max(len(r) for r in rows))]
    )
    if all_strings:
        columns = [{"name": n, "type": "string"} for n in names]
    else:
        columns = schema_guess(names, data_rows)
    out = {
        "delimiter": delim,
        # believed quote, else the RFC-4180 default; escape defaults to the
        # quote char (doubled-quote behavior) when none was detected
        "quote": quote or '"',
        "escape": escape or quote or '"',
        "header_line": header,
        "columns": columns,
    }
    if null_string:
        out["null_string"] = null_string
    if comment:
        out["comment_line_marker"] = comment
    return out


#: LTSV line: label:value fields, tab-separated (labeled-tsv.org grammar;
#: the embulk-guess-ltsv ecosystem plugin sits before csv in its chain)
_LTSV_LINE = re.compile(r"^[A-Za-z0-9_.\-]+:[^\t\n]*(\t[A-Za-z0-9_.\-]+:[^\t\n]*)*$")


def guess_ltsv(text: str) -> dict | None:
    """embulk-guess-ltsv: every sampled line matches ``label:value``
    tab-separated fields AND at least two lines agree on ≥1 label →
    ``{type: ltsv, columns}`` with per-label cell-type guesses (the same
    lattice csv columns get); else None and the chain falls through to
    csv. A lone-colon CSV ("a:1,b:2" has no tab and one field) is
    rejected by requiring ≥2 labels per line or ≥2 sample lines."""
    lines = [l for l in text.split("\n") if l.strip()][:-1] or [
        l for l in text.split("\n") if l.strip()
    ]
    if not lines or any(not _LTSV_LINE.match(l) for l in lines):
        return None
    rows = []
    for l in lines:
        row = {}
        for field in l.split("\t"):
            k, _, v = field.partition(":")
            row[k] = v
        rows.append(row)
    # evidence gate: a lone "token:rest" per line is indistinguishable
    # from prose/CSV (timestamps, urls) — require multi-field lines OR
    # a label recurring across rows before claiming LTSV
    multi_field = any(len(r) >= 2 for r in rows)
    label_counts: dict[str, int] = {}
    for r in rows:
        for k in r:
            label_counts[k] = label_counts.get(k, 0) + 1
    recurring = any(n >= 2 for n in label_counts.values())
    # all-digit "labels" are clock times ("12:30"), not LTSV labels
    named = all(not k.isdigit() for k in label_counts)
    if not named or not (multi_field or (len(rows) >= 2 and recurring)):
        return None
    labels: list[str] = []
    for r in rows:
        for k in r:
            if k not in labels:
                labels.append(k)
    columns = []
    for k in labels:
        merged: str | None = None
        fmt = None
        for r in rows:
            if k not in r or r[k] == "":
                continue
            t = guess_type(r[k])
            if isinstance(t, tuple):
                t, fmt = t
            merged = merge_type(merged, t)
        col = {"name": k, "type": merged or "string"}
        if col["type"] == "timestamp" and fmt:
            col["format"] = fmt
        columns.append(col)
    return {"type": "ltsv", "columns": columns}


def guess_bytes(sample: bytes, config: dict | None = None) -> dict:
    """The guess chain gzip→bzip2→json→csv (build.gradle:197), iterated to
    a fixed point ≤10 times (GuessExecutor.java:142-195). Returns a config
    diff: {decoders, charset, newline, parser:{type, ...}}."""
    cfg = dict(config or {})
    for _ in range(10):
        before = json.dumps(cfg, sort_keys=True)
        comp = guess_compression(sample)
        if comp and not cfg.get("decoders"):
            cfg["decoders"] = [{"type": comp}]
            sample = (gzip if comp == "gzip" else bz2).decompress(sample)
        if "charset" not in cfg:
            cfg["charset"] = guess_charset(sample)
        if "newline" not in cfg:
            cfg["newline"] = guess_newline(sample)
        if "parser" not in cfg:
            # binary container magics first (self-describing formats need
            # no dialect guess — embulk-guess stops at the type)
            if sample[:4] == b"Obj\x01":
                cfg["parser"] = {"type": "avro"}
                break
            if sample[:4] == b"PAR1":
                cfg["parser"] = {"type": "parquet"}
                break
            if sample[:3] == b"ORC":
                cfg["parser"] = {"type": "orc"}
                break
            text = sample.decode("utf-8", errors="replace")
            if _try_json(text):
                cfg["parser"] = {"type": "json"}
            elif (ltsv := guess_ltsv(text)) is not None:
                cfg["parser"] = ltsv
            else:
                # csv_all_strings: same dialect guess, all columns string —
                # selected via config like the reference's guess plugin list
                all_strings = "csv_all_strings" in cfg.get("guess_plugins", [])
                cfg["parser"] = dict(
                    {"type": "csv"},
                    **guess_csv_dialect(text, all_strings=all_strings),
                )
        if json.dumps(cfg, sort_keys=True) == before:
            break
    return cfg


#: reference sample budget (GuessExecutor.java:308, SamplingParserPlugin.java:138)
SAMPLE_BUFFER_BYTES = 32 * 1024
MIN_SAMPLE_BYTES = 40


def guess_file(path: str, config: dict | None = None) -> dict:
    """Guess from the head of a file (32 KiB sample, ≥40 bytes)."""
    with open(path, "rb") as f:
        sample = f.read(SAMPLE_BUFFER_BYTES)
    if len(sample) < MIN_SAMPLE_BYTES:
        raise ValueError(
            f"sample too small ({len(sample)} bytes < {MIN_SAMPLE_BYTES})"
        )
    return guess_bytes(sample, config)
