"""Natural-language date parsing (English) wired to the native DATETIME
filter.

Behavioral spec: the reference engine's date parser and ambiguous-datetime
model (de-odex/whoosh-novo ``src/whoosh/qparser/dateparse.py:595-776``
English grammar, ``src/whoosh/util/times.py:102-478`` adatetime/timespan
semantics). This is a fresh implementation: parser elements are plain
closures over compiled regexes composed by small combinator functions, not a
class tree; the grammar and disambiguation rules are reproduced so
``date_from`` is differentially testable against the reference.

Supported language (all case-insensitive):
  * compact/separated numerics: ``2005``, ``200505``, ``2005-05-10``,
    ``2005/05/10 01:08:35``
  * named months in d/m/y orders: ``25 may 2011``, ``may 25th 2011``,
    ``2011 may 25``, ``may 2011``
  * times: ``13:05``, ``1:25:40pm``, ``12:36:25.255``, ``noon``,
    ``midnight``, ``now``; date+time bags in either order
  * relative: ``today``, ``yesterday``, ``tomorrow``, ``this month``,
    ``this year``, ``next friday``, ``last tuesday``, ``+3 weeks``,
    ``-2hrs``
  * ranges: ``<date> to <date>``

``date_from(text, basedate)`` returns a ``datetime`` (fully specified), a
``Span`` (ambiguous dates become [floor, ceil] ranges; explicit ranges are
disambiguated with the reference's year/month-day copying heuristics), or
``None`` when the text does not parse.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta, timezone

from dateutil.relativedelta import relativedelta

UNITS = ("year", "month", "day", "hour", "minute", "second", "microsecond")


class TimeError(Exception):
    pass


class ADate:
    """Partially-specified datetime: any unit may be None (unspecified)."""

    __slots__ = UNITS

    def __init__(
        self,
        year=None,
        month=None,
        day=None,
        hour=None,
        minute=None,
        second=None,
        microsecond=None,
    ):
        if month is not None and not 1 <= month <= 12:
            raise TimeError(f"month {month} out of range")
        if day is not None and day < 1:
            raise TimeError(f"day {day} out of range")
        if (
            year is not None
            and month is not None
            and day is not None
            and day > calendar.monthrange(year, month)[1]
        ):
            raise TimeError(f"day {day} out of range for {year}-{month}")
        if hour is not None and not 0 <= hour <= 23:
            raise TimeError(f"hour {hour} out of range")
        if minute is not None and not 0 <= minute <= 59:
            raise TimeError(f"minute {minute} out of range")
        if second is not None and not 0 <= second <= 59:
            raise TimeError(f"second {second} out of range")
        if microsecond is not None and not 0 <= microsecond <= 999999:
            raise TimeError(f"microsecond {microsecond} out of range")
        self.year, self.month, self.day = year, month, day
        self.hour, self.minute, self.second = hour, minute, second
        self.microsecond = microsecond

    def __repr__(self):
        return f"ADate({', '.join(f'{u}={getattr(self, u)}' for u in UNITS)})"

    def replace(self, **kw) -> "ADate":
        vals = {u: getattr(self, u) for u in UNITS}
        vals.update(kw)
        return ADate(**vals)

    def is_ambiguous(self) -> bool:
        return any(getattr(self, u) is None for u in UNITS)

    def has_no_date(self) -> bool:
        return self.year is None and self.month is None and self.day is None

    def is_void(self) -> bool:
        return all(getattr(self, u) is None for u in UNITS)

    def floor(self) -> datetime:
        if self.year is None:
            raise TimeError("date has no year")
        return datetime(
            self.year,
            self.month if self.month is not None else 1,
            self.day if self.day is not None else 1,
            self.hour if self.hour is not None else 0,
            self.minute if self.minute is not None else 0,
            self.second if self.second is not None else 0,
            self.microsecond if self.microsecond is not None else 0,
            tzinfo=timezone.utc,
        )

    def ceil(self) -> datetime:
        if self.year is None:
            raise TimeError("date has no year")
        m = self.month if self.month is not None else 12
        d = (
            self.day
            if self.day is not None
            else calendar.monthrange(self.year, m)[1]
        )
        return datetime(
            self.year,
            m,
            d,
            self.hour if self.hour is not None else 23,
            self.minute if self.minute is not None else 59,
            self.second if self.second is not None else 59,
            self.microsecond if self.microsecond is not None else 999999,
            tzinfo=timezone.utc,
        )


def _floor(x) -> datetime:
    return x if isinstance(x, datetime) else x.floor()


def _ceil(x) -> datetime:
    return x if isinstance(x, datetime) else x.ceil()


def _fix(at: ADate):
    """ADate -> datetime when every unit is specified."""
    if isinstance(at, ADate) and not at.is_ambiguous():
        return datetime(
            at.year,
            at.month,
            at.day,
            at.hour,
            at.minute,
            at.second,
            at.microsecond,
            tzinfo=timezone.utc,
        )
    return at


def _fill(acc, piece):
    """Accumulate: acc's unspecified units take values from piece (earlier
    elements win); validates the combination."""
    if isinstance(acc, datetime):
        return acc
    vals = {}
    for u in UNITS:
        v = getattr(acc, u)
        if v is None:
            v = getattr(piece, u)
        vals[u] = v
    return _fix(ADate(**vals))


class Span:
    """A time span between two datetime/ADate endpoints."""

    def __init__(self, start, end):
        self.start = start
        self.end = end

    def __repr__(self):
        return f"Span({self.start!r}, {self.end!r})"

    def disambiguated(self, basedate: datetime) -> "Span":
        """Resolve to concrete [floor(start), ceil(end)] datetimes, copying
        missing years / month+days across endpoints the way the reference
        does (util/times.py:361-478)."""
        start = self.start
        end = self.end
        s_ad = isinstance(start, ADate)
        e_ad = isinstance(end, ADate)
        start_year_amb = s_ad and start.year is None
        end_year_amb = e_ad and end.year is None

        if (s_ad and start.has_no_date()) and (e_ad and end.has_no_date()):
            # times only: both endpoints get the basedate's date
            start = start.replace(
                year=basedate.year, month=basedate.month, day=basedate.day
            )
            end = end.replace(
                year=basedate.year, month=basedate.month, day=basedate.day
            )
        else:
            if start_year_amb and end_year_amb:
                start = start.replace(year=basedate.year)
                end = end.replace(year=basedate.year)
            elif start_year_amb:
                start = start.replace(year=end.year)
            elif end_year_amb:
                end = end.replace(year=max(start.year, basedate.year))

        if start.year == end.year:
            start_dm = not isinstance(start, ADate) or not (
                start.month is None and start.day is None
            )
            end_dm = not isinstance(end, ADate) or not (
                end.month is None and end.day is None
            )
            if end_dm and not start_dm:
                if _floor(start).time() > _ceil(end).time():
                    start = start.replace(
                        month=basedate.month, day=basedate.day
                    )
                else:
                    start = start.replace(month=end.month, day=end.day)
            elif start_dm and not end_dm:
                end = end.replace(month=basedate.month, day=basedate.day)

        if _floor(start).date() > _ceil(end).date():
            if start_year_amb:
                start = start.replace(year=end.year - 1)
            elif end_year_amb:
                end = end.replace(year=start.year + 1)
            else:
                start, end = end, start

        sdt = _floor(start)
        edt = _ceil(end)
        if sdt.date() == edt.date() and sdt.time() > edt.time():
            edt += timedelta(days=1)
        return Span(sdt, edt)


def relative_days(current_wday: int, wday: int, direction: int) -> int:
    """Days (signed) to the next/last given weekday (0=monday)."""
    if current_wday == wday:
        return 7 * direction
    if direction == 1:
        return (wday + 7 - current_wday) % 7
    return (current_wday + 7 - wday) % 7 * -1


# ---------------------------------------------------------------------------
# parser combinators: element = fn(text, pos, base) -> (result, newpos);
# (None, None) = no match; TimeError propagates to the nearest choice()
# ---------------------------------------------------------------------------

_SEP = re.compile(r"(\s+|\s*,\s*)")
_W = r"(?=\W|$)"


def _rx(pattern: str, build=None):
    expr = re.compile(pattern, re.IGNORECASE)

    def parse(text, pos, base):
        m = expr.match(text, pos)
        if not m:
            return None, None
        props = {}
        for k, v in m.groupdict().items():
            if v is not None and v.isdigit():
                props[k] = int(v)
            else:
                props[k] = v
        try:
            if build is None:
                d = ADate(**{u: props.get(u) for u in UNITS})
            else:
                d = build(props, base)
        except TimeError:
            return None, None
        if d is None:
            return None, None
        return d, m.end()

    return parse


def _literal(word: str):
    """Matches a connective word; contributes a void ADate."""
    expr = re.compile(word, re.IGNORECASE)

    def parse(text, pos, base):
        m = expr.match(text, pos)
        if not m:
            return None, None
        return ADate(), m.end()

    return parse


def _seq(*elements, progressive=False):
    """Elements in order, standard separator between them, merged with
    _fill (earlier-set units win). ``progressive``: only the first element
    is required."""

    def parse(text, pos, base):
        acc = ADate()
        first = True
        matched_any = False
        for e in elements:
            p = pos
            if not first:
                m = _SEP.match(text, p)
                if not m:
                    if progressive and matched_any:
                        return acc, pos
                    return None, None
                p = m.end()
            try:
                at, npos = e(text, p, base)
            except TimeError:
                return None, None
            if at is None:
                if progressive and matched_any:
                    return acc, pos
                return None, None
            try:
                acc = _fill(acc, at)
            except TimeError:
                return None, None
            pos = npos
            first = False
            matched_any = True
        return acc, pos

    return parse


def _choice(*elements):
    def parse(text, pos, base):
        for e in elements:
            try:
                d, npos = e(text, pos, base)
            except TimeError:
                d, npos = None, None
            if d is not None:
                return d, npos
        return None, None

    return parse


def _bag(*elements):
    """Elements in any order (each at most once), separated, merged."""

    def parse(text, pos, base):
        acc = ADate()
        seen = [False] * len(elements)
        first = True
        while True:
            newpos = pos
            if not first:
                m = _SEP.match(text, pos)
                if not m:
                    break
                newpos = m.end()
            for i, e in enumerate(elements):
                try:
                    at, xpos = e(text, newpos, base)
                except TimeError:
                    at, xpos = None, None
                if at is not None:
                    if seen[i]:
                        return None, None
                    acc = _fill(acc, at)  # TimeError propagates to _choice
                    newpos = xpos
                    seen[i] = True
                    break
            else:
                break
            pos = newpos
            if all(seen):
                break
            first = False
        if not any(seen):
            return None, None
        return acc, pos

    return parse


def _combo_range(*elements):
    """Sequence whose non-void results must be exactly two dates -> Span."""

    def parse(text, pos, base):
        dates = []
        first = True
        for e in elements:
            if not first:
                m = _SEP.match(text, pos)
                if not m:
                    return None, None
                pos = m.end()
            try:
                at, npos = e(text, pos, base)
            except TimeError:
                at, npos = None, None
            if at is None:
                return None, None
            pos = npos
            first = False
            if isinstance(at, ADate) and at.is_void():
                continue
            if len(dates) == 2:
                return None, None
            dates.append(at)
        if len(dates) < 2:
            return None, None
        return Span(dates[0], dates[1]), pos

    return parse


# ---------------------------------------------------------------------------
# English grammar
# ---------------------------------------------------------------------------

_MONTH_PATS = (
    "january|jan",
    "february|febuary|feb",
    "march|mar",
    "april|apr",
    "may",
    "june|jun",
    "july|jul",
    "august|aug",
    "september|sept|sep",
    "october|oct",
    "november|nov",
    "december|dec",
)

_DAYNAME_PATS = (
    "monday|mon|mo",
    "tuesday|tues|tue|tu",
    "wednesday|wed|we",
    "thursday|thur|thu|th",
    "friday|fri|fr",
    "saturday|sat|sa",
    "sunday|sun|su",
)

_day = _rx(rf"(?P<day>([123][0-9])|[1-9])(st|nd|rd|th)?{_W}")
_year = _rx(rf"(?P<year>[0-9]{{4}}){_W}")
_time24 = _rx(
    r"(?P<hour>([0-1][0-9])|(2[0-3])):(?P<minute>[0-5][0-9])"
    r"(:(?P<second>[0-5][0-9])(\.(?P<microsecond>[0-9]{1,5}))?)?" + _W
)


def _build_time12(p, base):
    hr = p["hour"]
    if p["ampm"].lower().startswith("a"):
        hr = 0 if hr == 12 else hr
    else:
        hr = 12 if hr == 12 else hr + 12
    return ADate(
        hour=hr,
        minute=p.get("minute"),
        second=p.get("second"),
        microsecond=p.get("microsecond"),
    )


_time12 = _rx(
    r"(?P<hour>[1-9]|10|11|12)(:(?P<minute>[0-5][0-9])"
    r"(:(?P<second>[0-5][0-9])(\.(?P<microsecond>[0-9]{1,5}))?)?)?"
    r"\s*(?P<ampm>am|pm)" + _W,
    _build_time12,
)

_midnight = _rx(
    "midnight", lambda p, b: ADate(hour=0, minute=0, second=0, microsecond=0)
)
_noon = _rx("noon", lambda p, b: ADate(hour=12, minute=0, second=0, microsecond=0))
_now = _rx("now", lambda p, b: b)

_time = _choice(_time12, _time24, _midnight, _noon, _now)


def _build_month(p, base):
    text = p["month"]
    for i, pat in enumerate(_MONTH_PATS):
        if re.match(pat, text, re.IGNORECASE):
            return ADate(month=i + 1)
    return None


_month = _rx(
    "(?P<month>" + "|".join(f"({p})" for p in _MONTH_PATS) + ")", _build_month
)


def _build_dayname(p, base):
    direction = -1 if p["dir"].lower() == "last" else 1
    daynum = 0
    for i, pat in enumerate(_DAYNAME_PATS):
        if re.match(pat, p["day"], re.IGNORECASE):
            daynum = i
            break
    d = base.date() + timedelta(
        days=relative_days(base.weekday(), daynum, direction)
    )
    return ADate(year=d.year, month=d.month, day=d.day)


_dayname = _rx(
    r"(?P<dir>next|last) +(?P<day>" + "|".join(_DAYNAME_PATS) + r")" + _W,
    _build_dayname,
)


def _rel_day(offset: int):
    def build(p, base):
        d = base.date() + timedelta(days=offset)
        return ADate(year=d.year, month=d.month, day=d.day)

    return build


_tomorrow = _rx("tomorrow", _rel_day(1))
_yesterday = _rx("yesterday", _rel_day(-1))
_today = _rx("today", _rel_day(0))
_thisyear = _rx("this year", lambda p, b: ADate(year=b.year))
_thismonth = _rx("this month", lambda p, b: ADate(year=b.year, month=b.month))


def _build_plusdate(p, base):
    sign = -1 if p["dir"] == "-" else 1
    return base + relativedelta(
        years=(p.get("years") or 0) * sign,
        months=(p.get("months") or 0) * sign,
        weeks=(p.get("weeks") or 0) * sign,
        days=(p.get("days") or 0) * sign,
        hours=(p.get("hours") or 0) * sign,
        minutes=(p.get("mins") or 0) * sign,
        seconds=(p.get("secs") or 0) * sign,
    )


_plusdate = _rx(
    r"(?P<dir>[+-]) *"
    r"((?P<years>[0-9]+) *(years|year|yrs|yr|ys|y))? *"
    r"((?P<months>[0-9]+) *(months|month|mons|mon|mos|mo))? *"
    r"((?P<weeks>[0-9]+) *(weeks|week|wks|wk|ws|w))? *"
    r"((?P<days>[0-9]+) *(days|day|dys|dy|ds|d))? *"
    r"((?P<hours>[0-9]+) *(hours|hour|hrs|hr|hs|h))? *"
    r"((?P<mins>[0-9]+) *(minutes|minute|mins|min|ms|m))? *"
    r"((?P<secs>[0-9]+) *(seconds|second|secs|sec|s))?" + _W,
    _build_plusdate,
)

# compact numeric datetime, progressively optional from the right,
# separated by any of "- .:/" (or nothing)
_simple = _rx(
    r"(?P<year>[0-9]{4})([- .:/]*(?P<month>[0-1][0-9])([- .:/]*(?P<day>[0-3][0-9])"
    r"([- .:/]*(?P<hour>([0-1][0-9])|(2[0-3]))([- .:/]*(?P<minute>[0-5][0-9])"
    r"([- .:/]*(?P<second>[0-5][0-9])([- .:/]*(?P<microsecond>[0-9]{6}))?)?)?)?)?)?"
    r"[- .:/]*(?=\s|$)"  # a trailing separator is consumed (reference quirk)
)

_dmy = _choice(
    _seq(_day, _month, _year),
    _seq(_month, _day, _year),
    _seq(_year, _month, _day),
    _seq(_year, _day, _month),
    _seq(_day, _month),
    _seq(_month, _day),
    _seq(_month, _year),
    _month,
    _year,
    _dayname,
    _tomorrow,
    _yesterday,
    _thisyear,
    _thismonth,
    _today,
    _now,
)

_datetime_bag = _bag(_time, _dmy)
_bundle = _choice(_plusdate, _datetime_bag, _simple)
_torange = _combo_range(_bundle, _literal("to"), _bundle)
_all = _choice(_torange, _bundle)


def date_from(text: str, basedate: datetime):
    """Parse ``text``; the full text must be consumed. Returns a concrete
    ``datetime``, a disambiguated ``Span``, or ``None``."""
    try:
        d, pos = _all(text, 0, basedate)
    except TimeError:
        d, pos = None, None
    if d is None or pos != len(text):
        return None
    if isinstance(d, datetime):
        return d
    if isinstance(d, Span):
        return d.disambiguated(basedate)
    if not d.is_ambiguous():
        return _fix(d)
    return Span(d, d).disambiguated(basedate)


def parse_range(text: str, basedate: datetime):
    """(start, end) inclusive datetime bounds for ``text``; None if it does
    not parse. A single fully-specified datetime yields a point range."""
    d = date_from(text, basedate)
    if d is None:
        return None
    if isinstance(d, datetime):
        return d, d
    return d.start, d.end


def date_range_query(attrs, column: str, text: str, basedate: datetime):
    """Build the native DateRange filter (search/query.py) from a natural
    language date expression — the DateParserPlugin wiring."""
    from whoosh_novo_ray.search.query import DateRange

    r = parse_range(text, basedate)
    if r is None:
        raise TimeError(f"can't parse date expression: {text!r}")
    start, end = (x.replace(tzinfo=None) for x in r)
    return DateRange(attrs, column, start.isoformat(), end.isoformat())
