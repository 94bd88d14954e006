"""Date / time transformers, §2.9 of SURVEY.md.

Reference semantics: src/kamae/spark/transformers/{current_date,
current_date_time,current_unix_timestamp,date_add,date_diff,date_parse,
date_time_to_unix_timestamp,unix_timestamp_to_date_time}.py

Dates are carried as strings ``yyyy-MM-dd[ HH:mm:ss.SSS]`` or as unix
second/millisecond integers — never as a timestamp dtype (reference:
src/kamae/utils/dtype_enum.py has no timestamp). The "current" ops snapshot
the clock ONCE on the driver at construction (or accept an explicit pinned
timestamp — the testable, freezegun-equivalent path); a per-batch clock would
break determinism across a cluster.

Kernels are pyarrow.compute temporal functions over flat values (strptime /
strftime / component extraction) — vectorized, no Python row loops.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kamae_ray.base import Transformer, _append_or_replace
from kamae_ray.functions import arrays as A
from kamae_ray.stages.elementwise import MultiInputTransformer, UnaryKernelTransformer

_STR = (pa.string(),)
_FMT_DATE = "%Y-%m-%d"
_FMT_DT = "%Y-%m-%d %H:%M:%S"


def _parse_ts(flat: pa.Array) -> pa.Array:
    """Parse 'yyyy-MM-dd' / 'yyyy-MM-dd HH:mm:ss[.SSS]' strings to timestamp(ms)."""
    s = flat
    # normalise: append time part when missing so one strptime pass suffices
    has_time = pc.match_substring_regex(s, r"\d{2}:\d{2}")
    s = pc.if_else(has_time, s, pc.binary_join_element_wise(s, pa.scalar(" 00:00:00"), pa.scalar("")))
    has_frac = pc.match_substring_regex(s, r"\.\d")
    s = pc.if_else(has_frac, s, pc.binary_join_element_wise(s, pa.scalar(".000"), pa.scalar("")))
    # Arrow strptime has no %f: parse seconds and the ms fraction separately.
    sec_part = pc.utf8_slice_codeunits(s, 0, 19)
    frac_part = pc.utf8_slice_codeunits(s, 20, 23)
    sec_ts = pc.strptime(sec_part, format="%Y-%m-%d %H:%M:%S", unit="s")
    sec_i = pc.cast(sec_ts, pa.int64())
    ms = pc.cast(frac_part, pa.int64(), safe=False)
    total_ms = pc.add(pc.multiply(sec_i, pa.scalar(1000)), ms)
    return pc.cast(total_ms, pa.timestamp("ms"))


class CurrentDateTransformer(Transformer):
    """Current date string, snapshotted once. Reference: transformers/current_date.py:112."""

    compatible_dtypes = None

    def __init__(self, *args, pinned_datetime: str | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.pinned_datetime = pinned_datetime or _dt.datetime.now(_dt.timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S.%f"
        )[:-3]

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        val = self.pinned_datetime[:10]
        out = pa.array([val] * batch.num_rows, pa.string())
        return _append_or_replace(batch, self.output_col, self._cast_out(out))


class CurrentDateTimeTransformer(CurrentDateTransformer):
    """Current datetime string (ms precision). Reference: transformers/current_date_time.py:122."""

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        out = pa.array([self.pinned_datetime] * batch.num_rows, pa.string())
        return _append_or_replace(batch, self.output_col, self._cast_out(out))


class CurrentUnixTimestampTransformer(CurrentDateTransformer):
    """Now in s or ms. Reference: transformers/current_unix_timestamp.py:128."""

    def __init__(self, *args, unit: str = "s", **kwargs):
        super().__init__(*args, **kwargs)
        if unit not in ("s", "ms"):
            raise ValueError("unit must be s|ms")
        self.unit = unit

    def transform_batch(self, batch: pa.Table) -> pa.Table:
        dt = _dt.datetime.strptime(self.pinned_datetime, "%Y-%m-%d %H:%M:%S.%f").replace(
            tzinfo=_dt.timezone.utc
        )
        # integer arithmetic: float seconds * 1000 truncates a millisecond for
        # values like .123 (binary float lands just below the true value)
        epoch_ms = (dt - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)) // _dt.timedelta(
            milliseconds=1
        )
        val = epoch_ms if self.unit == "ms" else epoch_ms / 1000.0
        typ = pa.int64() if self.unit == "ms" else pa.float64()
        out = pa.array([val] * batch.num_rows, typ)
        return _append_or_replace(batch, self.output_col, self._cast_out(out))


class DateAddTransformer(MultiInputTransformer):
    """date + N days (constant or column); drops time part.
    Reference: transformers/date_add.py:207."""

    compatible_dtypes = _STR
    validate_first_input_only = True  # the optional second input is numeric days

    def __init__(self, *args, num_days: int | None = None, **kwargs):
        kwargs.setdefault("constant", num_days)
        super().__init__(*args, **kwargs)
        self.num_days = self.constant

    def _fold(self, flats):
        ts = _parse_ts(flats[0])
        days = flats[1]
        if isinstance(days, pa.Scalar):
            days_np = np.full(len(ts), days.as_py(), dtype="timedelta64[D]")
        else:
            days_np = pc.cast(days, pa.int64(), safe=False).to_numpy(zero_copy_only=False).astype("timedelta64[D]")
        base = ts.cast(pa.timestamp("ms")).to_numpy(zero_copy_only=False).astype("datetime64[D]")
        out = base + days_np
        return pc.strftime(pa.array(out.astype("datetime64[ms]")), format=_FMT_DATE)


class DateDiffTransformer(MultiInputTransformer):
    """Whole days between two date strings (right - left).
    Reference: transformers/date_diff.py:131."""

    compatible_dtypes = _STR

    def _fold(self, flats):
        a = _parse_ts(flats[0]).cast(pa.timestamp("ms")).to_numpy(zero_copy_only=False).astype("datetime64[D]")
        b = _parse_ts(flats[1]).cast(pa.timestamp("ms")).to_numpy(zero_copy_only=False).astype("datetime64[D]")
        return pa.array((b - a).astype("int64").astype("int32"))


_DATE_PARTS = {
    "Year": lambda ts: pc.year(ts),
    "DayOfYear": lambda ts: pc.day_of_year(ts),
    "MonthOfYear": lambda ts: pc.month(ts),
    "DayOfMonth": lambda ts: pc.day(ts),
    "DayOfWeek": lambda ts: pc.add(pc.day_of_week(ts, count_from_zero=True, week_start=1), 1),
    "Hour": lambda ts: pc.hour(ts),
    "Minute": lambda ts: pc.minute(ts),
    "Second": lambda ts: pc.second(ts),
    "Millisecond": lambda ts: pc.millisecond(ts),
}


class DateParseTransformer(UnaryKernelTransformer):
    """Extract a date part (Mon=1 for DayOfWeek).
    Reference: transformers/date_parse.py:64-105,174-240."""

    compatible_dtypes = _STR

    def __init__(self, *args, date_part: str, **kwargs):
        super().__init__(*args, **kwargs)
        if date_part not in _DATE_PARTS:
            raise ValueError(f"date_part must be one of {list(_DATE_PARTS)}")
        self.date_part = date_part

    def _kernel(self, flat):
        ts = _parse_ts(flat)
        return pc.cast(_DATE_PARTS[self.date_part](ts), pa.int32(), safe=False)


class DateTimeToUnixTimestampTransformer(UnaryKernelTransformer):
    """UTC datetime string -> unix s/ms. Reference:
    transformers/date_time_to_unix_timestamp.py:129."""

    compatible_dtypes = _STR

    def __init__(self, *args, unit: str = "s", **kwargs):
        super().__init__(*args, **kwargs)
        if unit not in ("s", "ms"):
            raise ValueError("unit must be s|ms")
        self.unit = unit

    def _kernel(self, flat):
        ts = _parse_ts(flat)
        ms = pc.cast(ts, pa.int64(), safe=False)
        if self.unit == "ms":
            return ms
        return pc.divide(pc.cast(ms, pa.float64()), pa.scalar(1000.0))


class UnixTimestampToDateTimeTransformer(UnaryKernelTransformer):
    """unix s/ms -> UTC datetime string (optional time part).
    Reference: transformers/unix_timestamp_to_date_time.py:151."""

    compatible_dtypes = None

    def __init__(self, *args, unit: str = "s", include_time: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        if unit not in ("s", "ms"):
            raise ValueError("unit must be s|ms")
        self.unit = unit
        self.include_time = include_time

    def _kernel(self, flat):
        x = pc.cast(flat, pa.float64(), safe=False)
        if self.unit == "s":
            x = pc.multiply(x, pa.scalar(1000.0))
        ms = pc.cast(pc.round(x, ndigits=0), pa.int64(), safe=False)
        ts = ms.cast(pa.timestamp("ms"))
        if not self.include_time:
            return pc.strftime(ts, format=_FMT_DATE)
        s = pc.strftime(ts, format="%Y-%m-%d %H:%M:%S.%f")
        return pc.utf8_slice_codeunits(s, 0, 23)
