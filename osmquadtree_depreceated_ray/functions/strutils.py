"""Date / fixed-point string utilities (reference M13).

* ``parse_string_int`` — integer-or-fixed-point parse
  (/root/reference/utils/writevals.go:240-253 + Intm :230-235):
  plain integers parse as-is; floats become 1e-7-deg ints with
  away-from-zero rounding.  Returns (value, was_integer).
* ``read_date_string`` — two accepted forms, "%Y-%m-%dT%H:%M:%S" then
  "%Y%m%d", to unix seconds (/root/reference/elements/elements.go:105-117).
* ``timestamp_string`` — the reference Timestamp render formats
  (elements.go:89-103 renders unix seconds back to the long form).
"""

from __future__ import annotations

from datetime import datetime, timezone


def parse_string_int(s: str) -> tuple[int, bool]:
    try:
        return int(s), True
    except ValueError:
        f = float(s)  # raises ValueError like the reference returns err
        if f > 0:
            return int(f * 10000000 + 0.5), False
        return int(f * 10000000 - 0.5), False


_LONG = "%Y-%m-%dT%H:%M:%S"
_SHORT = "%Y%m%d"


def read_date_string(s: str) -> int:
    for fmt in (_LONG, _SHORT):
        try:
            return int(
                datetime.strptime(s, fmt).replace(tzinfo=timezone.utc).timestamp()
            )
        except ValueError:
            continue
    raise ValueError(f"unparseable date: {s!r}")


def timestamp_string(ts: int) -> str:
    return datetime.fromtimestamp(int(ts), tz=timezone.utc).strftime(_LONG)


def date_string(ts: int) -> str:
    return datetime.fromtimestamp(int(ts), tz=timezone.utc).strftime(_SHORT)
