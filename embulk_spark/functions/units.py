"""Config unit parsing: byte sizes like ``32KB`` / ``1.5GB``.

Re-implements the reference's ByteSize grammar
(spi/unit/ByteSize.java:68-93,129-152): ``<number><optional space><unit>``
where the number is a non-negative decimal, the unit is one of
B / KB / MB / GB / TB / PB (case-insensitive, binary 1024 factors), an
empty unit means bytes, and anything over (2^63)-1 bytes is rejected.
"""

from __future__ import annotations

import re

_FACTORS = {
    "B": 1,
    "KB": 1 << 10,
    "MB": 1 << 20,
    "GB": 1 << 30,
    "TB": 1 << 40,
    "PB": 1 << 50,
}

_PATTERN = re.compile(r"\A(\d+(?:\.\d+)?)\s?([a-zA-Z]*)\Z")


def parse_byte_size(size: str | int) -> int:
    """``"32KB"`` → 32768. Integers pass through (already bytes)."""
    if isinstance(size, int):
        if size < 0:
            raise ValueError("size is negative")
        return size
    if size is None:
        raise ValueError("size is null")
    if size == "":
        raise ValueError("size is empty")
    m = _PATTERN.match(size)
    if not m:
        raise ValueError(f"Invalid byte size string {size!r}")
    from decimal import Decimal

    # exact decimal arithmetic: float would round 2^63 through the ceiling
    # check and lose precision above 2^53 bytes
    value = Decimal(m.group(1))
    unit = m.group(2).upper() or "B"
    if unit not in _FACTORS:
        raise ValueError(f"Unknown unit {m.group(2)!r}")
    nbytes = value * _FACTORS[unit]
    if nbytes > (1 << 63) - 1:
        raise ValueError("size is large than (2^63)-1 in bytes")
    return int(nbytes)


def format_byte_size(nbytes: int, unit: str = "B") -> str:
    """Render like ByteSize.toString(): integral values drop decimals,
    otherwise two decimal places (ByteSize.java:95-105)."""
    unit = unit.upper()
    value = nbytes / _FACTORS[unit]
    if f"{value:.2f}" == f"{int(value)}.00":
        return f"{int(value)}{unit}"
    return f"{value:.2f}{unit}"
