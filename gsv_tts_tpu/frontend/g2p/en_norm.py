"""English text normalization (clean-room, no `inflect` dependency).

Covers the practically important subset of the reference's
``G2P/English/Normalization/expend.py``: cardinals, ordinals, decimals,
currency, percentages, years, times, and common abbreviations.
"""
from __future__ import annotations

import re

_ONES = ["zero", "one", "two", "three", "four", "five", "six", "seven",
         "eight", "nine", "ten", "eleven", "twelve", "thirteen", "fourteen",
         "fifteen", "sixteen", "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
         "eighty", "ninety"]
_SCALE = [(10 ** 12, "trillion"), (10 ** 9, "billion"), (10 ** 6, "million"),
          (10 ** 3, "thousand"), (100, "hundred")]
_ORD_SPECIAL = {"one": "first", "two": "second", "three": "third",
                "five": "fifth", "eight": "eighth", "nine": "ninth",
                "twelve": "twelfth"}


def int_to_words(n: int) -> str:
    if n < 0:
        return "minus " + int_to_words(-n)
    if n < 20:
        return _ONES[n]
    if n < 100:
        t, r = divmod(n, 10)
        return _TENS[t] + (" " + _ONES[r] if r else "")
    for val, name in _SCALE:
        if n >= val:
            q, r = divmod(n, val)
            out = int_to_words(q) + " " + name
            if r:
                out += " " + int_to_words(r)
            return out
    return _ONES[0]


def ordinal_words(n: int) -> str:
    words = int_to_words(n)
    parts = words.rsplit(" ", 1)
    last = parts[-1]
    if last in _ORD_SPECIAL:
        last = _ORD_SPECIAL[last]
    elif last.endswith("y"):
        last = last[:-1] + "ieth"
    elif last.endswith("t"):
        last = last + "h"
    else:
        last = last + "th"
    parts[-1] = last
    return " ".join(parts)


def year_words(y: int) -> str:
    if 1000 <= y <= 1999 or 2100 <= y <= 9999:
        hi, lo = divmod(y, 100)
        if lo == 0:
            return int_to_words(hi) + " hundred"
        if lo < 10:
            return int_to_words(hi) + " oh " + int_to_words(lo)
        return int_to_words(hi) + " " + int_to_words(lo)
    return int_to_words(y)


def digits_words(s: str) -> str:
    return " ".join(_ONES[int(c)] if c.isdigit() else c for c in s)


_ABBREV = {
    "mr": "mister", "mrs": "missis", "ms": "miss", "dr": "doctor",
    "st": "saint", "co": "company", "jr": "junior", "etc": "et cetera",
    "vs": "versus", "approx": "approximately",
}

_RE_MONEY = re.compile(r"([$£€])(\d+(?:\.\d+)?)( ?(?:million|billion|trillion))?")
_RE_ORDINAL = re.compile(r"\b(\d+)(st|nd|rd|th)\b")
_RE_TIME = re.compile(r"\b(\d{1,2}):(\d{2})(?::(\d{2}))?( ?[ap]\.?m\.?)?\b", re.I)
_RE_YEAR = re.compile(r"\b(1[5-9]\d\d|20\d\d)s?\b")
_RE_PERCENT = re.compile(r"(\d+(?:\.\d+)?)%")
_RE_DECIMAL = re.compile(r"\b(\d+)\.(\d+)\b")
_RE_PHONEISH = re.compile(r"\b\d{7,}\b")
_RE_NUMBER = re.compile(r"\b\d+\b")
_CURRENCY = {"$": ("dollar", "dollars"), "£": ("pound", "pounds"),
             "€": ("euro", "euros")}


def normalize(text: str) -> str:
    text = re.sub(r"\b([A-Za-z]+)\.(?=\s|$)",
                  lambda m: _ABBREV.get(m.group(1).lower(), m.group(1)) + "."
                  if m.group(1).lower() in _ABBREV else m.group(0), text)

    def rep_money(m):
        sym, amount, scale = m.group(1), m.group(2), m.group(3) or ""
        one, many = _CURRENCY[sym]
        if "." in amount:
            a, b = amount.split(".")
            cents = int(b.ljust(2, "0")[:2])
            out = int_to_words(int(a)) + " " + (one if a == "1" else many)
            if cents:
                out += " and " + int_to_words(cents) + (" cent" if cents == 1 else " cents")
        else:
            out = int_to_words(int(amount)) + scale + " " + (one if amount == "1" and not scale else many)
        return out

    def rep_time(m):
        h, mi, sec, ampm = m.groups()
        out = int_to_words(int(h))
        if mi != "00":
            if mi.startswith("0"):
                out += " oh " + int_to_words(int(mi))
            else:
                out += " " + int_to_words(int(mi))
        else:
            out += " o'clock" if not ampm else ""
        if ampm:
            out += " " + ("a m" if "a" in ampm.lower() else "p m")
        return out

    text = _RE_MONEY.sub(rep_money, text)
    text = _RE_TIME.sub(rep_time, text)
    text = _RE_ORDINAL.sub(lambda m: ordinal_words(int(m.group(1))), text)
    text = _RE_PERCENT.sub(lambda m: (int_to_words(int(float(m.group(1))))
                                      if float(m.group(1)).is_integer()
                                      else _decimal_words(m.group(1))) + " percent", text)
    text = _RE_YEAR.sub(lambda m: year_words(int(m.group(1))) +
                        ("s" if m.group(0).endswith("s") else ""), text)
    text = _RE_DECIMAL.sub(lambda m: _decimal_words(m.group(0)), text)
    text = _RE_PHONEISH.sub(lambda m: digits_words(m.group(0)), text)
    text = _RE_NUMBER.sub(lambda m: int_to_words(int(m.group(0))), text)
    return text


def _decimal_words(s: str) -> str:
    a, b = s.split(".")
    return int_to_words(int(a)) + " point " + digits_words(b)
