"""Chinese text normalization (clean-room).

Covers the practically important subset of the reference's normalizer
(``G2P/Chinese/Normalization/*``: dates, times, phone numbers, fractions,
percentages, ranges, decimals, cardinals) with an independent implementation.
"""
from __future__ import annotations

import re

DIGITS = "零一二三四五六七八九"
PHONE_DIGITS = "零幺二三四五六七八九"
UNITS = ["", "十", "百", "千"]
GROUP_UNITS = ["", "万", "亿", "万亿"]


def num_to_zh(num_str: str) -> str:
    """Cardinal integer → Chinese reading."""
    num_str = num_str.lstrip("0") or "0"
    if num_str == "0":
        return "零"
    groups = []
    s = num_str
    while s:
        groups.append(s[-4:])
        s = s[:-4]
    parts = []
    for gi in range(len(groups) - 1, -1, -1):
        g = groups[gi].rjust(4, "0")
        piece = ""
        zero_pending = False
        for i, ch in enumerate(g):
            d = int(ch)
            unit = UNITS[3 - i]
            if d == 0:
                if piece:
                    zero_pending = True
            else:
                if zero_pending:
                    piece += "零"
                    zero_pending = False
                piece += DIGITS[d] + unit
        if piece:
            # a leading zero inside this group needs 零 after the higher group
            if parts and g[0] == "0":
                piece = "零" + piece
            piece += GROUP_UNITS[gi]
            parts.append(piece)
        elif parts and gi > 0 and any(int(c) for grp in groups[:gi] for c in grp):
            # inner all-zero group introduces a 零 if more digits follow
            parts.append("零")
    out = "".join(parts)
    out = re.sub("零+", "零", out).rstrip("零") or "零"
    # 一十X → 十X at the very front (10-19)
    if out.startswith("一十"):
        out = out[2:] and "十" + out[2:] or "十"
    return out


def digits_to_zh(num_str: str, phone: bool = False) -> str:
    table = PHONE_DIGITS if phone else DIGITS
    return "".join(table[int(c)] for c in num_str if c.isdigit())


def decimal_to_zh(s: str) -> str:
    neg = s.startswith("-")
    s = s.lstrip("+-")
    if "." in s:
        a, b = s.split(".", 1)
        out = num_to_zh(a or "0") + "点" + digits_to_zh(b)
    else:
        out = num_to_zh(s)
    return ("负" if neg else "") + out


_RE_DATE = re.compile(r"(\d{4})[-/年](\d{1,2})[-/月](\d{1,2})[日号]?")
_RE_TIME = re.compile(r"(\d{1,2}):(\d{2})(?::(\d{2}))?")
_RE_PHONE = re.compile(r"(?<!\d)(1\d{10}|\d{3,4}-\d{7,8})(?!\d)")
_RE_FRACTION = re.compile(r"(-?)(\d+)/(\d+)")
_RE_PERCENT = re.compile(r"(-?)(\d+(?:\.\d+)?)%")
_RE_RANGE = re.compile(r"(\d+(?:\.\d+)?)[-~](\d+(?:\.\d+)?)(?=[^\d]|$)")
_RE_TEMP = re.compile(r"(-?)(\d+(?:\.\d+)?)(°C|℃)")
_RE_NUMBER = re.compile(r"-?\d+(?:\.\d+)?")
_RE_LONG_DIGITS = re.compile(r"(?<!\d)\d{12,}(?!\d)")


MEASURE_WORDS = "个只本条张件位名台辆颗粒棵架间家场次遍趟回双对份杯瓶碗盘箱包层楼岁人元块角毛斤两克米"


def normalize(text: str) -> str:
    # full-width digits → ascii
    text = text.translate(str.maketrans("０１２３４５６７８９", "0123456789"))
    # standalone 2 before a measure word reads 两 (reference quantifier.py)
    text = re.sub(f"(?<![0-9.])2(?=[{MEASURE_WORDS}])", "两", text)

    def rep_date(m):
        y, mo, d = m.groups()
        return f"{digits_to_zh(y)}年{num_to_zh(mo)}月{num_to_zh(d)}日"

    def rep_time(m):
        h, mi, sec = m.group(1), m.group(2), m.group(3)
        out = f"{num_to_zh(h)}点"
        if mi != "00":
            out += f"{num_to_zh(mi)}分"
        if sec and sec != "00":
            out += f"{num_to_zh(sec)}秒"
        return out

    def rep_phone(m):
        return digits_to_zh(m.group(0).replace("-", ""), phone=True)

    def rep_fraction(m):
        sign, a, b = m.groups()
        return ("负" if sign else "") + f"{num_to_zh(b)}分之{num_to_zh(a)}"

    def rep_percent(m):
        sign, v = m.groups()
        return ("负" if sign else "") + "百分之" + decimal_to_zh(v)

    def rep_range(m):
        return f"{decimal_to_zh(m.group(1))}到{decimal_to_zh(m.group(2))}"

    def rep_temp(m):
        sign, v, _ = m.groups()
        return ("零下" if sign else "") + decimal_to_zh(v) + "摄氏度"

    text = _RE_DATE.sub(rep_date, text)
    text = _RE_TIME.sub(rep_time, text)
    text = _RE_PHONE.sub(rep_phone, text)
    text = _RE_TEMP.sub(rep_temp, text)
    text = _RE_PERCENT.sub(rep_percent, text)
    text = _RE_FRACTION.sub(rep_fraction, text)
    text = _RE_RANGE.sub(rep_range, text)
    text = _RE_LONG_DIGITS.sub(lambda m: digits_to_zh(m.group(0)), text)
    text = _RE_NUMBER.sub(lambda m: decimal_to_zh(m.group(0)), text)
    return text
